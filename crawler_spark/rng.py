"""Counter-based deterministic RNG (splitmix64-style).

The reference seeds Go's sequential math/rand per call site
(reference: pkg/walks/generate.go:32,73; pkg/pagerank/pagerank.go:118),
which makes results depend on evaluation order — unusable in a
distributed engine. Here every random draw is a pure function of
(seed, walk_id, step, stream), so walks are reproducible regardless of
partitioning, task order, or retries (Spark's rand() is NOT
partition-invariant; this is, by construction).

Streams:
  0 — continue/stop coin (rng.Float32() > alpha in the reference)
  1 — uniform follow choice (rng.Intn(len) in the reference)
  2 — graft coin for updateAddedNodes (pkg/walks/update.go:163)
  3 — candidate choice in generateWalkSegment (pkg/walks/update.go:195)

Everything is vectorized numpy over uint64 with wrap-around semantics.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_K = np.uint64(0xD6E8FEB86659FD93)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_INV53 = 1.0 / float(1 << 53)


def _mix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (uint64 wrap-around is intended)."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def _as_u64(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype != np.uint64:
        a = a.astype(np.int64, copy=False).astype(np.uint64)
    return a


def hash64(*parts) -> np.ndarray:
    """Vectorized keyed hash: fold each part through splitmix64.

    Parts broadcast together (scalars or equal-length arrays).
    """
    h = _GOLDEN
    with np.errstate(over="ignore"):
        for p in parts:
            h = _mix(h ^ (_as_u64(p) * _K))
    return h


def u01(*parts) -> np.ndarray:
    """Uniform float64 in [0, 1), keyed by parts."""
    return (hash64(*parts) >> np.uint64(11)).astype(np.float64) * _INV53


def randint(n, *parts) -> np.ndarray:
    """Uniform integer in [0, n) keyed by parts (n scalar or array >0).

    Modulo bias is < n / 2**64 — negligible for adjacency fan-outs.
    """
    return (hash64(*parts) % _as_u64(n)).astype(np.int64)
