"""Personalized PageRank — M14, the walk-cache stitcher.

Reference algorithm (pkg/pagerank/pagerank.go:107-213): simulate ONE
long random walk from the source with reset probability 1-alpha,
reusing stored walks whenever the cache has an unused walk visiting
the current node (WalkCache.Next, pkg/pagerank/cache.go:80-105 — each
cached walk is consumed at most once); the cached walk is cropped
strictly after the current node (CropWalk, pagerank.go:233-240),
cycle-trimmed against the in-flight segment (TrimCycles,
sliceutils/slice.go:125-132), appended, and the walk resets. When no
cached walk is available, fall back to live WalkStep over the
adjacency. Finally the visit frequencies of the long walk are the
scores (countAndNormalize, pagerank.go:217-230).

A personalized query is single-source and bounded: the walk budget is
walksNeeded(requiredLenght(topK, alpha), alpha) (pagerank.go:244-257),
~100k short walks at topK=200 — megabytes, not a cluster problem. So
the Spark shape is: one sampling job selects the bounded walk set
(even per-node split, W5) and the follow lists of the source
neighborhood, and the stitch runs vectorized in a single task (or on
the driver). Many sources fan out with cogrouped applyInPandas, one
group per source — embarrassingly parallel.

The adjacency the stitcher sees is a BOUNDED-NEIGHBORHOOD CSR, never
the full edge table: the reference's FollowCache loads only follows
of nodes the walk actually visits (pkg/pagerank/cache.go:11-62 — DB
fetch on miss); here the live-step fallback cannot fetch mid-task, so
we pre-close the neighborhood: BFS over `edges` from
{source} ∪ {sampled-walk nodes} until exhaustion or a node budget
(PPR_NODE_BUDGET). Within the closure the walk behaves exactly as
with the full graph (every node it can stand on has its full follow
list); a walk crossing the budget boundary sees a dangling node and
resets to the source — a documented divergence that only fires past
the budget, vs. the old full-graph collect that OOMs the driver at
10^10 edges.

The RNG is counter-based: draw t of source s is u01(seed, s, t) —
run-to-run and partitioning deterministic (the reference seeds
math/rand with wall-clock time, pagerank.go:118, and gates only on
distribution-level distance; we gate the same way plus exact
reproducibility).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import rng
from .rank import required_length, sample_walks_visiting, walks_needed
from .schemas import DEFAULT_ALPHA
from .walks_gen import CSR, collect_csr

# BFS-closure cap for the stitcher's adjacency: ~2M nodes * avg degree
# * 12B/edge stays comfortably inside one executor/driver. Beyond the
# boundary a live walk dangles and resets (see module docstring).
PPR_NODE_BUDGET = 2_000_000


def _neighborhood_csr(
    edges: DataFrame, roots: DataFrame, max_nodes: int = PPR_NODE_BUDGET
) -> CSR:
    """CSR of `edges` restricted to the BFS closure of `roots`
    (node_id column) — the bounded-neighborhood contract of the
    reference's FollowCache (pkg/pagerank/cache.go:11-62). Each hop is
    one semi-join of the edge table against the (small, broadcast)
    frontier; the edge table itself is never collected in full unless
    the closure IS the graph."""
    from .session import free_local_checkpoint

    known = roots.select("node_id").distinct().localCheckpoint(eager=True)
    frontier = known
    prev_frontier = None  # last round's frontier ckpt, freed one round late
    n_known = known.count()
    while n_known < max_nodes:
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node_id", "src").hint("broadcast"),
                "src",
                "left_semi",
            )
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(known, "node_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_new = nxt.count()
        if n_new == 0:
            free_local_checkpoint(nxt)
            break
        new_known = known.unionByName(nxt).localCheckpoint(eager=True)
        # every consumer of the superseded checkpoints is materialized
        # (nxt and new_known are eager) — free them now; each BFS hop
        # otherwise leaves a closure-sized block behind until GC
        free_local_checkpoint(known)
        if prev_frontier is not None:
            free_local_checkpoint(prev_frontier)
        known = new_known
        n_known += n_new
        prev_frontier = frontier = nxt
    sub = edges.join(
        known.withColumnRenamed("node_id", "src").hint("broadcast"),
        "src",
        "left_semi",
    )
    csr = collect_csr(sub)  # eager: collects to numpy
    free_local_checkpoint(known)
    if prev_frontier is not None:
        free_local_checkpoint(prev_frontier)
    return csr


class _DrawBuf:
    """Block-buffered counter-RNG: draw t is hash64(seed, source, t),
    computed 2^16 draws at a time (the scalar-call path was the
    stitcher's profile hotspot at ~55 us/draw)."""

    BLOCK = 1 << 16

    def __init__(self, seed: int, source: int):
        self.seed = seed
        self.source = source
        self.blk = -1
        self.buf: np.ndarray | None = None

    def hash(self, t: int) -> int:
        blk = t // self.BLOCK
        if blk != self.blk:
            lo = blk * self.BLOCK
            self.buf = rng.hash64(
                self.seed, self.source, np.arange(lo, lo + self.BLOCK)
            )
            self.blk = blk
        return int(self.buf[t - blk * self.BLOCK])

    def u01(self, t: int) -> float:
        return (self.hash(t) >> 11) * (1.0 / float(1 << 53))

    def randint(self, n: int, t: int) -> int:
        return self.hash(t) % n


def _stitch(
    source: int,
    target_length: int,
    alpha: float,
    seed: int,
    cached_walks: list[list[int]],
    csr: CSR,
) -> np.ndarray:
    """The personalizedWalk loop (pagerank.go:166-213), driver/task
    local. Returns the concatenated long walk as an int64 array."""
    # positions index: node -> list of walk indices visiting it,
    # excluding each walk's last node (cache.go:125-139)
    positions: dict[int, list[int]] = {}
    for i, w in enumerate(cached_walks):
        for node in w[:-1]:
            positions.setdefault(node, []).append(i)
    pos_cursor: dict[int, int] = {}
    used = np.zeros(len(cached_walks), dtype=bool)

    def next_cached(node: int) -> list[int] | None:
        plist = positions.get(node)
        if not plist:
            return None
        c = pos_cursor.get(node, 0)
        while c < len(plist):
            i = plist[c]
            c += 1
            if not used[i]:
                used[i] = True
                pos_cursor[node] = c
                return cached_walks[i]
        pos_cursor[node] = c
        return None

    out = np.empty(target_length + 64, dtype=np.int64)
    n_out = 0
    current: list[int] = [source]
    current_set = {source}
    cur = source
    t = 0  # rng draw counter
    draws = _DrawBuf(seed, source)

    def reset():
        nonlocal n_out, current, current_set, cur
        k = len(current)
        if n_out + k > len(out):
            out.resize(max(len(out) * 2, n_out + k), refcheck=False)
        out[n_out : n_out + k] = current
        n_out += k
        current = [source]
        current_set = {source}
        cur = source

    while n_out < target_length:
        coin = draws.u01(t); t += 1
        if coin > alpha:
            reset()
            continue
        w = next_cached(cur)
        if w is None:
            # live WalkStep (generate.go:187-204)
            deg, start = csr.lookup(np.asarray([cur], dtype=np.int64))
            d = int(deg[0])
            if d == 0:
                reset()
                continue
            idx = draws.randint(d, t); t += 1
            nxt = int(csr.targets[int(start[0]) + idx])
            if nxt in current_set:
                reset()
                continue
            current.append(nxt)
            current_set.add(nxt)
            cur = nxt
            continue
        # crop strictly after the current node (pagerank.go:233-240)
        cropped = w[w.index(cur) + 1 :]
        # TrimCycles vs the in-flight segment (slice.go:125-132)
        for j, x in enumerate(cropped):
            if x in current_set:
                cropped = cropped[:j]
                break
        current.extend(cropped)
        reset()
    return out[:n_out]


def _count_normalize(all_walk: np.ndarray) -> pd.DataFrame:
    nodes, counts = np.unique(all_walk, return_counts=True)
    return pd.DataFrame(
        {"node_id": nodes, "rank": counts / float(len(all_walk))}
    )


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    walks: DataFrame,
    node_id: int,
    top_k: int = 200,
    alpha: float = DEFAULT_ALPHA,
    seed: int = 42,
    csr: CSR | None = None,
    max_nodes: int = PPR_NODE_BUDGET,
) -> DataFrame:
    """Single-source personalized pagerank (pagerank.go:107-161).

    Returns (node_id, rank). A dangling source returns {source: 1.0}
    (pagerank.go:138-141). The adjacency is the bounded-neighborhood
    closure, not the full graph (a prebuilt `csr` skips that)."""
    if csr is not None:
        # prebuilt CSR: O(log n) in-memory lookup, no Spark job (the
        # shared-CSR looping-caller pattern)
        follows = sorted(int(x) for x in csr.follows(int(node_id)))
    else:
        follows = sorted(
            int(r["dst"])
            for r in edges.filter(F.col("src") == int(node_id))
            .select("dst")
            .collect()
        )
    if not follows:
        return spark.createDataFrame(
            [(int(node_id), 1.0)], "node_id long, rank double"
        )
    target = required_length(top_k, alpha)
    limit = walks_needed(target, alpha)
    sampled = sample_walks_visiting(
        walks, follows + [int(node_id)], limit, seed=seed
    )
    rows = (
        sampled.select("walk_id", "path").distinct().collect()
    )
    # deterministic cache order regardless of partitioning
    rows.sort(key=lambda r: r["walk_id"])
    cached = [[int(x) for x in r["path"]] for r in rows]
    if csr is None:
        # roots known driver-side already (cached walks + source +
        # follows) — no extra job to assemble them
        root_set = {int(node_id), *follows}
        for w in cached:
            root_set.update(w)
        roots = spark.createDataFrame(
            [(n,) for n in sorted(root_set)], "node_id long"
        )
        csr = _neighborhood_csr(edges, roots, max_nodes)
    all_walk = _stitch(int(node_id), target, alpha, seed, cached, csr)
    return spark.createDataFrame(
        _count_normalize(all_walk), "node_id long, rank double"
    )


def per_source_walk_sample(
    edges: DataFrame,
    walks: DataFrame,
    sources: DataFrame,
    limit: int,
    seed: int = 42,
    visits: DataFrame | None = None,
) -> DataFrame:
    """Bounded per-source walk sample (source_id, walk_id, path) for
    the many-source stitch — W5's even sampling applied BEFORE the
    stitch shuffle (reference store.go:243-288): each source keeps at
    most `limit` walks, chosen by the same deterministic xxhash64
    order the single-source sampler uses. The cap runs on the NARROW
    (source_id, walk_id) pairs and the heavy path arrays are only
    joined in for survivors — a hot source (celebrity node visited by
    ~every walk) ships ≤ limit paths to its stitch task instead of
    ~the whole store."""
    # INNER join: the rows a left-outer would preserve (edge-less
    # sources, member NULL) are dropped by the isNotNull below anyway
    # — and a left join pins the big edge table as the only
    # broadcastable side, forcing a full edge-table shuffle just to
    # extract <= |sources| follow lists; inner lets AQE broadcast the
    # tiny source set and stream the edges
    src_follow = (
        sources.select(F.col("node_id").alias("source_id"))
        .join(edges, F.col("source_id") == F.col("src"))
        .select("source_id", F.col("dst").alias("member"))
    )
    # neighborhood membership: follows + the source itself
    members = src_follow.unionByName(
        sources.select(
            F.col("node_id").alias("source_id"),
            F.col("node_id").alias("member"),
        )
    ).where(F.col("member").isNotNull()).distinct()

    hkey = F.xxhash64(F.lit(seed), "walk_id")
    if visits is not None:
        vis = visits.select(F.col("node_id").alias("member"), "walk_id")
    else:
        vis = walks.select(F.explode("path").alias("member"), "walk_id")
    # Per-MEMBER cap BEFORE the source fan-out. Exactness: if walk w
    # is among the `limit` smallest (hash, walk_id) over a source's
    # member-list union, then within EVERY member list containing w
    # fewer than `limit` elements hash smaller (a subset has no more
    # small elements than the union) — so w survives that member's
    # top-`limit` and the union of per-member caps is a SUPERSET of
    # every source's final selection. Without this, a member shared
    # by many queried sources (the celebrity hub is in ~every
    # neighborhood) fans its store-sized visit list out once PER
    # SOURCE before any cap — the measured residual store term in
    # BENCH/ppr_hot_source_r3. With it, the fan-out input is
    # <= limit rows per member.
    vis_m = vis.join(
        F.broadcast(members.select("member").distinct()), "member", "left_semi"
    )
    wm = Window.partitionBy("member").orderBy(hkey, "walk_id")
    vis_capped = (
        vis_m.withColumn("_rm", F.row_number().over(wm))
        .filter(F.col("_rm") <= limit)
        .drop("_rm")
    )
    hits = (
        members.join(vis_capped, "member")
        .select("source_id", "walk_id")
        .distinct()
    )
    # Native two-level top-k: `row_number() <= limit` plans as
    # WindowGroupLimit with a PARTIAL pass BELOW the exchange
    # (plan-gated in test_ppr) — every map task keeps only its own
    # `limit` smallest (hash, walk_id) rows per source, so a hot
    # source (celebrity node visited by ~every walk in a 10^12-walk
    # store) ships <= tasks * limit rows to its reduce task instead
    # of its entire hit set, and no task ever sorts more than its own
    # input slice. This replaces round 3's count-then-hash-threshold
    # pre-filter, which paid a SECOND members-join/distinct pass just
    # to size the threshold (the measured residual store-proportional
    # term, BENCH/ppr_hot_source_r3): the hits pass now runs exactly
    # once and the output is the same deterministic `limit` smallest
    # hashes per source.
    w = Window.partitionBy("source_id").orderBy(hkey, "walk_id")
    capped = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .drop("_rn")
    )
    return capped.join(walks.select("walk_id", "path"), "walk_id")


def personalized_pagerank_many(
    spark: SparkSession,
    edges: DataFrame,
    walks: DataFrame,
    sources: DataFrame,
    top_k: int = 200,
    alpha: float = DEFAULT_ALPHA,
    seed: int = 42,
    max_nodes: int = PPR_NODE_BUDGET,
    visits: DataFrame | None = None,
) -> DataFrame:
    """Many-source fan-out: one stitch task per source via grouped
    applyInPandas (SURVEY §2.8 M14 'many-source' path). Returns
    (source_id, node_id, rank).

    Each source's bounded walk sample is attached by a join from the
    visits index — a maintained (node_id, walk_id) index when the
    caller has one (the reference's walksVisiting sets, W5), else
    derived by exploding the store; the shared bounded-neighborhood
    CSR (closure of all sources' sampled walks) is broadcast once.
    Sources are independent — this scales linearly with executors."""
    target = required_length(top_k, alpha)
    limit = walks_needed(target, alpha)
    per_source_walks = per_source_walk_sample(
        edges, walks, sources, limit, seed=seed, visits=visits
    ).unionByName(
        # sentinel row per source: a source no stored walk visits
        # would otherwise form NO group and silently vanish from the
        # output — the single-source path live-stitches that case
        # instead. The sentinel guarantees the group; the stitch
        # filters it out and runs fully live over the shared CSR
        # (empty cache), matching personalized_pagerank's semantics.
        sources.select(
            F.col("node_id").alias("source_id"),
            F.lit(-1).cast("bigint").alias("walk_id"),
            F.array().cast("array<bigint>").alias("path"),
        )
    ).localCheckpoint(eager=True)  # read twice: roots + stitch
    roots = (
        per_source_walks.select(F.explode("path").alias("node_id"))
        .unionByName(sources.select("node_id"))
        .distinct()
    )
    csr = _neighborhood_csr(edges, roots, max_nodes)
    bc = spark.sparkContext.broadcast(csr)

    out_schema = "source_id long, node_id long, rank double"

    def stitch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        src = int(pdf["source_id"].iloc[0])
        local = bc.value
        follows = [int(x) for x in local.follows(src)]
        if not follows:
            return pd.DataFrame(
                {"source_id": [src], "node_id": [src], "rank": [1.0]}
            )
        # input is pre-capped at `limit` rows per source (the window
        # above) — deterministic cache order regardless of partitioning
        pdf = pdf[pdf["walk_id"] >= 0].sort_values("walk_id")
        cached = [[int(x) for x in p] for p in pdf["path"]]
        all_walk = _stitch(src, target, alpha, seed, cached, local)
        res = _count_normalize(all_walk)
        res.insert(0, "source_id", src)
        return res

    return per_source_walks.groupBy("source_id").applyInPandas(
        stitch_group, schema=out_schema
    )
