"""Incremental walk repair — M5-M8 (prune/graft), batched Spark-first.

Reference semantics (pkg/walks/update.go, per Bahmani-Chowdhury-Goel):
when a node's follow list changes by (removed, common, added):

 - updateRemovedNodes (update.go:67-120): every walk containing an
   invalid hop node->removed is pruned at the first such hop
   (containsInvalidStep, update.go:210-220: cut = i+1) and regrown:
   first step drawn uniformly from `common` (WalkStep,
   generate.go:187-204 — empty candidates or cycle vs the kept prefix
   => empty segment), then a normal alpha-walk continues from that
   node (generateWalk, generate.go:143-174 — cycle check against the
   SEGMENT only), and finally the segment is trimmed at its first
   element already present in the prefix (DeleteCyclesInPlace,
   sliceutils/slice.go:139-146).
 - updateAddedNodes (update.go:126-180): sample
   round(|added|/followsCount * visits(node)) walks visiting the node
   (estimateWalksToUpdate, update.go:224-243; even sampling via
   SRandMemberN); each is pruned AFTER the first occurrence of the
   node and, with probability alpha, regrown from the `added`
   candidates the same way (else just truncated).

Batched divergences (documented; the gates are the reference's own
distribution-level dynamic tests, tests/algos/pagerank_test.go:94-177):
 - The reference serializes per event; we repair each walk once per
   batch at the globally-first invalid step (smallest cut index, ties
   by node_id). Everything before that cut is valid, and regrown
   segments walk the post-delta graph, so one pass restores validity.
 - A walk sampled by several added-deltas grafts only the delta with
   the smallest node_id.
 - Visit counts for sampling are read from the pre-update store.

Physical plan: one aggregation to size/sample the graft set (shuffle
on node_id), one broadcast-joined column attach, then a single
mapInPandas pass over the walk store with the (small) delta dict and
the post-delta adjacency CSR broadcast — no per-walk round trips, no
driver loop. RNG is counter-based (rng.py) keyed by
(seed, epoch, walk_id), so repairs are partition- and retry-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from . import rng
from .schemas import DEFAULT_ALPHA
from .walks_gen import CSR, _Paths, advance_walks, collect_csr

_OUT_SCHEMA = StructType(
    [
        StructField("walk_id", LongType()),
        StructField("start_id", LongType()),
        StructField("path", ArrayType(LongType())),
        StructField("updated", BooleanType()),
    ]
)

# rng stream salts (distinct from walk-generation streams 0/1)
_SALT_SEGMENT = 101  # derived seed for regrown segments
_SALT_FIRST_REMOVED = 3  # candidate choice, removed-phase (stream 3)
_SALT_GRAFT_COIN = 2  # graft coin, added-phase (stream 2)
_SALT_FIRST_ADDED = 4  # candidate choice, added-phase


def _normalize_deltas(deltas) -> list[tuple[int, list[int], list[int], list[int]]]:
    """Accept a DELTAS DataFrame or a list of
    (node_id, removed, common, added) tuples; return sorted tuples."""
    if isinstance(deltas, DataFrame):
        rows = deltas.select("node_id", "removed", "common", "added").collect()
        out = [
            (
                int(r["node_id"]),
                sorted(int(x) for x in (r["removed"] or [])),
                sorted(int(x) for x in (r["common"] or [])),
                sorted(int(x) for x in (r["added"] or [])),
            )
            for r in rows
        ]
    else:
        out = [
            (int(n), sorted(map(int, rm)), sorted(map(int, co)), sorted(map(int, ad)))
            for n, rm, co, ad in deltas
        ]
    return sorted(out)


def _graft_assignments(
    walks: DataFrame,
    added_nodes: dict[int, tuple[list[int], int]],
    seed: int,
    epoch: int,
) -> DataFrame:
    """(walk_id, graft_node) — the added-phase sample.

    For each delta node A: limit = round(|added|/followsCount *
    visits(A)) (estimateWalksToUpdate, update.go:224-243); take the
    `limit` walks visiting A that rank first by a counter hash of
    (seed, epoch, walk_id) — a deterministic stand-in for
    SRandMemberN. Conflicts resolve to the smallest node_id."""
    nodes = sorted(added_nodes)
    v = (
        walks.select("walk_id", F.explode("path").alias("node_id"))
        .filter(F.col("node_id").isin(nodes))
    )
    counts = {int(r["node_id"]): int(r["n"]) for r in
              v.groupBy("node_id").agg(F.count("*").alias("n")).collect()}
    limits = []
    for a in nodes:
        added, follows_count = added_nodes[a]
        visits = counts.get(a, 0)
        p = len(added) / max(follows_count, 1)
        limits.append((a, int(p * visits + 0.5)))
    spark = walks.sparkSession
    limits_df = spark.createDataFrame(limits, "node_id long, lim long")
    w = Window.partitionBy("node_id").orderBy(
        F.xxhash64(F.lit(seed), F.lit(epoch), F.col("walk_id"))
    )
    sampled = (
        v.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(limits_df), "node_id")
        .filter(F.col("_rn") <= F.col("lim"))
    )
    return sampled.groupBy("walk_id").agg(F.min("node_id").alias("graft_node"))


def update_walks(
    spark: SparkSession,
    walks: DataFrame,
    edges_after: DataFrame,
    deltas,
    alpha: float = DEFAULT_ALPHA,
    seed: int = 42,
    epoch: int = 0,
    csr: CSR | None = None,
) -> DataFrame:
    """M8 walks.Update, batched over the whole store in one plan.

    `edges_after` is the graph AFTER the deltas were applied (the
    reference updates the DB before repairing walks,
    pkg/crawler/process.go:161-166). Returns the walks DataFrame with
    an extra boolean `updated` column; `finish_update` strips it and
    `updated_count` aggregates it (the arbiter's change signal, A8).
    """
    dl = _normalize_deltas(deltas)
    removed_map = {n: rm for n, rm, _, _ in dl if rm}
    common_map = {n: co for n, rm, co, _ in dl if rm}
    added_map = {
        n: (ad, len(co) + len(ad)) for n, _, co, ad in dl if ad
    }
    if not removed_map and not added_map:
        return walks.select("walk_id", "start_id", "path").withColumn(
            "updated", F.lit(False)
        )

    if added_map:
        grafts = _graft_assignments(walks, added_map, seed, epoch)
        state = walks.join(F.broadcast(grafts), "walk_id", "left")
    else:
        state = walks.withColumn("graft_node", F.lit(None).cast("long"))

    local_csr = csr if csr is not None else collect_csr(edges_after)
    bc = spark.sparkContext.broadcast(
        (local_csr, removed_map, common_map, added_map)
    )

    def repair(batches):
        csr_, rm_map, co_map, ad_map = bc.value
        rm_sets = {n: set(v) for n, v in rm_map.items()}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            wids = pdf["walk_id"].to_numpy(np.int64)
            out_paths: list[list[int] | None] = [None] * len(pdf)
            updated = np.zeros(len(pdf), dtype=bool)
            # (row, prefix, candidates, salt_first) needing a segment
            seg_req: list[tuple[int, list[int], list[int], int]] = []

            for i, (p, graft) in enumerate(zip(pdf["path"], pdf["graft_node"])):
                p = [int(x) for x in p]
                # --- phase 1: removed-edge repair at the first
                # invalid step across all deltas (update.go:210-220)
                cut = -1
                cands: list[int] = []
                for j in range(len(p) - 1):
                    s = rm_sets.get(p[j])
                    if s is not None and p[j + 1] in s:
                        cut = j + 1
                        cands = co_map[p[j]]
                        break
                if cut >= 0:
                    prefix = p[:cut]
                    seg_req.append((i, prefix, cands, _SALT_FIRST_REMOVED))
                    updated[i] = True
                    p = prefix  # phase 2 sees the pruned prefix
                out_paths[i] = p
                # --- phase 2: added-edge graft (update.go:126-180);
                # cuts AFTER the first occurrence of the delta node,
                # which is within the phase-1 prefix, so a firing
                # graft supersedes any pending phase-1 regrowth
                if graft is not None and not pd.isna(graft):
                    a = int(graft)
                    if a in p:
                        cut2 = p.index(a) + 1
                        prefix2 = p[:cut2]
                        out_paths[i] = prefix2
                        updated[i] = True
                        if seg_req and seg_req[-1][0] == i:
                            seg_req.pop()
                        s2 = rng.hash64(seed, epoch, wids[i], _SALT_SEGMENT)
                        coin = float(rng.u01(s2, 0, _SALT_GRAFT_COIN))
                        # graft coin (update.go:160-170): with prob
                        # alpha regrow from `added`, else truncate only
                        if coin < alpha:
                            seg_req.append(
                                (i, prefix2, ad_map[a][0], _SALT_FIRST_ADDED)
                            )

            # --- batched segment regrowth: first step from the
            # candidate set (WalkStep), then a normal alpha-walk
            # (generateWalk) via advance_walks, then trim at the first
            # prefix collision (DeleteCyclesInPlace)
            grow_rows, grow_starts, grow_keys = [], [], []
            for i, prefix, cands, salt in seg_req:
                if not cands:
                    continue
                s2 = rng.hash64(seed, epoch, wids[i], _SALT_SEGMENT)
                idx = int(rng.randint(len(cands), s2, 0, salt))
                nxt = cands[idx]
                if nxt in prefix:
                    continue  # cycle at step 0 => empty segment
                grow_rows.append(i)
                grow_starts.append(nxt)
                grow_keys.append(np.int64(np.uint64(s2).astype(np.int64)))
            if grow_rows:
                keys = np.asarray(grow_keys, dtype=np.int64)
                paths = _Paths(np.asarray(grow_starts, dtype=np.int64))
                advance_walks(keys, paths, csr_, alpha, 0)
                for k, i in enumerate(grow_rows):
                    seg = paths.mat[k, : paths.lens[k]].tolist()
                    prefix = out_paths[i]
                    pset = set(prefix)
                    trimmed = []
                    for x in seg:
                        if x in pset:
                            break
                        trimmed.append(int(x))
                    out_paths[i] = prefix + trimmed

            yield pd.DataFrame(
                {
                    "walk_id": wids,
                    "start_id": pdf["start_id"].to_numpy(np.int64),
                    "path": out_paths,
                    "updated": updated,
                }
            )

    return state.select(
        "walk_id", "start_id", "path", "graft_node"
    ).mapInPandas(repair, schema=_OUT_SCHEMA)


def updated_count(repaired: DataFrame) -> int:
    """#walks touched — feeds the arbiter change-ratio (A8,
    pkg/crawler/process.go:118-123)."""
    row = repaired.agg(F.sum(F.col("updated").cast("long"))).first()
    return int(row[0] or 0)


def finish_update(repaired: DataFrame) -> DataFrame:
    """Strip the bookkeeping column -> WALKS-shaped store."""
    return repaired.select("walk_id", "start_id", "path")
