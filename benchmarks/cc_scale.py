#!/usr/bin/env python
"""Connected-components cost vs pair-set size: random sparse graphs
(the near-dup-pair shape) at growing edge counts, plus one
adversarial giant-path graph (worst case for round count — a chain's
diameter is |V|, while large-star/small-star closes it in O(log n)
alternations).

Reports wall time, rounds to convergence, and components found; the
claim under test is that time grows ~linearly with |pairs| (shuffle
volume), NOT with component diameter or count.

Usage: python benchmarks/cc_scale.py [--out PATH] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sizes", default="250000,1000000,4000000")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from crawler_spark.ops import dedup
    from crawler_spark.session import get_spark

    spark = get_spark(
        "cc-scale", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n_edges in [int(s) for s in args.sizes.split(",")]:
        n_nodes = n_edges // 2  # avg degree 4 -> few giant + many small comps
        pairs = (
            spark.range(n_edges)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("doc_a"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias(
                    "doc_b"
                ),
            )
            .filter(F.col("doc_a") != F.col("doc_b"))
            .localCheckpoint(eager=True)
        )
        stats: dict = {}
        t0 = time.time()
        cc = dedup.connected_components(pairs, stats=stats)
        n_comp = cc.select("component_id").distinct().count()
        sec = time.time() - t0
        results.append(
            {
                "graph": "random",
                "n_edges": n_edges,
                "n_nodes_touched": pairs.select(
                    F.explode(F.array("doc_a", "doc_b"))
                )
                .distinct()
                .count(),
                "n_components": n_comp,
                "rounds": stats["rounds"],
                "seconds": round(sec, 3),
            }
        )
        print(results[-1], file=sys.stderr)

    # adversarial 1: one path of 1M nodes (diameter 10^6)
    n = 1_000_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    ).localCheckpoint(eager=True)
    stats = {}
    t0 = time.time()
    cc = dedup.connected_components(chain, stats=stats)
    one = cc.select("component_id").distinct().count()
    sec = time.time() - t0
    results.append(
        {
            "graph": "path_1M",
            "n_edges": n - 1,
            "n_components": one,
            "rounds": stats["rounds"],
            "seconds": round(sec, 3),
        }
    )
    print(results[-1], file=sys.stderr)
    assert one == 1

    # adversarial 2: power-law hub at the largest random size — one
    # giant component where HALF the edges hit a single celebrity node
    # (degree ~n/2, the boilerplate-dup shape) and the hub id is the
    # LARGEST node id, so every round must re-point its whole
    # neighborhood (this is where the stars' degree re-balancing
    # actually bites; a label-propagation CC funnels the hub's edge
    # list through one task every round)
    n_edges = max(int(s) for s in args.sizes.split(","))
    n_nodes = n_edges // 2
    hub = n_nodes - 1
    hub_pairs = (
        spark.range(n_edges)
        .select(
            F.when(
                F.col("id") % 2 == 0,
                F.pmod(F.xxhash64("id"), F.lit(n_nodes - 1)),
            )
            .otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_nodes - 1)))
            .alias("doc_a"),
            F.when(F.col("id") % 2 == 0, F.lit(hub))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(4)), F.lit(n_nodes - 1)))
            .alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .localCheckpoint(eager=True)
    )
    stats = {}
    t0 = time.time()
    cc = dedup.connected_components(hub_pairs, stats=stats)
    n_comp = cc.select("component_id").distinct().count()
    sec = time.time() - t0
    results.append(
        {
            "graph": f"hub_half_degree_{n_edges}",
            "n_edges": n_edges,
            "n_components": n_comp,
            "rounds": stats["rounds"],
            "seconds": round(sec, 3),
        }
    )
    print(results[-1], file=sys.stderr)
    import math

    assert stats["rounds"] <= 3 * math.ceil(math.log2(n_nodes)), stats

    rand = [r for r in results if r["graph"] == "random"]
    hub_row = results[-1]
    same_size_random = [
        r for r in rand if r["n_edges"] == hub_row["n_edges"]
    ][0]
    out = {
        "runs": results,
        "edge_growth": round(rand[-1]["n_edges"] / rand[0]["n_edges"], 1),
        "time_growth": round(rand[-1]["seconds"] / rand[0]["seconds"], 2),
        "hub_vs_random_time": round(
            hub_row["seconds"] / same_size_random["seconds"], 2
        ),
        "hub_rounds": hub_row["rounds"],
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
