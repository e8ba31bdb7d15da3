#!/usr/bin/env python
"""Many-source PPR hot-source skew: stitch input must be bounded per
source (VERDICT r2 'What's wrong #1').

Builds a star-shaped graph (every spoke follows the hub) so the hub
is visited by ~every walk — the celebrity-node worst case — then
measures, for growing walk stores:

- the rows the stitch shuffle ships for the hub source
  (`ppr.per_source_walk_sample` output — capped at `limit` since
  round 3; pre-fix it was ~the whole store), and
- the wall time of `personalized_pagerank_many` over all sources.

Flat rows-per-source and ~flat wall time under store growth is the
pass condition; linear growth was the round-2 scale-killer.

Usage: python benchmarks/ppr_hot_source.py [--out PATH]
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
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark import ppr, rank, walks_gen
    from crawler_spark.session import get_spark

    spark = get_spark(
        "ppr-hot-source", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_spokes = 2000
    follows = {i: [0] for i in range(1, n_spokes + 1)}
    follows[0] = [1]
    edges = spark.createDataFrame(
        [(s, d) for s, ds in follows.items() for d in ds], "src long, dst long"
    ).localCheckpoint()
    # a 64-source query batch that INCLUDES the hub: every walk in the
    # store visits the hub, so the hub source is the worst-case
    # skew target; top_k=10 keeps the per-source cap (~8k walks)
    # BELOW every store size so the cap binds in every iteration
    all_nodes = spark.createDataFrame(
        [(i,) for i in sorted(follows)], "node_id long"
    )
    sources = spark.createDataFrame(
        [(i,) for i in range(64)], "node_id long"
    )
    top_k = 10
    limit = rank.walks_needed(ppr.required_length(top_k, 0.85), 0.85)

    results = []
    for wpn in (5, 20, 80):
        walks = walks_gen.generate_walks(
            spark, edges, all_nodes, walks_per_node=wpn, seed=11,
            strategy="broadcast",
        ).localCheckpoint()
        n_store = walks.count()
        visits = walks_gen.visits_of(walks).localCheckpoint()
        hub_rows = (
            ppr.per_source_walk_sample(
                edges, walks, sources, limit, seed=11, visits=visits
            )
            .groupBy("source_id")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        t0 = time.perf_counter()
        ppr.personalized_pagerank_many(
            spark, edges, walks, sources, top_k=top_k, seed=11,
            visits=visits,
        ).count()
        dt = time.perf_counter() - t0
        results.append(
            {
                "store_walks": n_store,
                "max_stitch_rows_per_source": int(hub_rows),
                "seconds": round(dt, 3),
            }
        )
        print(
            f"store={n_store}: max stitch rows/source={hub_rows} "
            f"(limit={limit}) many-PPR={dt:.2f}s",
            file=sys.stderr,
        )

    out = {
        "graph": f"star, {n_spokes} spokes -> hub (hub visited by ~all walks)",
        "per_source_limit": limit,
        "runs": results,
        "store_growth": round(
            results[-1]["store_walks"] / results[0]["store_walks"], 1
        ),
        "time_growth": round(
            results[-1]["seconds"] / max(results[0]["seconds"], 1e-9), 2
        ),
        "stitch_rows_flat": all(
            r["max_stitch_rows_per_source"] <= limit for r in results
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
