#!/usr/bin/env python
"""Index-selective walk repair: cost must track |affected walks|, not
|store| (VERDICT r1 #1). Times a FIXED small delta against growing
walk stores; with the round-2 selection (arrays_overlap scan +
pass-through) the wall time should stay near-flat while the store
grows 16x — the round-1 full-store mapInPandas rewrite scaled
linearly.

Usage: python benchmarks/repair_scale.py [--out PATH]
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

    from crawler_spark import datagen, walks_gen, walks_update
    from crawler_spark.session import get_spark

    spark = get_spark(
        "repair-scale", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # a 2000-node random graph; the delta touches ONE node
    f0 = datagen.random_graph(2000, 8, seed=17)
    node = 7
    removed = [f0[node][0]]
    added = [x for x in range(2000) if x not in f0[node] and x != node][:1]
    f1 = dict(f0)
    f1[node] = sorted((set(f0[node]) - set(removed)) | set(added))
    common = sorted(set(f0[node]) - set(removed))
    delta = (node, sorted(removed), common, sorted(added))
    edges1 = spark.createDataFrame(
        [(s, d) for s, ds in f1.items() for d in ds], "src long, dst long"
    ).localCheckpoint()
    starts = spark.createDataFrame([(i,) for i in sorted(f0)], "node_id long")
    edges0 = spark.createDataFrame(
        [(s, d) for s, ds in f0.items() for d in ds], "src long, dst long"
    )

    results = []
    for wpn in (25, 100, 400):
        walks = walks_gen.generate_walks(
            spark, edges0, starts, walks_per_node=wpn, seed=17,
            strategy="broadcast",
        ).localCheckpoint()
        n_store = walks.count()
        # warm-up absorbs codegen/broadcast latency
        walks_update.finish_update(
            walks_update.update_walks(
                spark, walks, edges1, [delta], seed=17, epoch=1
            )
        ).count()
        t0 = time.perf_counter()
        rep = walks_update.update_walks(
            spark, walks, edges1, [delta], seed=17, epoch=2
        )
        n_up = walks_update.updated_count(rep)
        dt = time.perf_counter() - t0
        results.append(
            {
                "store_walks": n_store,
                "updated_walks": n_up,
                "seconds": round(dt, 3),
            }
        )
        print(f"store={n_store}: updated={n_up} in {dt:.2f}s",
              file=sys.stderr)

    flat = results[-1]["seconds"] / max(results[0]["seconds"], 1e-9)
    out = {
        "delta": "1 node, 1 removed + 1 added edge",
        "runs": results,
        "store_growth": round(
            results[-1]["store_walks"] / results[0]["store_walks"], 1
        ),
        "time_growth": round(flat, 2),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
