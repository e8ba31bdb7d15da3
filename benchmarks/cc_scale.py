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
        t0 = time.time()
        cc = dedup.connected_components(pairs)
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
                "seconds": round(sec, 3),
            }
        )
        print(results[-1], file=sys.stderr)

    # adversarial: one path of 1M nodes (diameter 10^6)
    n = 1_000_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    ).localCheckpoint(eager=True)
    t0 = time.time()
    cc = dedup.connected_components(chain)
    one = cc.select("component_id").distinct().count()
    sec = time.time() - t0
    results.append(
        {
            "graph": "path_1M",
            "n_edges": n - 1,
            "n_components": one,
            "seconds": round(sec, 3),
        }
    )
    print(results[-1], file=sys.stderr)
    assert one == 1

    rand = [r for r in results if r["graph"] == "random"]
    out = {
        "runs": results,
        "edge_growth": round(rand[-1]["n_edges"] / rand[0]["n_edges"], 1),
        "time_growth": round(rand[-1]["seconds"] / rand[0]["seconds"], 2),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
