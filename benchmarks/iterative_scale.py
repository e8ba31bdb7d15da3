#!/usr/bin/env python
"""Walk-generation strategies at BEYOND-BROADCAST scale (>30M edges).

SURVEY §8 / VERDICT r1 item 5: the 10^10-edge design point was never
exercised past 20k nodes. This harness builds a ~33M-edge web-shaped
graph (synth_edges: host-clustered ids, 80% intra-host links) and
runs one walk per node over it with each distributed strategy:

 - iterative : per super-step join of live heads vs adjacency
   (1 walk-step per shuffle of the live set),
 - bucketed  : host-locality cogroup — walks advance INSIDE their
   host bucket's adjacency shard until they follow an inter-host
   link (multiple walk-steps per shuffle),
 - broadcast : reference point only — at this size the CSR is
   ~0.5 GB; it still fits one local JVM but is the path the engine
   refuses above BROADCAST_EDGE_LIMIT on a real cluster.

Reported per strategy: wall seconds, walks/s, total shuffle
read+write bytes (Spark REST API deltas). A 5k-seed equality
spot-check asserts the sampled walks are bit-identical across all
strategies at this scale (counter-RNG keying).

Usage:
  python benchmarks/iterative_scale.py [--nodes N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES_PATH_TPL = "/tmp/spark_graft_iter_edges_{n}.parquet"


def shuffle_totals(spark) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all completed stages."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return 0, 0
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3_200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-broadcast", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark import walks_gen
    from crawler_spark.datagen import synth_edges
    from crawler_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    parts = args.cpus * 2
    spark = get_spark(
        "iter-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "64m",
            # the session default disables the UI; the REST API is the
            # shuffle-bytes source here
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges_path = EDGES_PATH_TPL.format(n=args.nodes)  # per-size cache
    if not os.path.exists(edges_path):
        synth_edges(
            spark, args.nodes, avg_degree=10, locality=0.8,
            host_block=256, seed=42, partitions=parts,
        ).write.mode("overwrite").parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()
    print(f"graph: {args.nodes} nodes, {n_edges} edges", file=sys.stderr)
    if args.nodes >= 3_000_000:
        assert (
            n_edges > walks_gen.BROADCAST_EDGE_LIMIT
        ), "not beyond-broadcast scale"

    starts = spark.range(0, args.nodes).select(F.col("id").alias("node_id"))
    results: dict[str, dict] = {}
    strategies = ["bucketed", "iterative"]
    if not args.skip_broadcast:
        strategies.append("broadcast")
    for strategy in strategies:
        r0, w0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        walks = walks_gen.generate_walks(
            spark, edges, starts, walks_per_node=1, seed=42,
            strategy=strategy, partitions=parts,
        )
        n_walks = walks.count()
        dt = time.perf_counter() - t0
        r1, w1 = shuffle_totals(spark)
        results[strategy] = {
            "seconds": round(dt, 1),
            "n_walks": n_walks,
            "walks_per_sec": round(n_walks / dt, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(f"{strategy}: {results[strategy]}", file=sys.stderr)

    # equality spot-check at this scale: 5k seeds, all strategies
    sub = spark.range(0, 5000).select((F.col("id") * 631).alias("node_id"))
    sets = []
    for strategy in strategies:
        w = walks_gen.generate_walks(
            spark, edges, sub, walks_per_node=1, seed=7,
            strategy=strategy, partitions=parts,
        )
        sets.append(sorted((r.walk_id, tuple(r.path)) for r in w.collect()))
    equal = all(s == sets[0] for s in sets[1:])
    print(f"equality spot-check (5k seeds, 3 strategies): {equal}",
          file=sys.stderr)

    out = {
        "n_nodes": args.nodes,
        "n_edges": n_edges,
        "cpus": args.cpus,
        "locality": 0.8,
        "strategies": results,
        "equality_spot_check": equal,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
