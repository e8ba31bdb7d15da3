#!/usr/bin/env python
"""spark-submit entrypoint: run any driver-contract query (or a crawl
epoch) on a cluster, with the library shipped via --py-files — the
deployment shape for a real multi-executor run (the same code tested
on local[N] here submits unchanged to YARN/K8s; only --master and the
table paths change):

    zip -r /tmp/crawler_spark.zip crawler_spark
    spark-submit --master local[8] \
        --py-files /tmp/crawler_spark.zip \
        scripts/submit_job.py --query a1_visit_counts \
        --sf-dir /root/testdata/sf0.01

With no --query, lists every contract entry.  --epoch runs one full
crawl epoch (bootstrap -> schedule -> fetch -> process -> commit)
against a store directory instead, exercising the engine path end to
end under spark-submit.

The session comes from SparkSession.builder.getOrCreate() so every
cluster setting (master, executor count/memory, shuffle partitions)
is owned by the spark-submit command line, as it must be on a real
cluster; crawler_spark.session's AQE/Arrow defaults are applied only
where not already set.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", default=None,
                    help="contract entry name (omit to list all)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="directory with the parquet tables")
    ap.add_argument("--show", type=int, default=5,
                    help="rows to print (0 = count only)")
    ap.add_argument("--epoch", default=None, metavar="STORE_DIR",
                    help="run one crawl epoch against this store dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from crawler_spark.session import apply_session_defaults

    builder = SparkSession.builder.appName(
        f"crawler_spark:{args.query or ('epoch' if args.epoch else 'list')}"
    )
    spark = apply_session_defaults(builder).getOrCreate()

    from crawler_spark import contract

    if args.epoch:
        from datetime import datetime, timezone

        from crawler_spark import datagen, engine

        now = datetime(1998, 6, 1, tzinfo=timezone.utc)
        web = datagen.pages_df(spark, {0: [1, 2], 1: [2], 2: [0]})
        eng = engine.CrawlEngine(spark, args.epoch, walks_per_node=50)
        eng.bootstrap([datagen.node_url(i) for i in (0, 1, 2)], now)
        t0 = time.perf_counter()
        eng.run_epoch(web, now)
        out = {"epoch_wall_s": round(time.perf_counter() - t0, 3),
               "ranked": eng.pagerank().count()}
        print(json.dumps(out))
        return 0

    if not args.query:
        for name in sorted(contract.QUERIES):
            kind = "sql-checked" if name in contract.ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    fn = contract.QUERIES.get(args.query)
    if fn is None:
        print(f"unknown query {args.query!r}; run without --query to list",
              file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    df = fn(spark, args.sf_dir)
    n = df.count()
    wall = round(time.perf_counter() - t0, 3)
    if args.show:
        df.show(args.show, truncate=80)
    print(json.dumps({"query": args.query, "rows": n, "wall_s": wall,
                      "sf_dir": args.sf_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
