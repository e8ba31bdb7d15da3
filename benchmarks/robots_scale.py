#!/usr/bin/env python
"""robots_verdicts cost at frontier scale: N urls against a rules
dimension of H hosts x ~3 rules. The match runs `path rlike rx` with
a per-row (non-foldable) pattern — Java compiles the tiny pattern per
(url, matching-host-rule) row — so the claim under test is that the
per-row cost is micro-seconds and the evaluation stays embarrassingly
parallel: time should track |urls x rules-per-host|, and the absolute
throughput should make a full-frontier pass cheap next to fetching.

Usage: python benchmarks/robots_scale.py [--out PATH] [--cpus N]
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
    ap.add_argument("--sizes", default="500000,2000000")
    ap.add_argument("--hosts", type=int, default=10000)
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from crawler_spark import frontier
    from crawler_spark.session import get_spark

    spark = get_spark(
        "robots-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    H = args.hosts
    rules = (
        spark.range(H)
        .select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias(
                "host"
            ),
            F.explode(
                F.array(
                    F.struct(F.lit(False).alias("allow"), F.lit("/private/").alias("pattern")),
                    F.struct(F.lit(True).alias("allow"), F.lit("/private/pub/").alias("pattern")),
                    F.struct(F.lit(False).alias("allow"), F.lit("/*.json").alias("pattern")),
                )
            ).alias("r"),
        )
        .select("host", "r.allow", "r.pattern")
        .localCheckpoint(eager=True)
    )

    results = []
    for n in [int(s) for s in args.sizes.split(",")]:
        urls = (
            spark.range(n)
            .select(
                F.concat(
                    F.lit("https://h"),
                    F.pmod(F.xxhash64("id"), F.lit(H)).cast("string"),
                    F.lit(".test"),
                    F.element_at(
                        F.array(
                            F.lit("/open/"), F.lit("/private/"),
                            F.lit("/private/pub/"), F.lit("/data/x.json"),
                        ),
                        (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
                    ),
                    F.col("id").cast("string"),
                ).alias("url")
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        v = frontier.robots_verdicts(urls, rules)
        agg = v.groupBy("allowed").count().collect()
        sec = time.time() - t0
        counts = {str(r["allowed"]): int(r["count"]) for r in agg}
        results.append(
            {
                "n_urls": n,
                "n_hosts": H,
                "rules_per_host": 3,
                "seconds": round(sec, 3),
                "urls_per_sec": round(n / sec),
                "verdicts": counts,
            }
        )
        print(results[-1], file=sys.stderr)

    out = {
        "runs": results,
        "url_growth": round(results[-1]["n_urls"] / results[0]["n_urls"], 1),
        "time_growth": round(
            results[-1]["seconds"] / results[0]["seconds"], 2
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
