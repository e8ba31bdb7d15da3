#!/usr/bin/env python
"""Span-dedup cost vs corpus size: synthetic web-text corpora at
growing doc counts, each doc ~120 tokens with a 20% chance of
embedding one of 50 shared boilerplate passages (the duplicated-span
shape a crawl actually has: mostly-unique text, a small hot set of
repeated spans).

The claim under test is that time grows ~linearly with corpus tokens
(the gram explode + count agg dominate; the verdict table stays
delta-sized because the corpus is mostly unique), NOT with the
number of duplicated-span OCCURRENCES — a hub passage repeated in
20% of docs must not funnel anything through one task.

Usage: python benchmarks/span_scale.py [--out PATH] [--cpus N]
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
    ap.add_argument("--sizes", default="25000,100000,400000")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from crawler_spark.ops import dedup
    from crawler_spark.session import get_spark

    spark = get_spark(
        "span-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n_docs: int):
        # ~110 unique tokens per doc (hash-derived, corpus-unique) and,
        # for id % 5 == 0, one of 50 shared 12-token passages spliced in
        uniq = F.expr(
            "array_join(transform(sequence(1, 110), "
            "i -> concat('t', hex(xxhash64(id, i)))), ' ')"
        )
        # pmod(id/5, 50), NOT pmod(id, 50): passage docs all satisfy
        # id % 5 == 0, so pmod(id, 50) would only hit residues
        # {0,5,...,45} — 10 passages 5x hotter than documented
        passage = F.expr(
            "array_join(transform(sequence(1, 12), "
            "i -> concat('p', pmod(id div 5, 50), 'w', i)), ' ')"
        )
        return (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.when(
                    F.col("id") % 5 == 0,
                    F.concat(uniq, F.lit(" "), passage),
                )
                .otherwise(uniq)
                .alias("text"),
            )
            .localCheckpoint(eager=True)
        )

    results = []
    for n_docs in [int(s) for s in args.sizes.split(",")]:
        docs = corpus(n_docs)
        release: list = []
        t0 = time.time()
        out = dedup.span_dedup(docs, n=8, release=release)
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias(
                "docs_cut"
            ),
            F.sum("n_tokens_removed").alias("tokens_cut"),
        ).collect()[0]
        sec = time.time() - t0
        for f in release:
            f.unpersist()
        # DataFrame.unpersist() is a NO-OP for localCheckpoint blocks
        # — without the explicit free, each level's corpus stays in
        # the BlockManager while the next level runs
        from crawler_spark.session import free_local_checkpoint

        free_local_checkpoint(docs)
        results.append(
            {
                "n_docs": n_docs,
                "approx_tokens": n_docs * 110 + (n_docs // 5) * 12,
                "docs_out": int(agg["docs"]),
                "docs_cut": int(agg["docs_cut"]),
                "tokens_cut": int(agg["tokens_cut"]),
                "seconds": round(sec, 3),
            }
        )
        print(results[-1], file=sys.stderr)

    out = {"suite": "span_scale", "cpus": args.cpus, "results": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
