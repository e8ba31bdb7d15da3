#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...extras}.

Headline set = the engine's hot paths: walk generation + MC pagerank
(the core numeric loop), the scheduler window, admission through the
bloom filters, and the corpus pipeline (dedup/minhash/ANN/textstats).
Extra keys report the BASELINE metrics: walks/s and frontier URLs/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    from crawler_spark import contract, rank, walks_gen
    from crawler_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the Python workers (numpy/pandas import, Arrow channel)
    # outside the timings — a long-lived cluster pays this once
    import pandas as pd

    def _warm(batches):
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    n_workers = int(cpus) * 4 if str(cpus).isdigit() else 128
    spark.range(0, n_workers, 1, n_workers).mapInPandas(_warm, "id long").count()

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    def bench(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"  {name}: {dt:.2f}s", file=sys.stderr)
        return out

    # q1: walk generation + global pagerank (the core numeric loop).
    # Also yields the walks/s throughput number for BASELINE.md.
    def q_walks():
        # persist-and-release: the derived edge frame feeds the CSR
        # collect, the start set, and the seed expansion — one events
        # scan + JSON parse instead of one per consumer
        edges = contract._events_edges(spark, sf_dir).persist()
        starts = edges.select(F.col("src").alias("node_id")).distinct()
        walks = walks_gen.generate_walks(
            spark, edges, starts, walks_per_node=100, seed=42,
            strategy="broadcast",
        )
        scores = rank.global_pagerank(walks)
        n = scores.count()
        extras["n_walk_starts"] = starts.count()
        edges.unpersist()
        return n

    bench("q1_walks_pagerank", q_walks)
    n_walks = extras.pop("n_walk_starts") * 100
    extras["walks_per_sec"] = round(n_walks / timings["q1_walks_pagerank"], 1)

    # q2: frontier schedule (politeness window + priority order)
    def q_sched():
        return contract.q_w3_politeness_schedule(spark, sf_dir).count()

    bench("q2_schedule", q_sched)

    # q3: admission through partitioned bloom + exact verify
    def q_admit():
        return contract.q_s2_admission_seen_filter(spark, sf_dir).count()

    n_admitted = bench("q3_admission", q_admit)
    extras["frontier_urls_per_sec"] = round(
        (n_admitted or 1) / timings["q3_admission"], 1
    )

    # q4: latest-page dedup window (W1)
    bench("q4_latest_dedup", lambda: contract.q_s4_latest_event_dedup(
        spark, sf_dir).count())

    # q5: delta algebra (T3) over 600k lineitem rows
    bench("q5_delta_partition", lambda: contract.q_t3_delta_partition(
        spark, sf_dir).count())

    # q6: exact dedup over documents — persist-and-release: the
    # (id, fp) pass is cached for its two consumers (keeper agg +
    # join) and released right after the action, the pipeline shape
    def q_exact():
        from crawler_spark.ops import dedup

        release: list = []
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = dedup.exact_dedup(docs, release=release).count()
        for f in release:
            f.unpersist()
        return n

    bench("q6_dedup_exact", q_exact)
    # steady-state row for the same query: the cold row above is
    # dominated by one-time plan compile/scheduling (data cost is
    # microscopic at sf0.1 — 1.5 MB of text); a long-lived cluster
    # pays the compile once, so both numbers are reported
    t0 = time.time()
    q_exact()
    extras["q6_dedup_exact_steady"] = round(time.time() - t0, 3)

    # q7: minhash LSH candidate pairs
    bench("q7_minhash_lsh", lambda: contract.q_dedup_minhash_lsh(
        spark, sf_dir).count())

    # q8: ANN cosine top-k
    bench("q8_ann_topk", lambda: contract.q_ann_cosine_topk(
        spark, sf_dir).count())

    # q9: text stats (langid/quality/tokens/fingerprint)
    bench("q9_text_stats", lambda: contract.q_text_stats(
        spark, sf_dir).count())

    # headline total = q1-q9 (stable across rounds for BASELINE.md
    # comparability); the training-pipeline ops are timed separately
    total = round(sum(timings.values()), 3)

    pipeline: dict[str, float] = {}

    def pbench(name, fn):
        t0 = time.perf_counter()
        fn()
        pipeline[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {pipeline[name]:.2f}s", file=sys.stderr)

    pbench("p1_pipeline_pack", lambda: contract.q_pipeline_pack(
        spark, sf_dir).count())
    pbench("p2_decontamination", lambda: contract.q_decontamination(
        spark, sf_dir).count())
    pbench("p3_domain_mixture", lambda: contract.q_domain_mixture(
        spark, sf_dir).count())
    # p4 uses the release shape (one scan+explode per corpus); the
    # driver-owned contract query stays fully lazy like q6's
    def q_dsir():
        from crawler_spark.ops import dsir

        release: list = []
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = dsir.dsir_select(
            docs, docs.filter(F.col("lang") == "en"), k=100,
            n_buckets=4096, smoothing=1.0, seed=17, release=release,
        ).count()
        for f in release:
            f.unpersist()
        return n

    pbench("p4_dsir", q_dsir)
    pbench("p5_ngram_repetition", lambda: contract.q_ngram_repetition(
        spark, sf_dir).count())
    pbench("p6_classifier_score", lambda: contract.q_classifier_score(
        spark, sf_dir).count())
    pbench("p7_bpe_token_counts", lambda: contract.q_bpe_token_counts(
        spark, sf_dir).count())

    # p8 uses the release shape (one tokenize+md5 gram pass feeding
    # the count agg and the coverage join), like q6/p4
    def q_spans():
        from crawler_spark.ops import dedup

        release: list = []
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = dedup.span_dedup(docs, n=8, release=release).count()
        for f in release:
            f.unpersist()
        return n

    pbench("p8_span_dedup", q_spans)
    pbench("p9_anchor_topk", lambda: contract.q_anchor_text_topk(
        spark, sf_dir).count())
    extras["pipeline"] = pipeline
    out = {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus) if str(cpus).isdigit() else cpus,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
