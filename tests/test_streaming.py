"""Streaming-form gates: the foreachBatch ingest reaches the same
engine state as batch processing of the same pages, and the
watermarked window metrics aggregate per host."""

import datetime as dt

from pyspark.sql import functions as F

from crawler_spark import datagen, engine, schemas, streaming

NOW = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)


def _write_pages(spark, tmp_path):
    follows = {i: sorted({(i + 1) % 20, (i + 3) % 20} - {i}) for i in range(20)}
    pages = datagen.pages_df(spark, follows)
    d = str(tmp_path / "pages_stream")
    # two file chunks -> at least one micro-batch each under availableNow
    pages.filter(F.col("url") < datagen.node_url(10)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    pages.filter(F.col("url") >= datagen.node_url(10)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    return d, pages


def _mk(spark, tmp_path, name):
    return engine.CrawlEngine(
        spark, str(tmp_path / name), walks_per_node=10, n_buckets=8,
        promotion_wait_s=0.0, seed=42,
    )


def test_stream_ingest_matches_batch(spark, tmp_path):
    d, pages = _write_pages(spark, tmp_path)
    seeds = [datagen.node_url(i) for i in (0, 5)]

    eng_s = _mk(spark, tmp_path, "stream")
    eng_s.bootstrap(seeds, NOW)
    q = streaming.run_ingest_stream(
        eng_s, d, str(tmp_path / "ckpt"), now=NOW + dt.timedelta(minutes=1)
    )
    q.awaitTermination(120)

    eng_b = _mk(spark, tmp_path, "batch")
    eng_b.bootstrap(seeds, NOW)
    eng_b.epoch += 1
    eng_b.process_pages(pages, NOW + dt.timedelta(minutes=1))

    # same seen-set and edges regardless of micro-batch slicing
    s_urls = sorted(r.url for r in eng_s.nodes.select("url").collect())
    b_urls = sorted(r.url for r in eng_b.nodes.select("url").collect())
    assert s_urls == b_urls
    s_edges = sorted(map(tuple, eng_s.edges.collect()))
    b_edges = sorted(map(tuple, eng_b.edges.collect()))
    assert s_edges == b_edges


def test_host_rate_metrics_batch_semantics(spark):
    """The windowed agg is testable on a static frame (same expr)."""
    follows = {i: [] for i in range(6)}
    pages = datagen.pages_df(spark, follows)
    m = streaming.host_rate_metrics(pages, window="1 minute").collect()
    assert sum(r.n_pages for r in m) == 6
    assert all(r.host.startswith("node") for r in m)


def test_polite_gate_stateful_stream(spark, tmp_path):
    """applyInPandasWithState politeness gate: per-host token bucket
    carried as state across micro-batches — admissions never exceed
    the accrued event-time budget, top-priority urls win, and the
    result matches a python replay oracle."""
    import pandas as pd

    rows = []
    for b, base_ts in ((0, 0), (1, 30)):
        for h in ("a.test", "b.test"):
            for i in range(6):
                rows.append(
                    {
                        "url": f"https://{h}/b{b}p{i}",
                        "host": h,
                        "priority": float(i),
                        "warc_ts": dt.datetime(2025, 6, 1, 0, 0, base_ts),
                        "batch": b,
                    }
                )
    pdf = pd.DataFrame(rows)
    src_dir = str(tmp_path / "cand")
    for b in (0, 1):
        spark.createDataFrame(pdf[pdf["batch"] == b].drop(columns=["batch"])) \
            .coalesce(1).write.mode("append").parquet(src_dir)

    cand = (
        spark.readStream.schema(
            "url string, host string, priority double, warc_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming.polite_gate_stream(cand, crawl_delay_s=10.0, burst_cap=4.0)
    q = (
        out.writeStream.format("memory")
        .queryName("polite")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from polite").collect()
    by_host: dict[str, list] = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    # batch 0: fresh host -> credit 1.0 -> exactly the top-priority
    # url; the over-budget rest DEFERS in state. batch 1 (30s later,
    # delay 10s) -> 3 tokens over deferred ∪ new by (priority, url):
    # b1p5 (prio 5), then prio-4 ties b0p4 < b1p4.
    for h in ("a.test", "b.test"):
        urls = {r.url for r in by_host[h]}
        assert urls == {
            f"https://{h}/b0p5",
            f"https://{h}/b1p5",
            f"https://{h}/b0p4",
            f"https://{h}/b1p4",
        }, urls


def test_stream_source_schema(spark, tmp_path):
    d, _ = _write_pages(spark, tmp_path)
    src = streaming.stream_pages(spark, d)
    assert src.isStreaming
    assert [f.name for f in src.schema.fields] == [
        f.name for f in schemas.PAGES.fields
    ]
