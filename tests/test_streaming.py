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


def test_polite_gate_clock_never_regresses(spark, tmp_path):
    """A LATE micro-batch (event time older than the host's stored
    clock) accrues no credit — and must not rewind the stored clock
    either: rewinding would let the next in-order batch re-accrue an
    interval already counted and over-admit up to burst_cap fetches
    in one slot. Replay: t=30s (fresh: 1 slot), t=0s (late: 0), t=40s
    (10s after 30s at delay 10 -> exactly 1 more slot, NOT 4)."""
    import pandas as pd

    src_dir = str(tmp_path / "cand_late")
    for b, sec in ((0, 30), (1, 0), (2, 40)):
        rows = [
            {
                "url": f"https://late.test/b{b}p{i}",
                "host": "late.test",
                "priority": float(i),
                "warc_ts": dt.datetime(2025, 6, 1, 0, 0, sec),
            }
            for i in range(6)
        ]
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

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
        .queryName("polite_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url from polite_late").collect()
    # 1 (fresh) + 0 (late batch, no accrual) + 1 (10s elapsed) = 2;
    # the rewind bug admits 4 in the third batch (total 5)
    assert len(got) == 2, [r.url for r in got]
    assert {r.url for r in got} == {
        "https://late.test/b0p5",
        "https://late.test/b1p5",
    }


def test_stream_schedule_matches_batch_scheduler(spark, tmp_path):
    """Politeness parity (reference: the bounded-channel scheduler,
    cmd/crawler.go:101-133): over identical candidate replays — one
    parquet file per tick, every host represented each tick — the
    stateful stream gate admits EXACTLY the urls schedule_batch
    fetches, tick by tick, under matched budgets (tick_seconds ==
    crawl_delay_s -> per-host budget 1, burst_cap 1, no global cap)."""
    import pandas as pd

    from crawler_spark import frontier as frontier_mod

    hosts = [f"node{i}.test" for i in range(5)]
    ticks = [NOW + dt.timedelta(seconds=60 * t) for t in range(3)]
    rows = []
    for t, ts in enumerate(ticks):
        for h in hosts:
            for i in range(2):  # 2 new urls per host per tick
                rows.append(
                    {
                        "url": f"https://{h}/t{t}u{i}",
                        "priority": float(10 * t + i + hash(h) % 3),
                        "warc_ts": ts.replace(tzinfo=None),
                        "tick": t,
                    }
                )
    pdf = pd.DataFrame(rows)
    src_dir = str(tmp_path / "cand_parity")
    for t in range(3):
        spark.createDataFrame(
            pdf[pdf["tick"] == t].drop(columns=["tick"])
        ).coalesce(1).write.mode("append").parquet(src_dir)

    # --- stream side: one micro-batch per tick file
    out = streaming.polite_gate_stream(
        streaming.stream_candidates(spark, src_dir),
        crawl_delay_s=60.0,
        burst_cap=1.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sched_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_parity"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sched_parity").collect()
    stream_by_tick: dict[float, set] = {}
    for r in got:
        stream_by_tick.setdefault(float(r.admitted_ts), set()).add(r.url)

    # --- batch side: enqueue each tick's arrivals, schedule one tick
    frontier = None
    batch_by_tick = []
    for t, ts in enumerate(ticks):
        cand_t = spark.createDataFrame(
            pdf[pdf["tick"] == t][["url", "priority"]]
        )
        frontier = frontier_mod.enqueue(frontier, cand_t, ts)
        batch, frontier = frontier_mod.schedule_batch(
            frontier, None, ts, tick_seconds=60.0, batch_size=10**6,
            default_crawl_delay_s=60.0,
        )
        batch_by_tick.append({r.url for r in batch.select("url").collect()})

    assert len(stream_by_tick) == len(ticks)
    for ts, want in zip(ticks, batch_by_tick):
        assert stream_by_tick[ts.timestamp()] == want, ts


def test_run_crawl_stream_end_to_end(spark, tmp_path):
    """The gated crawl stream: admitted urls are fetched from the web
    corpus and flow through the full process pipeline with a commit
    per micro-batch — per-host politeness holds (1 admission per host
    per tick at matched budgets) and discovery happens."""
    import pandas as pd

    follows = {i: sorted({(i + 1) % 8, (i + 3) % 8} - {i}) for i in range(8)}
    web = datagen.pages_df(spark, follows)
    urls = [datagen.node_url(i) for i in range(8)]

    cand_dir = str(tmp_path / "cand_e2e")
    ticks = [NOW + dt.timedelta(seconds=60 * t) for t in range(2)]
    # every url is a candidate at every tick (hosts are distinct per
    # url in the synthetic web, so budget-1 admits each url's host
    # once per tick; re-admissions dedup through W1/seen)
    for t, ts in enumerate(ticks):
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": urls[: 4 * (t + 1)],
                    "priority": [float(i) for i in range(len(urls[: 4 * (t + 1)]))],
                    "warc_ts": [ts.replace(tzinfo=None)] * len(urls[: 4 * (t + 1)]),
                }
            )
        ).coalesce(1).write.mode("append").parquet(cand_dir)

    eng = _mk(spark, tmp_path, "crawlstream")
    eng.bootstrap([urls[0]], NOW)
    epoch0 = eng.epoch
    q = streaming.run_crawl_stream(
        eng, cand_dir, web, str(tmp_path / "ckpt_e2e"),
        crawl_delay_s=60.0, burst_cap=1.0, now=ticks[-1],
    )
    q.awaitTermination(180)
    # one committed epoch per admitted micro-batch
    assert eng.epoch > epoch0
    # pages were processed: discovery minted nodes beyond the seed
    assert eng.nodes.count() > 1
    assert eng.edges.count() > 0
    # the crawl-and-rank loop CLOSES in continuous mode: the per-batch
    # arbiter promoted discovered nodes and generated walks for them —
    # without it, walks only ever start at the bootstrap seed
    starts = {
        int(r.start_id)
        for r in eng.walks.select("start_id").distinct().collect()
    }
    assert len(starts) > 1, "streaming arbiter never promoted anyone"
    active = eng.nodes.filter(F.col("status") == "active").count()
    assert active > 1


def test_stream_source_schema(spark, tmp_path):
    d, _ = _write_pages(spark, tmp_path)
    src = streaming.stream_pages(spark, d)
    assert src.isStreaming
    assert [f.name for f in src.schema.fields] == [
        f.name for f in schemas.PAGES.fields
    ]


def test_dedup_exact_stream_matches_batch(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the
    content fingerprint): exactly one survivor per fingerprint, and
    under in-order replay (later files carry the higher doc_ids) the
    survivor set equals the batch exact_dedup keepers (min doc_id
    per fingerprint)."""
    import pandas as pd

    from crawler_spark.ops import dedup as dedup_ops

    rows, did = [], 0
    for b, texts in (
        (0, ["alpha text", "beta text", "gamma text"]),
        (1, ["alpha text", "delta text", "beta text"]),
    ):
        for t in texts:
            rows.append(
                {
                    "doc_id": did,
                    "text": t,
                    "ingest_ts": dt.datetime(2025, 6, 1, 0, 0, b * 30),
                    "batch": b,
                }
            )
            did += 1
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "docs")
    for b in (0, 1):
        spark.createDataFrame(pdf[pdf.batch == b].drop(columns=["batch"])) \
            .coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming.dedup_exact_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").collect()
    fps = [r.fp for r in got]
    assert len(fps) == len(set(fps))  # one survivor per fingerprint
    batch_docs = spark.createDataFrame(pdf.drop(columns=["batch"]))
    keepers = {
        int(r["keeper_id"]) for r in dedup_ops.exact_dedup(batch_docs).collect()
    }
    assert {int(r.doc_id) for r in got} == keepers == {0, 1, 2, 4}


def test_lsh_pairs_stream_matches_batch(spark, tmp_path):
    """Streaming MinHash-LSH candidate pairs (stateful band buckets):
    pairs found across TWO micro-batches — including cross-batch
    pairs via bucket state — equal batch lsh_candidate_pairs over the
    union of both batches (below bucket_cap the equality is exact)."""
    import pandas as pd

    from crawler_spark.ops import dedup as dedup_ops

    base = "the quick brown fox jumps over the lazy dog again today "
    rows = []
    texts = {
        0: base,                      # batch 0
        1: base + "zz ",              # batch 0, near-dup of 0
        2: "completely different words about spark engines here",  # b0
        3: base + "qq ",              # batch 1, near-dup of 0 and 1
        4: "completely different words about spark engines here!",  # b1 ~2
        5: "unrelated third topic entirely separate content",       # b1
    }
    for did, t in texts.items():
        rows.append(
            {
                "doc_id": did,
                "text": t,
                "batch": 0 if did < 3 else 1,
            }
        )
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "lshdocs")
    for b in (0, 1):
        spark.createDataFrame(pdf[pdf.batch == b].drop(columns=["batch"])) \
            .coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming.lsh_pairs_stream(stream, n_hashes=16, bands=4)
        .writeStream.format("memory")
        .queryName("lsh_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_lsh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.sql("select * from lsh_stream").collect()
    }
    batch_docs = spark.createDataFrame(pdf.drop(columns=["batch"]))
    want = {
        (r.doc_a, r.doc_b)
        for r in dedup_ops.lsh_candidate_pairs(
            batch_docs, n_hashes=16, bands=4
        ).collect()
    }
    assert got == want
    # the cross-batch near-dup pair must be present (state memory)
    assert (0, 3) in got and (2, 4) in got


def test_stateless_corpus_ops_compose_with_streams(spark, tmp_path):
    """corpus_filter, redact_pii and canonical_url are pure column
    expressions, so they run unchanged on a streaming DataFrame — the
    corpus admission gate and the PII scrubber compose into an ingest
    stream with batch-identical output."""
    import pandas as pd

    from crawler_spark.functions import extract
    from crawler_spark.ops import textstats

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog here",
                "too short",
                "HTTP://Example.COM:80/a?b=2&a=1#f",
            ],
        }
    )
    src = str(tmp_path / "cdocs")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = textstats.corpus_filter(stream).withColumn(
        "canon", extract.canonical_url(F.lit("HTTP://Example.COM:80/x"))
    ).withColumn(
        "red", textstats.redact_pii(F.lit("ping a@b.io at 10.0.0.1"))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_corpus"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.keep, r.reason, r.canon, r.red)
        for r in spark.sql("select * from corpus_stream").collect()
    }
    batch = {
        r.doc_id: (r.keep, r.reason)
        for r in textstats.corpus_filter(spark.createDataFrame(pdf)).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == batch
    assert all(v[2] == "http://example.com/x" for v in got.values())
    assert all(v[3] == "ping <EMAIL> at <IP>" for v in got.values())


def test_stream_arbiter_matches_batch_epochs(spark, tmp_path):
    """The continuous form closes the crawl-and-rank loop (the
    reference's NodeArbiter runs concurrently with the firehose,
    arbiter.go:44-81, cmd/crawler.go:89-141): a promotion-triggering
    replay through run_ingest_stream flips the same nodes and
    generates the same walks as the batch loop running
    process_pages + maybe_arbiter over the identical slices — and
    the stream's arbiter-flipping commits stay bucket-scoped (no
    full-table snapshot after bootstrap)."""
    follows = {
        i: sorted({(i + 1) % 40, (i + 7) % 40} - {i}) for i in range(40)
    }
    pages = datagen.pages_df(spark, follows)
    slices = [
        pages.filter(F.col("url") < datagen.node_url(20)),
        pages.filter(F.col("url") >= datagen.node_url(20)),
    ]
    d = str(tmp_path / "pages_arb")
    for sl in slices:
        sl.coalesce(1).write.mode("append").parquet(d)
    ts = NOW + dt.timedelta(minutes=1)

    def mk(name):
        return engine.CrawlEngine(
            spark, str(tmp_path / name), walks_per_node=20, n_buckets=8,
            promotion_wait_s=0.0, seed=42,
        )

    seeds = [datagen.node_url(i) for i in (0, 1, 2)]

    eng_b = mk("arb_batch")
    eng_b.bootstrap(seeds, NOW)
    promoted = 0
    for sl in slices:
        eng_b.epoch += 1
        stats = eng_b.process_pages(sl, ts)
        stats.update(eng_b.maybe_arbiter(ts))
        eng_b._commit(ts, stats)
        promoted += stats.get("promoted", 0)
    assert promoted > 0  # the replay is promotion-triggering

    eng_s = mk("arb_stream")
    eng_s.bootstrap(seeds, NOW)
    q = streaming.run_ingest_stream(
        eng_s, d, str(tmp_path / "ckpt_arb"), now=ts,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    # same flips, same nodes, same walks, same maintained counters
    key_n = lambda e: sorted(
        (r.url, int(r.node_id), r.status) for r in e.nodes.collect()
    )
    assert key_n(eng_s) == key_n(eng_b)
    key_w = lambda e: sorted(
        (int(r.walk_id), int(r.start_id), tuple(r.path))
        for r in e.walks.collect()
    )
    assert key_w(eng_s) == key_w(eng_b)
    assert eng_s.total_visits == eng_b.total_visits
    assert eng_s.next_walk_id == eng_b.next_walk_id

    # every post-bootstrap commit of the big tables is bucket-scoped
    partial_seen = 0
    for table in ("walks", "nodes", "visits"):
        for snap in eng_s.cat.snapshots(table)[1:]:
            changed = snap.metrics.get("changed_buckets")
            if changed is not None:
                assert len(changed) <= eng_s.n_table_buckets
                partial_seen += 1
    assert partial_seen > 0


def test_polite_ingest_matches_batch_scheduler(spark, tmp_path, monkeypatch):
    """Scheduler-contract parity for the POLITE ingest stream
    (reference: the firehose is rate-limited per host by the
    bounded-channel scheduler BEFORE processing, cmd/crawler.go:
    101-133): over a paced multi-host page replay — one parquet file
    per tick, 2 pages per host per tick, matched budgets — each
    micro-batch of run_polite_ingest_stream processes EXACTLY the
    urls frontier.schedule_batch would fetch for the same arrivals,
    tick by tick."""
    import pandas as pd

    from crawler_spark import frontier as frontier_mod

    hosts = [f"h{j}.test" for j in range(4)]
    ticks = [NOW + dt.timedelta(seconds=60 * t) for t in range(3)]
    d = str(tmp_path / "pages_polite")
    by_tick = []
    for t, ts in enumerate(ticks):
        rows = [
            {
                "url": f"https://{h}/t{t}u{i}",
                "warc_ts": ts.replace(tzinfo=None),
                "html": b"<html></html>",
                "text": "x",
                "lang": "en",
            }
            for h in hosts
            for i in range(2)
        ]
        spark.createDataFrame(
            pd.DataFrame(rows), schema=schemas.PAGES
        ).coalesce(1).write.mode("append").parquet(d)
        by_tick.append(rows)

    eng = _mk(spark, tmp_path, "polite_ingest")
    eng.bootstrap(["https://seed.test/"], NOW)

    seen_batches: list[set] = []
    orig = engine.CrawlEngine.process_pages

    def spy(self, pages, ts):
        seen_batches.append({r.url for r in pages.select("url").collect()})
        return orig(self, pages, ts)

    monkeypatch.setattr(engine.CrawlEngine, "process_pages", spy)
    q = streaming.run_polite_ingest_stream(
        eng, d, str(tmp_path / "ckpt_polite"),
        crawl_delay_s=60.0, burst_cap=1.0, now=ticks[-1],
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    monkeypatch.undo()

    # batch twin: enqueue each tick's arrivals, schedule one tick
    frontier = None
    want = []
    for t, ts in enumerate(ticks):
        cand_t = spark.createDataFrame(
            pd.DataFrame(
                [
                    {"url": r["url"], "priority": float(ts.timestamp())}
                    for r in by_tick[t]
                ]
            )
        )
        frontier = frontier_mod.enqueue(frontier, cand_t, ts)
        batch, frontier = frontier_mod.schedule_batch(
            frontier, None, ts, tick_seconds=60.0, batch_size=10**6,
            default_crawl_delay_s=60.0,
        )
        want.append({r.url for r in batch.select("url").collect()})

    got = [s for s in seen_batches if s]
    assert got == want


def test_polite_ingest_pins_batch_to_admitted_version(spark, tmp_path):
    """A re-crawled url whose NEWER version has already landed in
    pages_dir must not be processed ahead of its politeness slot:
    each micro-batch re-reads page rows pinned to its admitted
    (url, warc_ts) versions, so the version-1 batch commits
    version-1's links even though version 2 is already on disk
    (url-only re-join would window-pick the newer content early and
    then reprocess it at its real slot)."""
    import time as _time

    import pandas as pd

    a = "https://a.test/"
    x1, x2 = "https://x1.test/", "https://x2.test/"
    d = str(tmp_path / "pages_v")
    t0 = NOW.replace(tzinfo=None)

    def row(ts, link, text):
        return {
            "url": a,
            "warc_ts": ts,
            "html": datagen.render_html(a, text, [link]),
            "text": text,
            "lang": "en",
        }

    spark.createDataFrame(
        pd.DataFrame([row(t0, x1, "version one")]), schema=schemas.PAGES
    ).coalesce(1).write.mode("append").parquet(d)
    _time.sleep(1.2)  # distinct mtimes -> deterministic batch order
    spark.createDataFrame(
        pd.DataFrame(
            [row(t0 + dt.timedelta(seconds=30), x2, "version two")]
        ),
        schema=schemas.PAGES,
    ).coalesce(1).write.mode("append").parquet(d)

    # x1/x2 bootstrapped as KNOWN nodes: target resolution then works
    # for the author regardless of its active/inactive status (the
    # arbiter may demote `a` between the two slots; an inactive
    # author's delta applies over known targets only, process.go:
    # 186-206), keeping this test purely about version pinning
    eng = _mk(spark, tmp_path, "pin")
    eng.bootstrap([a, x1, x2], NOW)
    q = streaming.run_polite_ingest_stream(
        eng,
        d,
        str(tmp_path / "ckpt_pin"),
        crawl_delay_s=10.0,
        burst_cap=1.0,
        now=NOW + dt.timedelta(minutes=5),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    urls = {r.node_id: r.url for r in eng.nodes.collect()}

    def edge_targets(epoch):
        snaps = [s for s in eng.cat.snapshots("edges") if s.epoch == epoch]
        assert snaps, f"no edges snapshot at epoch {epoch}"
        df = spark.read.parquet(snaps[-1].path)
        return {urls[r.dst] for r in df.select("dst").collect()}

    # epoch 1 = version 1's slot: its link set, not version 2's
    assert edge_targets(1) == {x1}
    # epoch 2 = version 2's slot: the follow-list delta replaced it
    assert edge_targets(2) == {x2}
