"""Duplicated-span removal (ops/dedup.span_dedup) — the n-gram
exact-substring pass: planted-passage fixtures plus equality with an
independent pandas brute-force on randomized corpora."""

import random

import pytest
from pyspark.sql import functions as F

from crawler_spark.ops import dedup


def _run(spark, rows, n=3, min_count=2, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.span_dedup(df, n=n, min_count=min_count, **kw)
    return {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"]) for r in out.collect()}


def test_planted_passage_removed_everywhere(spark):
    boiler = "all rights reserved contact us here"
    rows = [
        (0, f"alpha beta {boiler} gamma"),
        (1, f"{boiler} delta epsilon zeta"),
        (2, "nothing shared at all today friend"),
    ]
    got = _run(spark, rows, n=3)
    assert got[0] == ("alpha beta gamma", 6)
    assert got[1] == ("delta epsilon zeta", 6)
    assert got[2] == ("nothing shared at all today friend", 0)


def test_within_doc_repeat_counts(spark):
    # the 3-gram "x y z" occurs twice INSIDE one doc -> removed
    got = _run(spark, [(0, "x y z q x y z")], n=3)
    assert got[0] == ("q", 6)


def test_short_overlap_untouched_and_whitespace_collapse(spark):
    # only 2 shared tokens < n=3 -> kept; runs of whitespace collapse
    got = _run(spark, [(0, "a b  c\td"), (1, "a b e f")], n=3)
    assert got[0] == ("a b c d", 0)
    assert got[1] == ("a b e f", 0)


def test_fully_covered_blank_and_short_docs(spark):
    rows = [(0, "p q r"), (1, "p q r"), (2, ""), (3, "one two")]
    got = _run(spark, rows, n=3)
    assert got[0] == ("", 3) and got[1] == ("", 3)
    assert got[2] == ("", 0)
    assert got[3] == ("one two", 0)


def test_null_text_rows_get_no_output_row(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, None)], "doc_id long, text string"
    )
    out = dedup.span_dedup(df, n=2)
    assert sorted(r["doc_id"] for r in out.collect()) == [0]


def _brute(rows, n, min_count):
    toks = {i: t.split() for i, t in rows if t is not None}
    from collections import Counter

    c = Counter(
        " ".join(ts[p : p + n])
        for ts in toks.values()
        for p in range(len(ts) - n + 1)
    )
    out = {}
    for i, ts in toks.items():
        cov = set()
        for p in range(len(ts) - n + 1):
            if c[" ".join(ts[p : p + n])] >= min_count:
                cov.update(range(p, p + n))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        out[i] = (" ".join(kept), len(cov))
    return out


@pytest.mark.parametrize("seed", [1, 2])
def test_matches_bruteforce_random(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(30)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9)))
        for _ in range(5)
    ]
    rows = []
    for i in range(40):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        if rng.random() < 0.5:
            parts.append(rng.choice(passages))
        rng.shuffle(parts)
        rows.append((i, " ".join(parts)))
    got = _run(spark, rows, n=4, min_count=2)
    assert got == _brute(rows, 4, 2)


def test_release_contract_single_pass(spark):
    rows = [(i, f"t{i} u{i} shared span here v{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    release = []
    out = dedup.span_dedup(df, n=3, release=release)
    got = {r["doc_id"]: r["n_tokens_removed"] for r in out.collect()}
    assert all(v == 3 for v in got.values())  # "shared span here"
    # both the tokenized frame AND the gram rows persist (one
    # tokenize pass, one md5-hashing pass across all branches)
    assert len(release) == 2
    for f in release:
        f.unpersist()


def test_incremental_span_dedup_matches_full_run(spark):
    """The per-crawl-batch shape: batch deduped against ONLY the
    stored (g, n_occurrences) corpus table must equal the batch-id
    slice of a full span_dedup over corpus ∪ batch — cross-side spans
    (one corpus + one batch occurrence) cut, batch-internal spans
    cut, corpus-only spans invisible to the batch, unique text
    survives. State update: occurrence counts add across epochs."""
    boiler = "one two three"
    corpus = spark.createDataFrame(
        [
            (0, f"c0 head {boiler} c0 tail"),
            (1, "corpus only words here now"),
            (2, "repeated inside corpus repeated inside corpus"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, f"b0 lead {boiler} b0 end"),
            (11, "shared batch span aa bb"),
            (12, "shared batch span cc dd"),
            (13, "totally unique batch words"),
        ],
        "doc_id long, text string",
    )
    from crawler_spark.ops import dedup as dd

    state = dd.span_gram_counts(corpus, n=3)
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_removed)
        for r in dd.incremental_span_dedup(batch, state, n=3).collect()
    }
    full = {
        r.doc_id: (r.clean_text, r.n_tokens_removed)
        for r in dd.span_dedup(corpus.unionByName(batch), n=3).collect()
        if r.doc_id >= 10
    }
    assert got == full
    assert got[10] == ("b0 lead b0 end", 3)       # cross-side
    assert got[11] == ("aa bb", 3)                # batch-internal
    assert got[13][1] == 0                        # untouched
    merged = (
        state.unionByName(dd.span_gram_counts(batch, n=3))
        .groupBy("g")
        .agg(F.sum("n_occurrences").alias("n_occurrences"))
    )
    direct = dd.span_gram_counts(corpus.unionByName(batch), n=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
