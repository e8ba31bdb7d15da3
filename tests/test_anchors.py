"""Anchor-text extraction + per-target rollup (ops/anchors).

The extraction fixtures gate the parser conventions (nested markup
stripped, entities one-pass decoded, whitespace collapsed, self/empty
hrefs dropped, per-page dedup, undecodable bytes skipped); the rollup
is checked against an independent pandas recomputation; the plan gate
lives in tests/test_plans.py.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.extract import _anchors_one
from crawler_spark.ops import anchors


def _pairs(html: bytes, url: str = "https://self.test/"):
    return [(d["href"], d["anchor"]) for d in _anchors_one(html, url)]


def test_anchor_basic_and_sorted():
    html = (
        b'<a href="https://b.test/">beta</a>'
        b'<a href="https://a.test/">alpha</a>'
    )
    assert _pairs(html) == [
        ("https://a.test/", "alpha"),
        ("https://b.test/", "beta"),
    ]


def test_anchor_nested_markup_stripped_and_ws_collapsed():
    html = (
        b'<a href="https://x.test/" class="nav">\n  click <b>here</b>\n'
        b"   now </a>"
    )
    assert _pairs(html) == [("https://x.test/", "click here now")]


def test_anchor_entities_single_pass():
    # &amp;lt; must decode to '&lt;' (one pass), not '<'
    html = (
        b'<a href="https://x.test/">a &amp; b &lt;c&gt; &quot;d&quot; '
        b"&#39;e&#39; &amp;lt;</a>"
    )
    assert _pairs(html) == [
        ("https://x.test/", "a & b <c> \"d\" 'e' &lt;")
    ]


def test_anchor_self_empty_and_undecodable_dropped():
    html = (
        b'<a href="https://self.test/">me</a>'
        b'<a href="">blank</a>'
        b'<a href="https://ok.test/">ok</a>'
        b'<a href="https://l1.test/\xff">bad href</a>'
        b'<a href="https://l2.test/">caf\xe9</a>'
    )
    assert _pairs(html) == [("https://ok.test/", "ok")]


def test_anchor_empty_body_kept_and_page_dedup():
    html = (
        b'<a href="https://img.test/"><img src="x.png"></a>'
        b'<a href="https://rep.test/">same</a>'
        b'<a href="https://rep.test/">same</a>'
    )
    assert _pairs(html) == [
        ("https://img.test/", ""),
        ("https://rep.test/", "same"),
    ]


def test_anchor_multiline_body_and_cap():
    html = b'<a href="https://m.test/">line\none</a>'
    assert _pairs(html) == [("https://m.test/", "line one")]
    from crawler_spark.schemas import MAX_OUTLINKS_TAGS

    big = b"".join(
        b'<a href="https://h%d.test/">t</a>' % i
        for i in range(MAX_OUTLINKS_TAGS + 1)
    )
    assert _anchors_one(big, None) == []
    assert _anchors_one(None, None) == []


@pytest.fixture(scope="module")
def page_df(spark):
    rows = []
    for i in range(40):
        body = b"".join(
            b'<a href="https://node%d.test/">label %d</a>'
            % ((i * 3 + j) % 10, (i + j) % 4)
            for j in range(3)
        )
        # one self link per page: must not appear in the pairs
        body += b'<a href="https://src%d.test/">self</a>' % i
        rows.append((f"https://src{i}.test/", body))
    return spark.createDataFrame(rows, "url string, html binary")


def test_anchor_pairs_and_topk_match_pandas(spark, page_df):
    got = anchors.anchor_pairs(page_df).toPandas()
    exp = []
    for r in page_df.select("url", "html").collect():
        for d in _anchors_one(bytes(r["html"]), r["url"]):
            exp.append((r["url"], d["href"], d["anchor"]))
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(exp)
    assert not any(a == "self" for _, _, a in exp)

    k = 2
    topk = anchors.anchor_text_topk(
        anchors.anchor_pairs(page_df), k=k
    ).toPandas()
    cnt = (
        pd.DataFrame(exp, columns=["s", "dst_url", "anchor"])
        .groupby(["dst_url", "anchor"], as_index=False)
        .size()
        .rename(columns={"size": "n_pages"})
        .sort_values(
            ["dst_url", "n_pages", "anchor"],
            ascending=[True, False, True],
        )
    )
    cnt["rn"] = cnt.groupby("dst_url").cumcount() + 1
    exp_top = cnt[cnt["rn"] <= k]
    assert sorted(
        map(tuple, topk[["dst_url", "anchor", "n_pages", "rn"]].itertuples(index=False))
    ) == sorted(map(tuple, exp_top.itertuples(index=False)))
    # every dst keeps at most k rows and ranks are 1..k
    assert topk.groupby("dst_url")["rn"].max().le(k).all()


def test_relative_and_messy_hrefs_normalized_or_dropped(spark):
    """The rollup aggregates on canonical ABSOLUTE keys: relative
    hrefs (which would collide across sites) drop, and case/query
    variants of one target fold to one canonical row per page."""
    rows = [
        (
            "https://a.test/",
            b'<a href="/about">rel</a>'
            b'<a href="HTTP://T.Test:80/x?b=2&a=1">v1</a>',
        ),
        (
            "https://b.test/",
            b'<a href="/about">rel</a>'
            b'<a href="http://t.test/x?a=1&b=2">v1</a>',
        ),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    pairs = anchors.anchor_pairs(df)
    got = sorted(map(tuple, pairs.collect()))
    assert got == [
        ("https://a.test/", "http://t.test/x?a=1&b=2", "v1"),
        ("https://b.test/", "http://t.test/x?a=1&b=2", "v1"),
    ]
    top = anchors.anchor_text_topk(pairs, k=1).collect()
    assert len(top) == 1 and top[0]["n_pages"] == 2
    # raw mode keeps everything for debugging
    assert anchors.anchor_pairs(df, validate=False).count() == 4


def test_page_variants_fold_to_one_count(spark):
    """Two raw variants of ONE target on one page must count the
    page once after canonical folding (the post-fold distinct)."""
    rows = [
        (
            "https://a.test/",
            b'<a href="https://t.test/p">go</a>'
            b'<a href="https://t.test/p#frag">go</a>',
        )
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = anchors.anchor_counts(anchors.anchor_pairs(df)).collect()
    assert len(out) == 1 and out[0]["n_pages"] == 1


def test_anchor_pairs_per_microbatch_match_batch(spark, tmp_path, page_df):
    """Streaming form: anchor extraction + validation runs per
    admitted micro-batch via foreachBatch (the pairs are per-page,
    so per-batch output equals one batch pass over the union) — the
    ingest composition that feeds the rollup's maintained state."""
    src = str(tmp_path / "anchor_pages")
    page_df.filter(F.col("url") < "https://src2").coalesce(1).write.parquet(src)
    page_df.filter(F.col("url") >= "https://src2").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = []

    def on_batch(bdf, _bid):
        got.extend(map(tuple, anchors.anchor_pairs(bdf).collect()))

    q = (
        spark.readStream.schema("url string, html binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck_anchor"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(map(tuple, anchors.anchor_pairs(page_df).collect()))
    assert sorted(got) == want and len(want) > 0


def test_host_stats_rollup(spark):
    """Per-host rollup: page counts, text coverage, exact token sums,
    derived average; malformed urls land in the '' host group and
    hosts fold case-insensitively."""
    rows = [
        ("https://A.test/1", "one two three"),
        ("https://a.test/2", None),
        ("https://b.test/1", "  "),
        ("ftp://junk", "x y"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["host"]: tuple(r)[1:] for r in anchors.host_stats(df).collect()}
    assert got["a.test"] == (2, 1, 3, 3.0)
    assert got["b.test"] == (1, 1, 0, 0.0)
    assert got[""] == (1, 1, 2, 2.0)
