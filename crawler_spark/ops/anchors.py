"""Anchor-text aggregation: what the web says ABOUT a url.

The classic inlink-anchor signal (Brin & Page 1998 §2.2 — anchor
text is indexed with the page it points AT; later the standard
weak-label / retrieval-pair source for web-scale training sets,
e.g. MS MARCO-style anchor-query corpora). The reference engine
stops at the link edge (ParsePubkeys keeps only the target id,
pkg/crawler/process.go:227-255); this op keeps the human-readable
label on each edge and rolls it up per target.

Pipeline shape:

  pages --extract_anchors--> (src_url, dst_url, anchor) edge rows
        --anchor_text_topk--> per-dst top-k anchors by page count

100 TB shape: extraction is one Arrow-vectorized pass over the html
column (the same UDF family as extract_links — no per-row Python at
the plan level); the rollup is a map-side-combined groupBy on
(dst, anchor) followed by a per-dst row_number window whose filter
Spark rewrites to WindowGroupLimit with a PARTIAL pass below the
dst exchange — a hub url with 10^9 inlinks contributes at most k
rows per map partition to the shuffle-side sort, so hot targets
(the exact skew a web graph has) never funnel their full anchor
set through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extract import canonical_url, extract_anchors, is_valid_url


def anchor_pairs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    validate: bool = True,
) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per distinct
    (target, anchor-text) pair on each page (per-page dedup happens
    inside the extraction UDF, so a nav bar repeating one link 40
    times still counts the page once).

    `validate` (default True) keeps only absolute http(s) targets
    (is_valid_url — the same gate link edges pass before minting)
    and folds each through canonical_url, so the per-target rollup
    aggregates on canonical keys. Without it, relative hrefs like
    '/about' from DIFFERENT sites would collide under one bogus
    target, and case/query-order variants of one real target would
    split its counts. Pass validate=False only for raw-edge
    debugging."""
    raw = (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                extract_anchors(F.col(html_col), F.col(url_col))
            ).alias("a"),
        )
        .select(
            "src_url",
            F.col("a.href").alias("dst_url"),
            F.col("a.anchor").alias("anchor"),
        )
    )
    if not validate:
        return raw
    return (
        # canonicalize BEFORE the validity gate (unlike the frontier,
        # which by design rejects 'HTTP://x' raw): the rollup wants
        # one key per real target, and canonical_url lowercases the
        # scheme/host that is_valid_url matches case-sensitively
        raw.select(
            "src_url",
            canonical_url(F.col("dst_url")).alias("dst_url"),
            "anchor",
        )
        .filter(is_valid_url(F.col("dst_url")))
        # two raw variants of one target on one page fold to one
        # canonical row — re-dedup so count(*) in anchor_counts
        # stays exactly the page count
        .distinct()
    )


def anchor_counts(pairs: DataFrame) -> DataFrame:
    """(dst_url, anchor, n_pages): how many distinct pages label dst
    with this exact text. One map-side-combined aggregate — pairs are
    already distinct per (src, dst, anchor), so count(*) IS the page
    count; no count-distinct shuffle."""
    return pairs.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n_pages")
    )


def anchor_text_topk(pairs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k anchor texts per target url, ordered (n_pages desc,
    anchor asc) for a total order. Returns (dst_url, anchor, n_pages,
    rn). The rn<=k filter over row_number plans as a native
    WindowGroupLimit with a Partial pass below the exchange (gated in
    tests/test_plans.py) — the skew-safety argument in the module
    docstring depends on it."""
    w = Window.partitionBy("dst_url").orderBy(
        F.col("n_pages").desc(), F.col("anchor").asc()
    )
    return (
        anchor_counts(pairs)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def host_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(host, n_pages, n_with_text, total_tokens, avg_tokens): the
    per-host crawl-ops rollup — the table politeness tuning, domain
    blocklist review, and mixture weighting read (ops/sampling's
    domain_stats keyed by the url's HOST instead of a source label,
    for corpora that carry urls rather than curated source tags).

    One map-side-combined groupBy(host); the result is
    host-dimension-sized. A hot domain concentrates its rows into
    one GROUP but never one task beyond the partial-agg merge (the
    same argument as every count rollup here); avg_tokens is derived
    from the two exact sums, never a second pass."""
    from ..functions.extract import url_host
    from .textstats import token_count

    t = F.col(text_col)
    return (
        pages.groupBy(F.lower(url_host(F.col(url_col))).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(t.isNotNull().cast("long")).alias("n_with_text"),
            F.sum(
                F.coalesce(token_count(t), F.lit(0)).cast("long")
            ).alias("total_tokens"),
        )
        .select(
            "host",
            "n_pages",
            "n_with_text",
            "total_tokens",
            F.round(
                F.col("total_tokens")
                / F.greatest(F.col("n_with_text"), F.lit(1)),
                6,
            ).alias("avg_tokens"),
        )
    )
