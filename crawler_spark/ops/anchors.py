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

from ..functions.extract import extract_anchors


def anchor_pairs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per distinct
    (target, anchor-text) pair on each page (per-page dedup happens
    inside the extraction UDF, so a nav bar repeating one link 40
    times still counts the page once)."""
    return (
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
