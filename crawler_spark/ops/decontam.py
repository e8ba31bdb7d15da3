"""Eval-set decontamination: drop training documents that share any
word n-gram with a benchmark/eval corpus (the GPT-3 appendix-C /
Dolma decontamination pass; Brown et al. 2020 used 13-grams).

The reference engine has no counterpart — this belongs to the
training-data pipeline layer beside ops/dedup's incremental family,
and it follows the same consult-never-rebuild shape: the eval side is
reduced ONCE to a distinct n-gram key table, and every training batch
is checked against that stored table.

100 TB shape:
  - the eval-gram table is tiny relative to the corpus (benchmark
    suites are at most ~10^7-10^8 grams) -> broadcast hash join; the
    training side is NEVER shuffled.  If an eval set ever outgrew the
    broadcast threshold, both sides bucket by gram key — the join
    stays key-local either way.
  - gram construction is one higher-order array expression per doc
    (tokenize once, hash each window once, array_distinct) — zero
    shuffle, whole-stage codegen; the only explode is narrow and is
    immediately reduced by the broadcast semi-join, so the post-join
    row count is delta-sized (contaminated grams only).
  - per-doc hit counts are a map-side-combined groupBy over that
    delta-sized stream.
Gram keys are md5 hex of the space-joined window (mirrored exactly by
the DuckDB oracle); a production deployment would swap xxhash64 for
md5 to shrink the key bytes — the join shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens_arr


def _ngram_keys_from_tokens(toks: Column, n: int) -> Column:
    """Distinct md5 keys of all word n-grams from a token-array
    column.  `toks` MUST be a projected attribute: the window slice
    inside the lambda references the outer array, and a non-attribute
    outer reference re-evaluates its whole expression per element
    (higher-order functions are interpreted — no subexpression
    reuse), turning tokenization O(tokens) into O(tokens²) per doc.
    Docs with fewer than n tokens yield an empty array."""
    cnt = F.size(toks) - (n - 1)
    # sequence(1, 0) would generate a DESCENDING [1, 0] in Spark —
    # guard short docs explicitly.
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))
    )


def ngram_keys(text: Column, n: int) -> Column:
    """Distinct md5 keys of all word n-grams of `text` (tokens
    lowercased, split on non-alnum — the corpus-wide convention of
    ops/textstats).  Thin text-level wrapper; hot paths project the
    token array first (see _ngram_keys_from_tokens)."""
    return _ngram_keys_from_tokens(_tokens_arr(text), n)


def eval_ngrams(
    eval_docs: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """The stored consult table: distinct n-gram keys of the eval
    corpus, one column `g`.  Built once per benchmark release, reused
    for every training batch."""
    return (
        eval_docs.select(_tokens_arr(F.col(text_col)).alias("_ts"))
        .select(F.explode(_ngram_keys_from_tokens(F.col("_ts"), n)).alias("g"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    eval_grams: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination verdict against the eval-gram
    table: (id_col, n_hits, contaminated), one row per input doc,
    n_hits = number of DISTINCT shared n-grams (long, 0 for clean).

    The training side explodes its per-doc distinct gram keys
    (narrow), inner-joins the broadcast eval table — everything not
    contaminated dies map-side — and the surviving delta-sized stream
    aggregates per doc with map-side combine."""
    ev = eval_grams.select("g")
    if broadcast_eval:
        ev = F.broadcast(ev)
    grams = docs.select(
        F.col(id_col), _tokens_arr(F.col(text_col)).alias("_ts")
    ).select(
        F.col(id_col),
        F.explode(_ngram_keys_from_tokens(F.col("_ts"), n)).alias("g"),
    )
    hits = grams.join(ev, "g").groupBy(id_col).agg(
        F.count("*").alias("n_hits")
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            F.coalesce(F.col("n_hits") > 0, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_grams: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training docs with every contaminated document removed —
    all input columns pass through unchanged.  The removal is a
    left_anti against the delta-sized contaminated-id set (never a
    full-width shuffle of the corpus: AQE broadcasts the id set)."""
    verdict = contamination(
        docs, eval_grams, n, id_col, text_col, broadcast_eval
    )
    bad = verdict.filter(F.col("contaminated")).select(id_col)
    return docs.join(bad, id_col, "left_anti")
