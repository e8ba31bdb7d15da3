"""Count-based bigram language model + per-document perplexity — the
CCNet perplexity filter (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data"): score every web
document with an LM trained on a trusted reference corpus and gate /
tier on the score (CCNet's head/middle/tail thirds). The reference
engine has no counterpart — training-data pipeline layer beside the
fastText-style classifier (ops/classifier): the classifier answers
"does this look like the reference SET", the LM answers "is this
fluent text under the reference DISTRIBUTION" — pipelines run both.

This is the count-based stand-in at KenLM's pipeline position (no
KenLM in the container); the Spark plan shape — reference-corpus
count tables -> logprob dimension joins over the crawl -> per-doc
aggregate — is identical for any n-gram order.

Model: interpolated bigram with add-one unigram smoothing,
    p(w2 | w1) = lam * pML(w2|w1) + (1 - lam) * (c(w2) + 1) / (N + V)
where pML = c(w1 w2) / c(w1) when the bigram is attested, else 0
(the smoothed unigram term carries unseen continuations, so every
probability is strictly positive and the log is total). Per doc:
avg_logp = mean ln p over its consecutive-token bigrams and
ppl = exp(-avg_logp); docs with < 2 tokens have no bigrams and score
NULL with n_bigrams = 0 (gate on n_bigrams, don't guess).

100 TB shape:
  - training touches only the REFERENCE corpus (small by definition
    — CCNet uses Wikipedia): two map-side-combined groupBys; c(w1)
    pre-folds into the bigram table at train time so scoring never
    joins for it.
  - scoring tokenizes the crawl ONCE into a projected column (the
    tokenize-once contract of ops/dsir), explodes consecutive pairs,
    and left-joins the two count tables. The unigram table is
    vocabulary-sized; the BIGRAM table is distinct-bigram-sized
    (~10^8-10^9 rows for a Wikipedia-scale reference) — so neither
    join is FORCED broadcast: AQE broadcasts what fits and falls
    back to a shuffle join on the key otherwise, where hot stopword
    bigrams are split by AQE skew-join. The crawl side contributes
    one exchange per join at most, plus its own per-doc aggregate.
  - the N/V normalizers ride a crossJoin of ONE aggregated row
    (the mixture_rates idiom), never a collect.

Tokens are the corpus-wide [a-z0-9]+ convention (textstats
._tokens_arr); every count is exact-long and every probability a
pure column expression, so the whole pass is DuckDB-mirrorable and
hash-checked end-to-end (the dsir convention, doubles at 4dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens_arr


def _bigram_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) consecutive-token pairs; tokenize-once projected
    column, bigrams via zip_with against the array's own shift (see
    ops/dsir._features_from_tokens for why ts must be an attribute)."""
    toks = docs.select(
        F.col(id_col), _tokens_arr(F.col(text_col)).alias("_ts")
    )
    n = F.size(F.col("_ts"))
    shifted = F.when(n >= 2, F.slice(F.col("_ts"), 2, n - 1)).otherwise(
        F.array().cast("array<string>")
    )
    pairs = F.array_compact(
        F.zip_with(
            F.col("_ts"),
            shifted,
            lambda a, b: F.when(
                b.isNotNull(), F.struct(a.alias("w1"), b.alias("w2"))
            ),
        )
    )
    return toks.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def train_bigram_lm(
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(unigrams, bigrams) count tables of the reference corpus:
    unigrams = (w, c); bigrams = (w1, w2, c12, c1) with the left
    context's unigram count pre-folded in (scoring needs c12/c1 only
    where the bigram is attested, so no third join at serve time)."""
    uni = (
        ref_docs.select(
            F.explode(_tokens_arr(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        _bigram_rows(ref_docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
    )
    return uni, bi


def lm_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    lam: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_logp, ppl) per document under the
    interpolated bigram model — the CCNet scoring pass. NULL-text
    and < 2-token docs report n_bigrams = 0 with NULL scores, and
    n_bigrams counts SCORED bigrams (count of non-NULL logprobs), so
    the "gate on n_bigrams" convention holds even against an empty
    reference table (every lp NULL -> n_bigrams 0, loudly wrong
    downstream instead of silently passing unscored docs). lam must
    be in [0, 1): lam = 1 disables the smoothing term and unseen
    bigrams would hit log(0)."""
    if not 0.0 <= lam < 1.0:
        raise ValueError("lam must be in [0, 1)")
    norm = unigrams.agg(
        F.sum("c").cast("double").alias("_N"),
        F.count(F.lit(1)).cast("double").alias("_V"),
    )
    pairs = _bigram_rows(docs, id_col, text_col)
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(
            unigrams.select(F.col("w").alias("w2"), F.col("c").alias("_c2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(norm))
        .select(
            F.col(id_col),
            F.log(
                F.lit(float(lam))
                * F.coalesce(F.col("c12") / F.col("c1"), F.lit(0.0))
                + F.lit(1.0 - float(lam))
                * (F.coalesce(F.col("_c2"), F.lit(0)) + F.lit(1.0))
                / (F.col("_N") + F.col("_V"))
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("_lp").cast("long").alias("n_bigrams"),
        F.avg("_lp").alias("avg_logp"),
    )
    base = docs.select(F.col(id_col)).distinct()
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.col("avg_logp"),
        F.exp(-F.col("avg_logp")).alias("ppl"),
    )


def ppl_tiers(
    scored: DataFrame,
    q1: float = 1.0 / 3.0,
    q2: float = 2.0 / 3.0,
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """CCNet's head/middle/tail labeling: ppl percentiles at q1 and
    q2 over the scored docs (one aggregate row, crossJoined) cut the
    corpus into tiers — 'head' (fluent, ppl <= q1 cut), 'middle',
    'tail' (> q2 cut, the drop candidates). Unscorable docs
    (n_bigrams = 0) label NULL. Two scalar cut points ride a
    broadcast; no window, no sort of the corpus.

    Default cuts use percentile_approx (Spark's mergeable
    bounded-memory sketch — ppl is distinct per doc, so EXACT
    percentile's aggregation buffer would hold every value and
    funnel a corpus-sized map through one final merge; the
    corpus_profile trade, same reasoning). exact=True switches to
    exact percentile for small/auditable corpora."""
    fn = "percentile" if exact else "percentile_approx"
    cuts = scored.filter(F.col("ppl").isNotNull()).agg(
        F.expr(f"{fn}(ppl, {q1!r})").alias("_q1"),
        F.expr(f"{fn}(ppl, {q2!r})").alias("_q2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "ppl",
        F.when(F.col("ppl").isNull(), F.lit(None).cast("string"))
        .when(F.col("ppl") <= F.col("_q1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("_q2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("tier"),
    )
