"""Domain mixture sampling: deterministic per-source downsampling to
hit a target token mixture (the Pile / Dolma source-mixing step that
turns a raw crawl into a training mix).

The reference engine has no counterpart — this is training-data
pipeline layer.  Two pieces:

  - mixture_rates: per-domain keep-rate from observed token mass vs
    target weights and a total token budget —
    rate_d = min(1, weight_d / sum(weights) * budget / tokens_d).
    One map-side-combined groupBy over the corpus (n_domains result
    rows) joined to the tiny weights dimension.
  - sample_mixture: keep a document iff a deterministic per-doc
    uniform draw falls under its domain's rate.  The draw is the
    first 8 hex chars of md5(doc_id ":" seed) compared as a STRING
    against the rate's 8-hex-char threshold — lowercase hex compares
    bytewise identically in Spark and DuckDB, so the oracle mirrors
    it verbatim, and the sample is reproducible/resumable (a re-run
    or a resumed crawl keeps exactly the same documents).

100 TB shape: the rates table is n_domains rows -> broadcast join;
the keep decision is one codegen'd expression per row; zero shuffles
beyond the n_domains-row stats aggregate.  Skew-free by construction
(no window, no per-domain sort — the draw is per-row)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import token_count

_HEX_SPAN = float(1 << 32)  # 16^8 draw space


def domain_stats(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(domain, n_docs, n_tokens) per domain — one partial-aggregated
    pass; the result is dimension-sized."""
    return docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("long")).alias("n_tokens"),
    )


def mixture_rates(
    stats: DataFrame,
    weights: DataFrame,
    token_budget: int | None = None,
    budget_frac: float | None = None,
) -> DataFrame:
    """(domain, rate) from per-domain stats and target weights.

    weights: (domain, weight) — relative target proportions, any
    positive scale (normalized here).  A domain with fewer tokens
    than its target share clamps at rate 1.0 (can't oversample
    without repetition — matching Dolma's single-epoch discipline).
    The budget is either an absolute token count (token_budget) or a
    fraction of the observed corpus (budget_frac — computed in-plan,
    no collect).  Both frames are dimension-sized; the normalizing
    totals ride cross joins of one aggregated row each."""
    if (token_budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of token_budget, budget_frac")
    total = weights.agg(F.sum("weight").alias("w_total"))
    joined = stats.join(weights, "domain").crossJoin(F.broadcast(total))
    if budget_frac is not None:
        tt = stats.agg(F.sum("n_tokens").alias("t_total"))
        joined = joined.crossJoin(F.broadcast(tt))
        budget = F.lit(float(budget_frac)) * F.col("t_total")
    else:
        budget = F.lit(float(token_budget))
    return joined.select(
        "domain",
        F.least(
            F.lit(1.0),
            (F.col("weight") / F.col("w_total"))
            * budget
            / F.col("n_tokens"),
        ).alias("rate"),
    )


def keep_expr(id_col: Column, rate: Column, seed: int = 0) -> Column:
    """Deterministic Bernoulli(rate) per id: 8-hex-char md5 prefix
    compared against the rate's hex threshold.  rate >= 1 keeps
    unconditionally (the threshold would be 9 hex chars and lpad
    truncation would corrupt the compare — guarded by the branch)."""
    draw = F.substring(
        F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))), 1, 8
    )
    thr = F.lpad(
        F.lower(F.hex(F.floor(rate * F.lit(_HEX_SPAN)).cast("long"))), 8, "0"
    )
    return (rate >= 1.0) | (draw < thr)


def sample_mixture(
    docs: DataFrame,
    rates: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Documents surviving the mixture draw; input columns pass
    through, plus the domain's `rate`.  Domains absent from the rates
    table are dropped entirely (rate 0) — the inner join IS the
    filter for them."""
    r = F.broadcast(rates.withColumnRenamed("domain", domain_col))
    return docs.join(r, domain_col).where(
        keep_expr(F.col(id_col), F.col("rate"), seed)
    )
