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


def _md5_long(s: Column, n_hex: int = 8) -> Column:
    """First n_hex hex chars of md5(s) as a non-negative long — the
    repo's standard DuckDB-mirrorable hash primitive (oracle form:
    ('0x' || substring(md5(s), 1, n))::bigint)."""
    return F.conv(F.substring(F.md5(s), 1, n_hex), 16, 10).cast("long")


def shard_assign(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    val_frac: float = 0.0,
) -> DataFrame:
    """Deterministic training-shard assignment — the writer step that
    turns a filtered corpus into a fixed number of globally-shuffled
    shards plus a stable held-out split (the T5/Dolma shard-writing
    discipline: shard membership and within-shard order must be pure
    functions of the document id, so a resumed or re-run pipeline
    writes byte-identical shards and the eval split never leaks into
    training across re-runs).

    Adds three columns, each an independent md5 stream over
    (id ':' seed ':' role):
      - split: 'val' with probability val_frac (the same 8-hex-char
        string compare as keep_expr — exactly mirrorable in DuckDB),
        else 'train'; val docs still get shard/pos so the eval set
        can be sharded too.
      - shard: md5_32 % n_shards.
      - pos: 60-bit md5 order key — sorting a shard by (pos, id) IS
        the global shuffle (hash order is independent of crawl/source
        order, so each shard is an unbiased interleave of the corpus;
        id breaks the ~2^-60-rate pos ties deterministically).

    100 TB shape: three codegen'd expressions per row, zero shuffles
    here; the one unavoidable full shuffle is the write itself
    (write_shards repartitions on the shard column — that shuffle IS
    the product). Skew-free by construction: md5 spreads ids uniformly
    regardless of how hot any host/domain is."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    sid = F.col(id_col).cast("string")
    draw = F.substring(
        F.md5(F.concat_ws(":", sid, F.lit(str(seed)), F.lit("split"))), 1, 8
    )
    thr = F.lpad(
        F.lower(
            F.hex(F.floor(F.lit(float(val_frac)) * F.lit(_HEX_SPAN)).cast("long"))
        ),
        8,
        "0",
    )
    split = F.when(
        (F.lit(float(val_frac)) < 1.0) & (draw >= thr), F.lit("train")
    ).otherwise(F.lit("val"))
    shard = (
        _md5_long(F.concat_ws(":", sid, F.lit(str(seed)), F.lit("shard")))
        % n_shards
    )
    pos = _md5_long(
        F.concat_ws(":", sid, F.lit(str(seed)), F.lit("pos")), n_hex=15
    )
    return docs.select(
        "*",
        split.alias("split"),
        shard.cast("int").alias("shard"),
        pos.alias("pos"),
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    val_frac: float = 0.0,
) -> None:
    """Materialize the shard layout: one directory per (split, shard),
    rows within each shard's files in (pos, id) order — a training
    loader streams shard directories sequentially and gets the global
    shuffle for free. The repartition on the shard columns is the one
    full shuffle (it IS the product); the within-partition sort spills
    if a shard exceeds memory, it never funnels shards into one task."""
    out = shard_assign(docs, n_shards, seed, id_col, val_frac)
    # one partition per (split, shard) GROUP, not per shard: with a
    # val split there are 2*n_shards groups, and hashing them into
    # n_shards partitions would pigeonhole >= 2 whole shards into
    # some tasks (halving write parallelism and stacking sort spill)
    n_groups = n_shards * (2 if 0.0 < val_frac < 1.0 else 1)
    (
        out.repartition(n_groups, F.col("split"), F.col("shard"))
        .sortWithinPartitions("split", "shard", "pos", id_col)
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(path)
    )


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
