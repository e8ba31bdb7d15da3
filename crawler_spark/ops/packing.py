"""Sequence packing — the concat-and-chunk manifest that turns a
filtered/deduped document corpus into fixed token-budget training
sequences (the GPT-style packing step at the end of every
training-data pipeline: concatenate documents in a deterministic
order into one token stream, cut every `budget` tokens, let
documents span cuts).

The hard part at scale is the global running offset: a naive
`sum() over (order by doc_id)` window has no partition key, so Spark
plans it as a SINGLE task pulling the whole corpus — the classic
100 TB killer. Here the prefix sum is two-phase instead (the
textbook parallel scan): deterministic id-range buckets, per-bucket
token totals (one partial-aggregated shuffle of B rows), a
driver-side cumulative sum over the B bucket totals (delta-sized
collect), and a within-bucket window that runs one task per bucket —
`n_buckets` is the parallelism knob. Bucketing is a pure function of
the id (never repartitionByRange), so both subtrees see identical
bucket assignment by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    release: list | None = None,
) -> DataFrame:
    """(seq_id, doc_id, doc_from, doc_to, seq_pos): the packing
    manifest a training loader reads. Documents are concatenated in
    ascending id order into one whitespace-token stream and cut into
    sequences of exactly `budget` tokens; a document crossing a cut
    contributes one slice row per sequence it touches:

      - doc_from / doc_to   the doc-local token interval [from, to)
                            this sequence takes
      - seq_pos             where in the sequence the slice starts

    Zero-token documents contribute nothing and emit no rows. The
    final sequence is a remainder (may be short) — training loaders
    drop or pad it; the manifest reports it like any other.

    Scale shape: one tiny id-bounds agg + one B-row bucket-total
    collect (driver cumsum, broadcast back as a map literal; use a
    broadcast join instead if n_buckets is ever huge), then a
    per-bucket window cumsum (B parallel tasks) and a per-doc explode
    bounded by ceil(n/budget)+1 rows. No global-order window
    anywhere.

    Materialization contract (the repo-wide persist-and-release
    shape): the (id, n) counts frame feeds the bounds agg, the bucket
    totals, AND the final manifest plan — three text scans when lazy,
    and AQE never reuses an exchange across subtrees here.
    `release=<list>` persists the two-longs-per-doc counts frame (the
    bounds agg materializes it; totals and the manifest read the
    cache — ONE pass over the text) and appends the persisted frame
    for the caller to unpersist after its downstream action;
    `release=None` stays lazy (driver-owned contract queries)."""
    n = token_count(F.col(text_col)).cast("long")
    counts = docs.select(
        F.col(id_col).cast("long").alias(id_col), n.alias("_n")
    ).filter(F.col("_n") > 0)
    if release is not None:
        counts = counts.persist()
        release.append(counts)

    bounds = counts.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds["lo"] is None:  # empty corpus
        return counts.select(
            F.col(id_col),
            F.col("_n").alias("seq_id"),
            F.col("_n").alias("doc_from"),
            F.col("_n").alias("doc_to"),
            F.col("_n").alias("seq_pos"),
        ).select("seq_id", id_col, "doc_from", "doc_to", "seq_pos")
    # order-preserving range bucketing that survives FULL-range
    # int64 ids (hash-minted doc ids are arbitrary longs, negatives
    # included): width is exact driver-side Python math, the per-row
    # map runs in double — rounding is monotone, so bucket(id) stays
    # non-decreasing in id, which is all packing order needs; the
    # greatest/least clamps absorb the float edges of the extremes
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)
    bkt = (
        F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(id_col).cast("double") - float(lo)) / float(width)
                ).cast("int"),
            ),
        )
    ).cast("int")
    counts = counts.withColumn("_bkt", bkt)

    totals = {
        r["_bkt"]: r["t"]
        for r in counts.groupBy("_bkt").agg(F.sum("_n").alias("t")).collect()
    }
    off, acc = {}, 0
    for b in range(n_buckets):
        off[b] = acc
        acc += totals.get(b, 0)
    off_map = F.create_map(
        *[x for b in range(n_buckets) for x in (F.lit(b), F.lit(off[b]))]
    )

    w = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    st = (
        F.element_at(off_map, F.col("_bkt"))
        + F.coalesce(F.sum("_n").over(w), F.lit(0))
    ).cast("long")
    # integer `div`, not floor(double /): at stream offsets where
    # st/budget's double ulp nears 1/budget (st ~ 2^53/2048) the
    # floored quotient could land one sequence off — div is exact for
    # any int64 offset
    spans = counts.select(
        F.col(id_col), F.col("_n"), st.alias("_st")
    ).selectExpr(
        "*",
        f"_st div {int(budget)} as _s_first",
        f"(_st + _n - 1) div {int(budget)} as _s_last",
    )
    out = spans.select(
        F.col(id_col),
        F.col("_n"),
        F.col("_st"),
        F.explode(F.sequence("_s_first", "_s_last")).alias("seq_id"),
    )
    return out.select(
        F.col("seq_id"),
        F.col(id_col),
        F.greatest(
            F.lit(0).cast("long"), F.col("seq_id") * budget - F.col("_st")
        ).alias("doc_from"),
        F.least(
            F.col("_n"), (F.col("seq_id") + 1) * budget - F.col("_st")
        ).alias("doc_to"),
        F.greatest(
            F.col("_st") - F.col("seq_id") * budget, F.lit(0).cast("long")
        ).alias("seq_pos"),
    )
