"""Training-data pipeline operators (dedup, similarity, text stats,
multimodal plumbing) — the large-scale corpus-processing layer that a
crawl feeds. All hot paths are JVM-side column expressions; the only
Python is Arrow-batched (multimodal decode plumbing)."""

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the session's parallelism.

    A small corpus table is one parquet file = one scan split, which
    pins the CPU-heavy work fed by it (shingle/md5/matmul projections)
    to a single task while the other cores idle. At 100 TB the scan
    already yields >= parallelism splits and this is a no-op — no
    shuffle is ever added on the scale path. Round-robin rather than
    keyed: a keyed repartition on the join/group column can be elided
    by Catalyst, and every caller's result is invariant to row-to-
    partition assignment (per-doc aggregations / bucket joins)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < target else df
