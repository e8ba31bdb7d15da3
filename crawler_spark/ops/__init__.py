"""Training-data pipeline operators (dedup, similarity, text stats,
PII scrubbing, sequence packing, multimodal plumbing) — the
large-scale corpus-processing layer that a crawl feeds. All hot paths
are JVM-side column expressions; the only Python is Arrow-batched
(multimodal decode plumbing)."""

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
    partition assignment (per-doc aggregations / bucket joins).

    The probe is METADATA-ONLY (input file list + optimizer size
    stats): converting to `.rdd` to read getNumPartitions() would
    eagerly execute every upstream AQE query stage when the caller
    passes a plan containing an exchange — surprise jobs whose work
    then re-runs at the real action. Split count is estimated as
    max(#files, ceil(bytes / maxPartitionBytes)); non-file plans
    (in-memory relations) are left untouched — they already inherit
    the session's parallelism.

    Known limits, both degrading to the pre-helper behavior (no
    repartition), never to an added shuffle: a plan whose ACTUAL
    parallelism is a coalesced post-shuffle stage is judged by its
    leaf files (pass the bare scan, which is what every caller here
    does), and a deliberately single-partition in-memory frame
    (coalesce(1), checkpoint) is not re-spread."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        if not files:
            return df
        # py4j maps scala BigInt to a python int already
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        # Spark's own conf parser — the exact semantics applied to
        # spark.sql.files.maxPartitionBytes, no hand-rolled duplicate
        max_split = max(
            int(
                spark._jvm.org.apache.spark.network.util.JavaUtils
                .byteStringAsBytes(
                    spark.conf.get(
                        "spark.sql.files.maxPartitionBytes", "134217728"
                    )
                )
            ),
            1,
        )
        est = max(len(files), -(-size // max_split) if size > 0 else 0)
    except Exception:
        return df
    return df.repartition(target) if est < target else df
