"""Similarity search over embedding columns (array<float>).

 - `cosine_topk`: brute-force cosine top-k — the correctness
   baseline. The score is a pure column expression
   (zip_with + aggregate, JVM-side, no Python); top-k is a ranking
   window per query.
 - `cosine_topk_lsh`: the scale path — random-hyperplane (sign) LSH:
   each vector gets a B-bit bucket code from B fixed pseudo-random
   hyperplanes (counter-RNG, so codes are deterministic and
   partition-invariant); queries probe only their own bucket (+
   optional 1-bit-flip neighbors). Turns the O(N·Q) cross join into
   per-bucket joins — the same bucketing discipline the frontier uses
   for hosts.
 - `ivf_topk`: inverted-file variant — corpus assigned to the nearest
   of C sampled centroids, queries scan their `nprobe` nearest cells.

Scores are rounded to 6 decimals and tie-broken by id so results are
stable across engines/partitionings (and DuckDB-oracle-comparable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .. import rng


def cosine_expr(a: Column, b: Column) -> Column:
    """cos(a,b) as a column expr over two array<float/double> columns,
    computed in double, rounded to 6 (cross-engine stability)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    return F.round(dot / (na * nb), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos, rn) — exact top-k neighbors per query
    (excluding the query itself), rn = 1..k by (cos DESC, vec_id)."""
    from . import fan_out

    # queries is the stream side of the nested-loop join — a single-
    # split query file otherwise evaluates every cosine on one task
    q = fan_out(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc(id_col)
    )
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "cos", "rn")
    )


# ---- sign-LSH bucketing (scale path) ----


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from the counter RNG
    (gaussian via Box-Muller over two uniform streams)."""
    idx = np.arange(dim * n_bits)
    u1 = rng.u01(seed, idx, 61)
    u2 = rng.u01(seed, idx, 62)
    g = np.sqrt(-2.0 * np.log(np.clip(u1, 1e-12, 1.0))) * np.cos(2 * np.pi * u2)
    return g.reshape(n_bits, dim)


def add_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach the sign-LSH bucket code (0..2^n_bits-1) as a column.

    One Arrow-batched pandas UDF doing a single (batch x dim) @
    (dim x n_bits) matmul against the deterministic hyperplane matrix.
    The previous inlined column-expression form expanded to
    dim x n_bits codegen terms — at real embedding dims (768 x 8+)
    that blows past the codegen budget and falls back to interpreted
    evaluation (VERDICT r1); the matmul is one projection regardless
    of dim."""
    from . import fan_out

    df = fan_out(df)  # matmul UDF: spread single-split scans
    planes_t = _hyperplanes(dim, n_bits, seed).T  # (dim, n_bits)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(LongType())
    def _code(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=np.int64)
        mat = np.asarray(np.stack(vec.to_numpy()), dtype=np.float64)
        proj = mat @ planes_t
        return pd.Series((proj > 0).astype(np.int64) @ weights)

    return df.withColumn(out_col, _code(F.col(vec_col)))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: join query and corpus on the LSH bucket
    (optionally probing all 1-bit-flip neighbor buckets too), then
    exact cosine within the bucket. Recall rises with multiprobe and
    falls with n_bits; the cross-join cost falls ~2^n_bits-fold."""
    c = add_lsh_bucket(
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv")),
        dim, n_bits, seed, "cv",
    )
    q = add_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        dim, n_bits, seed, "qv",
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(2**b)).cast("long")
                for b in range(n_bits)
            ],
        )
        q = q.select(
            "query_id", "qv", F.explode(probes).alias("bucket")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "cos", "rn")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    n_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means centroids for the IVF index: deterministic
    hash-sampled init, then `n_iters` Lloyd rounds. Each round is ONE
    map-side pass (mapInPandas computes per-partition per-cell partial
    sums of the normalized vectors against the broadcast centroid
    matrix); the driver reduces <= partitions x n_cells partial rows —
    never the vectors. Scale cost per round = one corpus scan, zero
    shuffles. Returns (cell, centroid: array<double>)."""
    import pandas as pd

    spark = corpus.sparkSession
    init = (
        corpus.select(F.col(id_col), F.col(vec_col))
        # id tie-break: hash-only order + limit would let a 64-bit
        # collision at the cutoff pick partition-dependent centroids
        .orderBy(F.xxhash64(F.lit(seed), F.col(id_col)), F.col(id_col))
        .limit(n_cells)
        .orderBy(F.col(id_col))
        .collect()
    )
    cents = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in init]
    )
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    from . import fan_out

    corpus_v = fan_out(corpus.select(F.col(vec_col)))
    part_schema = "cell int, n long, vsum array<double>"
    for _ in range(max(n_iters, 0)):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches):
            c = bc.value
            acc_n = np.zeros(len(c), dtype=np.int64)
            acc_v = np.zeros_like(c)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.asarray(
                    np.stack(pdf[vec_col].to_numpy()), dtype=np.float64
                )
                mat /= np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
                cell = np.argmax(mat @ c.T, axis=1)
                for ci in np.unique(cell):
                    m = cell == ci
                    acc_n[ci] += int(m.sum())
                    acc_v[ci] += mat[m].sum(axis=0)
            yield pd.DataFrame(
                {
                    "cell": np.arange(len(c), dtype=np.int32),
                    "n": acc_n,
                    "vsum": list(acc_v),
                }
            )

        rows = (
            corpus_v.mapInPandas(partials, schema=part_schema)
            .collect()
        )
        # each round broadcasts a fresh centroid matrix — release it,
        # or n_iters x (n_cells x dim) matrices stay pinned in the
        # block manager for the session lifetime
        bc.destroy()
        new_n = np.zeros(len(cents), dtype=np.int64)
        new_v = np.zeros_like(cents)
        for r in sorted(rows, key=lambda r: r["cell"]):
            new_n[r["cell"]] += int(r["n"])
            new_v[r["cell"]] += np.asarray(r["vsum"], dtype=np.float64)
        nonempty = new_n > 0
        cents[nonempty] = new_v[nonempty] / np.maximum(
            np.linalg.norm(new_v[nonempty], axis=1, keepdims=True), 1e-12
        )
    return spark.createDataFrame(
        [(i + 1, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, vec): every vector assigned to its nearest centroid
    — ONE Arrow matmul per partition against the broadcast (cell,
    centroid) matrix, zero shuffles (the same map-side shape as
    kmeans_centroids' partials). The previous inline form in ivf_topk
    was a |corpus| x n_cells crossJoin + full-corpus row_number
    window that exploded and SHUFFLED the whole store on every call.
    Tie semantics mirror that retired window (cos rounded to 6dp
    DESC, cell ASC): round before argmax; argmax returns the first —
    smallest cell — maximum. Shared by ivf_topk (probe serving) and
    dedup.semantic_dedup (within-cell pair generation)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = corpus.sparkSession
    cent_rows = centroids.orderBy("cell").collect()
    cell_ids = np.array([int(r["cell"]) for r in cent_rows], dtype=np.int32)
    cmat = np.stack(
        [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
    )
    cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    bc_cent = spark.sparkContext.broadcast((cell_ids, cmat))
    src = corpus.select(F.col(id_col), F.col(vec_col))
    a_schema = StructType(
        [src.schema[id_col], StructField("cell", IntegerType()),
         src.schema[vec_col]]
    )

    def assign(batches):
        cells_, cm = bc_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(
                np.stack(pdf[vec_col].to_numpy()), dtype=np.float64
            )
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = np.round(mat @ cm.T, 6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cells_[np.argmax(sims, axis=1)],
                    vec_col: pdf[vec_col],
                }
            )

    return src.mapInPandas(assign, schema=a_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Inverted-file ANN: spherical-k-means centroids (hash-sample
    init + Lloyd rounds, `kmeans_centroids`); every vector indexes to
    its nearest centroid; queries scan their `nprobe` nearest cells.
    One small broadcast (the centroids) + per-cell joins.

    `centroids` reuses a trained (cell, centroid) table — train ONCE
    with kmeans_centroids, persist via the catalog, and serve every
    later query batch without re-running Lloyd rounds over the corpus
    (at 100 TB the training scan dominates a query batch by orders of
    magnitude; the index is the durable artifact, exactly like a
    faiss IVF index file)."""
    cent = (
        centroids
        if centroids is not None
        else kmeans_centroids(
            corpus, n_cells, n_iters=n_iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    )
    assigned = assign_cells(corpus, cent, id_col, vec_col).select(
        F.col(id_col), "cell", F.col(vec_col).alias("cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", cosine_expr(F.col("qv"), F.col("centroid")))
        .withColumn("rc", F.row_number().over(probe_w))
        .filter(F.col("rc") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "cos", "rn")
    )
