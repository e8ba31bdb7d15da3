"""Training-shard assignment + writer (ops/sampling.shard_assign /
write_shards): determinism under re-partitioning, split stability,
shard balance, and the written layout's within-file order."""

import glob

import pytest
from pyspark.sql import functions as F

from crawler_spark.ops import sampling


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("text"),
    )


def test_shard_assign_deterministic_across_partitioning(spark, docs):
    a = sampling.shard_assign(docs, 8, seed=3, val_frac=0.1)
    b = sampling.shard_assign(
        docs.repartition(13, "text"), 8, seed=3, val_frac=0.1
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # pure function of id: a different seed moves assignments
    c = sorted(map(tuple, sampling.shard_assign(docs, 8, seed=4, val_frac=0.1).collect()))
    assert ra != c


def test_shard_balance_and_split_rate(spark, docs):
    out = sampling.shard_assign(docs, 8, seed=0, val_frac=0.2).cache()
    sizes = {r["shard"]: r["count"] for r in out.groupBy("shard").count().collect()}
    assert set(sizes) == set(range(8))
    # md5 uniformity: no shard is off the 62.5-row mean by >3x sqrt
    assert all(30 <= n <= 100 for n in sizes.values())
    n_val = out.filter(F.col("split") == "val").count()
    assert 60 <= n_val <= 140  # 100 expected
    # val docs still carry shard/pos (the eval set is sharded too)
    assert out.filter(F.col("split") == "val").filter(
        F.col("pos").isNull() | F.col("shard").isNull()
    ).count() == 0
    out.unpersist()


def test_shard_assign_edge_fracs(spark, docs):
    assert (
        sampling.shard_assign(docs, 4, val_frac=0.0)
        .filter(F.col("split") == "val").count() == 0
    )
    assert (
        sampling.shard_assign(docs, 4, val_frac=1.0)
        .filter(F.col("split") == "train").count() == 0
    )
    with pytest.raises(ValueError):
        sampling.shard_assign(docs, 0)


def test_write_shards_layout_and_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    sampling.write_shards(docs, path, n_shards=4, seed=1, val_frac=0.25)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(r[0] for r in back.select("doc_id").collect()) == list(range(500))
    dirs = glob.glob(f"{path}/split=*/shard=*")
    assert len(dirs) == 8  # 2 splits x 4 shards at this size
    # within every physical file, rows are in (pos, doc_id) order —
    # a sequential reader of the shard's files gets the global shuffle
    expect = sampling.shard_assign(docs, 4, seed=1, val_frac=0.25)
    got = spark.read.parquet(path).withColumn(
        "file", F.input_file_name()
    )
    for (f,), rows in (
        got.select("file", "pos", "doc_id")
        .toPandas()
        .groupby(["file"])
    ):
        ordered = list(map(tuple, rows[["pos", "doc_id"]].itertuples(index=False)))
        assert ordered == sorted(ordered)
    # the written assignment equals shard_assign exactly
    w = got.select("doc_id", "split", "shard", "pos")
    e = expect.select("doc_id", "split", "shard", "pos")
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, e.collect()))
