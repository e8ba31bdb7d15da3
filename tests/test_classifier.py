"""fastText-style quality classifier (ops/classifier): distributed
loss/gradient vs an independent numpy recomputation, L-BFGS training
on planted separable corpora, scoring completeness (NULL/empty text
scores at the bias), and the broadcast-join plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.ops import classifier


def _dense(spark_rows, n_docs_ids, n_buckets):
    """Dense (N, B) matrix + row index from collected feature rows."""
    ids = sorted(n_docs_ids)
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), n_buckets))
    for r in spark_rows:
        X[idx[r["doc_id"]], int(r["bucket"])] = r["x"]
    return X, idx


def _np_fg(X, y, theta, l2):
    w, b = theta[:-1], theta[-1]
    m = X @ w + b
    z = (2 * y - 1) * m
    loss = float(
        np.mean(np.maximum(0, -z) + np.log1p(np.exp(-np.abs(z))))
    ) + 0.5 * l2 * float(w @ w)
    err = 1.0 / (1.0 + np.exp(-m)) - y
    g = np.concatenate([X.T @ err / len(y) + l2 * w, [err.mean()]])
    return loss, g


GOOD = "the quick brown fox jumps over the lazy dog near the river bank"
BAD = "buy cheap pills now click here free casino bonus win win win"


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        src = GOOD if i % 2 == 0 else BAD
        words = src.split()
        # deterministic per-doc variation so docs aren't identical
        rot = words[i % len(words):] + words[: i % len(words)]
        rows.append((i, " ".join(rot + [f"tok{i % 7}"]), i % 2 == 0))
    return spark.createDataFrame(
        [(d, t, 1 if g else 0) for d, t, g in rows],
        "doc_id long, text string, label int",
    )


def test_distributed_grad_matches_numpy(spark):
    """The distributed (loss, grad) evaluation equals an independent
    numpy recomputation on the collected dense matrix, at two
    different parameter points (zero and a deterministic non-zero)."""
    B = 64
    docs = _corpus(spark, n=40)
    feats = classifier.doc_feature_vectors(docs, B).repartition("doc_id")
    labels = docs.select(
        "doc_id", F.col("label").cast("double").alias("_y")
    )
    rows = feats.collect()
    X, _ = _dense(rows, [r.doc_id for r in docs.collect()], B)
    y = np.array([float(i % 2 == 0) for i in range(40)])
    fg = classifier._eval_factory(feats, labels, B, l2=1e-3,
                                  n_docs=40, id_col="doc_id")
    rng_theta = np.array(
        [math.sin(i * 1.7) * 0.3 for i in range(B + 1)]
    )
    for theta in (np.zeros(B + 1), rng_theta):
        f_s, g_s = fg(theta)
        f_n, g_n = _np_fg(X, y, theta, 1e-3)
        assert abs(f_s - f_n) < 1e-9, (f_s, f_n)
        np.testing.assert_allclose(g_s, g_n, rtol=1e-7, atol=1e-10)


def test_train_separates_planted_quality(spark):
    """Training on the planted good/spam corpora reaches near-perfect
    train accuracy, the loss decreases, and unseen docs from each
    vocabulary land on the right side of 0.5."""
    B = 256
    docs = _corpus(spark, n=120)
    model = classifier.train_quality_classifier(
        docs, n_buckets=B, l2=1e-5, max_iter=40
    )
    assert model["n_docs"] == 120
    assert model["losses"][-1] < model["losses"][0]
    scored = classifier.classifier_scores(
        docs, model["weights"], model["bias"], B
    ).join(docs.select("doc_id", "label"), "doc_id")
    acc = scored.select(
        F.avg(
            ((F.col("score") > 0.5).cast("int") == F.col("label"))
            .cast("double")
        ).alias("a")
    ).first()["a"]
    assert acc >= 0.97, acc
    held = spark.createDataFrame(
        [(1000, GOOD + " extra"), (1001, BAD + " extra")],
        "doc_id long, text string",
    )
    s = {
        r.doc_id: r.score
        for r in classifier.classifier_scores(
            held, model["weights"], model["bias"], B
        ).collect()
    }
    assert s[1000] > 0.5 > s[1001], s


def test_scores_cover_all_docs_and_featureless_get_bias(spark):
    """Every input doc gets a row; NULL and empty text logit == bias;
    quality_filter keeps original columns and respects threshold."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, None), (2, ""), (3, "alpha beta")],
        "doc_id long, text string",
    )
    w = classifier.synthetic_weights_df(spark, 32)
    out = classifier.classifier_scores(docs, w, bias=0.25, n_buckets=32)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {0, 1, 2, 3}
    for d in (1, 2):
        assert abs(got[d].logit - 0.25) < 1e-12
        assert abs(got[d].score - 1 / (1 + math.exp(-0.25))) < 1e-12
    kept = classifier.quality_filter(
        docs, w, bias=0.25, n_buckets=32, threshold=0.0
    )
    assert kept.count() == 4 and set(kept.columns) == {
        "doc_id", "text", "score"
    }
    labeled = docs.withColumn("label", F.lit(1))
    with pytest.raises(ValueError):
        classifier.train_quality_classifier(labeled.limit(0), n_buckets=8)
    with pytest.raises(ValueError):
        classifier.train_quality_classifier(labeled, n_buckets=1)


def test_scores_per_microbatch_match_batch(spark, tmp_path):
    """Streaming form: scoring runs per admitted micro-batch via
    foreachBatch (the per-doc margin agg never crosses batches, so
    per-batch output equals one batch pass over the union) — the
    composition the engine's per-epoch admission pipeline uses."""
    rows = [(i, f"w{i % 5} common text token{i % 3}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "cls_docs")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    docs.filter(F.col("doc_id") < 10).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") >= 10).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    w = classifier.synthetic_weights_df(spark, 64).persist()
    got = {}

    def on_batch(bdf, _bid):
        for r in classifier.classifier_scores(
            bdf, w, bias=0.1, n_buckets=64
        ).collect():
            got[r.doc_id] = (r.logit, r.score)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck_cls"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        r.doc_id: (r.logit, r.score)
        for r in classifier.classifier_scores(
            docs, w, bias=0.1, n_buckets=64
        ).collect()
    }
    w.unpersist()
    assert set(got) == set(want) == set(range(20))
    for d in want:
        assert abs(got[d][0] - want[d][0]) < 1e-12, d
        assert abs(got[d][1] - want[d][1]) < 1e-12, d


def test_scoring_plan_broadcasts_weights(spark):
    """The weight join is a broadcast hash join (the B-row side must
    never shuffle the corpus), and the plan contains no Window."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 5} text common") for i in range(30)],
        "doc_id long, text string",
    )
    w = classifier.synthetic_weights_df(spark, 64)
    plan = (
        classifier.classifier_scores(docs, w, 0.0, 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    # the feature array stays a projected attribute so size + explode
    # share ONE evaluation of the per-doc md5 hashes (if the optimizer
    # ever inlined it, the alias would vanish from the plan)
    opt = (
        classifier.doc_feature_vectors(docs, 64)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "_fa" in opt
    # length/bucket mismatch must raise, not silently drop buckets
    with pytest.raises(ValueError):
        classifier.classifier_scores(docs, [0.0] * 32, 0.0, 64)
