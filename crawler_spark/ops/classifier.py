"""fastText-style linear quality classifier over hashed unigram+bigram
features (Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification") — the model-based corpus admission stage (the
CCNet / LLaMA-pipeline "looks-like-reference-text" filter) beside
ops/textstats' heuristic gate and ops/dsir's importance weights.
The reference engine has no counterpart (its admission layer is the
seen-set + validity filter, pkg/crawler/process.go); this is
training-data pipeline layer.

Features are the ops/dsir hashed bag: [a-z0-9]+ unigrams + space-
joined bigrams, 32-bit md5 word mod B (exactly DuckDB-mirrorable,
like every hashed operator here; production swaps xxhash64 — same
plan), with per-doc mean normalization (fastText averages its token
vectors; for a linear model that is x_b = c_b / n_doc).

100 TB shape:
  - scoring (the path that sees the whole crawl): ONE tokenize pass
    per doc (projected token array — the tokenize-once contract,
    see ops/dsir), one narrow explode, ONE map-side-combined
    groupBy(doc, bucket) carrying the per-doc normalizer as a
    per-row constant (min) — no window, no second shuffle; the
    weight table is B rows (1e4-1e6) -> broadcast hash join; margins
    are one groupBy(doc).  The corpus is never shuffled beyond its
    own (doc, bucket) aggregate.
  - training: the LABELED set is small by definition (1e5-1e7 docs
    of curated positives + sampled crawl negatives); its feature
    frame is built once, repartitioned by doc and persisted, so
    every L-BFGS evaluation is (a) one broadcast join + no-exchange
    groupBy(doc) for margins and (b) one doc-keyed join (only the
    tiny per-doc error frame shuffles) + B-row groupBy(bucket)
    collect for the weight gradient.  The driver holds only the
    B-sized weight vector and the L-BFGS pair history — never rows.
  - the optimizer is a driver-side numpy L-BFGS (two-loop recursion,
    Armijo backtracking; Nocedal & Wright ch. 7) because each
    function/gradient evaluation IS a distributed pass — the classic
    "driver optimizes, cluster evaluates" split MLlib itself uses.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import _features_from_tokens, _U32
from .textstats import _tokens_arr


def doc_feature_vectors(
    docs: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(id_col, bucket, x) — hashed unigram+bigram bucket values per
    document; x = count / n_features(doc) when normalize (fastText's
    mean), else the raw long count as double.

    The per-doc normalizer n rides the SAME aggregate as the counts
    (it is a per-row constant = size of the feature array, folded
    with min), so normalization costs zero extra shuffle.  Docs with
    no features (NULL/empty text) produce no rows — score paths
    left-join and coalesce to the bias."""
    toks = docs.select(
        F.col(id_col), _tokens_arr(F.col(text_col)).alias("_ts")
    )
    # project the feature array as an attribute so size+explode share
    # ONE evaluation of the 2n-1 md5 hashes per doc (the tokenize-once
    # contract — an inline expression would run under both the Project
    # and the Generate; see ops/dsir.doc_bucket_counts)
    fa = toks.select(
        F.col(id_col),
        _features_from_tokens(F.col("_ts"), n_buckets).alias("_fa"),
    )
    feats = fa.select(
        F.col(id_col),
        F.size("_fa").alias("_n"),
        F.explode("_fa").alias("bucket"),
    )
    agg = feats.groupBy(id_col, "bucket").agg(
        F.count("*").alias("_c"), F.min("_n").alias("_nd")
    )
    x = (
        F.col("_c").cast("double") / F.col("_nd")
        if normalize
        else F.col("_c").cast("double")
    )
    return agg.select(id_col, "bucket", x.alias("x"))


def weights_df(spark, weights: Sequence[float]) -> DataFrame:
    """B-row (bucket, w) frame from a driver-side weight vector."""
    pdf = pd.DataFrame(
        {
            "bucket": np.arange(len(weights), dtype=np.int64),
            "w": np.asarray(weights, dtype=np.float64),
        }
    )
    return spark.createDataFrame(pdf)


def synthetic_weights_df(spark, n_buckets: int, tag: str = "w") -> DataFrame:
    """Deterministic pseudo-random weights in [-0.5, 0.5) from the
    corpus-wide md5 uniform (w_b = md5_32(b ':' tag)/2^32 - 0.5) —
    column math only, exactly mirrorable in a DuckDB oracle (used by
    the driver's classifier_score entry so the scoring plan is
    SQL-checked without shipping a trained model)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("id").cast("string"), F.lit(":" + tag))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (h.cast("double") / F.lit(_U32) - F.lit(0.5)).alias("w"),
    )


def _margins(feats: DataFrame, wdf: DataFrame, id_col: str) -> DataFrame:
    """(id_col, _s) — per-doc margin Σ_b x_b·w_b: broadcast B-row
    weight join + one map-side-combined groupBy(doc).  The ONE margin
    definition, shared by scoring and training so they cannot
    diverge."""
    return (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("_s"))
    )


def _as_weights_df(spark, weights, n_buckets: int) -> DataFrame:
    if isinstance(weights, DataFrame):
        return weights
    if len(weights) != n_buckets:
        raise ValueError(
            f"weights length {len(weights)} != n_buckets {n_buckets} "
            "(a mismatch would silently drop buckets in the join)"
        )
    return weights_df(spark, weights)


def classifier_scores(
    docs: DataFrame,
    weights,
    bias: float,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(id_col, logit, score) for EVERY input doc: logit = bias +
    Σ_b x_b·w_b, score = σ(logit).  `weights` is a (bucket, w) frame
    or a driver-side vector of length exactly n_buckets (checked —
    a mismatched vector would silently drop buckets).  Featureless
    docs score at the bias.  The weight side broadcasts (B rows);
    the corpus pays one (doc, bucket) agg + one groupBy(doc) — see
    module docstring."""
    wdf = _as_weights_df(docs.sparkSession, weights, n_buckets)
    feats = doc_feature_vectors(
        docs, n_buckets, id_col=id_col, text_col=text_col,
        normalize=normalize,
    )
    margins = _margins(feats, wdf, id_col)
    logit = F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(float(bias))
    return (
        docs.select(id_col)
        .join(margins, id_col, "left")
        .select(
            id_col,
            logit.alias("logit"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
        )
    )


def quality_filter(
    docs: DataFrame,
    weights,
    bias: float,
    n_buckets: int,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs whose classifier score clears `threshold`, with the score
    attached — the admission-style composition (join back on id so
    every original column survives; the score side is the only
    aggregate)."""
    kept = classifier_scores(
        docs, weights, bias, n_buckets, id_col=id_col, text_col=text_col
    ).where(F.col("score") >= F.lit(float(threshold)))
    return docs.join(kept.select(id_col, "score"), id_col)


# ---------------- training ----------------


def _eval_factory(feats, labels, n_buckets, l2, n_docs, id_col):
    """Returns fg(theta) -> (loss, grad) where theta = [w_0..w_{B-1},
    bias]: mean logistic loss + (l2/2)||w||² (bias unregularized).
    Each call is two distributed aggregates over the persisted
    feature/label frames (margins -> loss + bias grad; per-doc error
    x features -> B-row weight grad)."""
    spark = feats.sparkSession

    def fg(theta: np.ndarray):
        w, b = theta[:-1], float(theta[-1])
        wdf = weights_df(spark, w)
        md = labels.join(_margins(feats, wdf, id_col), id_col, "left").select(
            F.col(id_col),
            F.col("_y"),
            (F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(b)).alias("_m"),
        ).persist()  # two actions below share the one margin aggregate
        z = (2.0 * F.col("_y") - 1.0) * F.col("_m")
        loss_i = F.greatest(F.lit(0.0), -z) + F.log1p(F.exp(-F.abs(z)))
        err = (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))) - F.col("_y")
        )
        errs = md.select(id_col, err.alias("_e"))
        row = md.agg(
            F.sum(loss_i).alias("L"), F.sum(err).alias("ge")
        ).first()
        grad_rows = (
            errs.join(feats, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_e") * F.col("x")).alias("g"))
            .collect()
        )
        md.unpersist()
        g = np.zeros(n_buckets + 1)
        for r in grad_rows:
            g[int(r["bucket"])] = r["g"]
        g[:-1] = g[:-1] / n_docs + l2 * w
        g[-1] = float(row["ge"]) / n_docs
        loss = float(row["L"]) / n_docs + 0.5 * l2 * float(w @ w)
        return loss, g

    return fg


def _lbfgs(fg, x0: np.ndarray, max_iter: int, tol: float, m: int = 10):
    """Two-loop-recursion L-BFGS with Armijo backtracking (Nocedal &
    Wright, Numerical Optimization, alg. 7.4/7.5).  Every evaluation
    returns (f, g) — the line search reuses the accepted point's
    gradient, so each trial costs exactly one distributed pass."""
    x, (f, g) = x0.astype(np.float64), fg(x0)
    S, Y = [], []
    losses = [f]
    converged = False
    for _ in range(max_iter):
        if float(np.max(np.abs(g))) < tol:
            converged = True
            break
        q = g.copy()
        alphas = []
        for s, y in reversed(list(zip(S, Y))):
            rho = 1.0 / float(y @ s)
            a = rho * float(s @ q)
            q -= a * y
            alphas.append((a, rho))
        if S:
            gamma = float(S[-1] @ Y[-1]) / float(Y[-1] @ Y[-1])
        else:
            gamma = 1.0
        r = gamma * q
        for (s, y), (a, rho) in zip(zip(S, Y), reversed(alphas)):
            beta = rho * float(y @ r)
            r += (a - beta) * s
        d = -r
        gd = float(g @ d)
        if gd > -1e-12:  # not a descent direction: steepest fallback
            d, gd = -g, -float(g @ g)
        t = 1.0
        fn, gn, xn = f, g, x
        accepted = False
        while t >= 1e-12:
            xn = x + t * d
            fn, gn = fg(xn)
            if fn <= f + 1e-4 * t * gd:
                accepted = True
                break
            t *= 0.5
        if not accepted:
            # no step along d satisfies Armijo: keep x (never move to
            # a strictly worse iterate) and stop
            break
        s_vec, y_vec = xn - x, gn - g
        if float(s_vec @ y_vec) > 1e-12:
            S.append(s_vec)
            Y.append(y_vec)
            if len(S) > m:
                S.pop(0)
                Y.pop(0)
        x, f, g = xn, fn, gn
        losses.append(f)
    return x, losses, converged


def train_quality_classifier(
    labeled: DataFrame,
    n_buckets: int = 4096,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    l2: float = 1e-4,
    max_iter: int = 50,
    tol: float = 1e-6,
) -> dict:
    """Fit the linear classifier on (id, text, label∈{0,1}) rows.
    Returns {"weights": np.ndarray(B), "bias": float, "losses":
    [..], "converged": bool, "n_docs": int}.

    The feature frame is built ONCE, repartitioned by doc id and
    persisted: the margin groupBy(doc) then needs no exchange and
    the gradient's error join shuffles only the per-doc error frame
    against already-placed features.  Every optimizer step touches
    the cluster through fg() alone (see _eval_factory)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    feats = (
        doc_feature_vectors(
            labeled, n_buckets, id_col=id_col, text_col=text_col
        )
        .repartition(id_col)
        .persist()
    )
    labels = (
        labeled.select(
            F.col(id_col), F.col(label_col).cast("double").alias("_y")
        )
        .repartition(id_col)
        .persist()
    )
    try:
        n_docs = labels.count()
        if n_docs == 0:
            raise ValueError("empty training set")
        fg = _eval_factory(feats, labels, n_buckets, l2, n_docs, id_col)
        x0 = np.zeros(n_buckets + 1)
        x, losses, converged = _lbfgs(fg, x0, max_iter, tol)
    finally:
        feats.unpersist()
        labels.unpersist()
    return {
        "weights": x[:-1],
        "bias": float(x[-1]),
        "losses": losses,
        "converged": converged,
        "n_docs": n_docs,
    }
