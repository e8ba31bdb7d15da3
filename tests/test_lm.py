"""Bigram LM + perplexity filter (ops/lm): hand-computed fixture,
brute-force parity on randomized corpora, fluency ordering, and the
CCNet head/middle/tail tiering."""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.ops import lm


def _train_rows(spark, rows):
    return lm.train_bigram_lm(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def _score(spark, ref_rows, doc_rows, lam=0.8):
    uni, bi = _train_rows(spark, ref_rows)
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in lm.lm_perplexity(docs, uni, bi, lam=lam).collect()
    }


def _brute(ref_rows, doc_rows, lam=0.8):
    def toks(t):
        import re

        return re.findall(r"[a-z0-9]+", (t or "").lower())

    uni, bi = Counter(), Counter()
    for _, t in ref_rows:
        ts = toks(t)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    N, V = sum(uni.values()), len(uni)
    out = {}
    for i, t in doc_rows:
        ts = toks(t)
        lps = []
        for a, b in zip(ts, ts[1:]):
            pml = bi[(a, b)] / uni[a] if bi[(a, b)] else 0.0
            p = lam * pml + (1 - lam) * (uni[b] + 1) / (N + V)
            lps.append(math.log(p))
        if lps:
            avg = sum(lps) / len(lps)
            out[i] = (len(lps), avg, math.exp(-avg))
        else:
            out[i] = (0, None, None)
    return out


def test_hand_computed_fixture(spark):
    got = _score(spark, [(0, "a b a c")], [(10, "a b x")])
    # (a,b): 0.8*(1/2) + 0.2*(1+1)/(4+3); (b,x): 0.2*(0+1)/7
    p1 = 0.8 * 0.5 + 0.2 * 2 / 7
    p2 = 0.2 * 1 / 7
    avg = (math.log(p1) + math.log(p2)) / 2
    n, a, p = got[10]
    assert n == 2
    assert a == pytest.approx(avg, rel=1e-12)
    assert p == pytest.approx(math.exp(-avg), rel=1e-12)


def test_short_and_null_docs_unscored(spark):
    got = _score(spark, [(0, "a b c")], [(1, "one"), (2, ""), (3, None)])
    assert got[1] == (1 - 1, None, None) or got[1][0] == 0
    for i in (1, 2, 3):
        assert got[i][0] == 0 and got[i][1] is None and got[i][2] is None


def test_fluent_text_scores_lower_ppl(spark):
    ref = [(i, "the cat sat on the mat and the dog ran") for i in range(3)]
    got = _score(
        spark,
        ref,
        [(0, "the cat sat on the mat"), (1, "zq xv wk jj qqq zz pp")],
    )
    assert got[0][2] < got[1][2]


@pytest.mark.parametrize("seed", [3, 4])
def test_matches_bruteforce_random(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(25)]
    mk = lambda lo, hi: " ".join(
        rng.choice(vocab) for _ in range(rng.randint(lo, hi))
    )
    ref_rows = [(i, mk(5, 30)) for i in range(15)]
    doc_rows = [(i, mk(0, 20)) for i in range(30)]
    got = _score(spark, ref_rows, doc_rows, lam=0.7)
    want = _brute(ref_rows, doc_rows, lam=0.7)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        if want[i][1] is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(want[i][1], rel=1e-9)
            assert got[i][2] == pytest.approx(want[i][2], rel=1e-9)


def test_ppl_tiers_thirds(spark):
    uni, bi = _train_rows(spark, [(0, "a b a b a b c")])
    docs = spark.createDataFrame(
        [(i, "a b " * (i + 1)) for i in range(6)]
        + [(6, "zz qq rr")]  # worst ppl
        + [(7, "x")],  # unscorable
        "doc_id long, text string",
    )
    scored = lm.lm_perplexity(docs, uni, bi)
    tiers = {
        r["doc_id"]: r["tier"] for r in lm.ppl_tiers(scored).collect()
    }
    assert tiers[7] is None
    assert tiers[6] == "tail"
    vals = {
        r["doc_id"]: r["ppl"]
        for r in scored.collect()
        if r["ppl"] is not None
    }
    order = sorted(vals, key=vals.get)
    # lowest-ppl scored docs are head, highest are tail
    assert tiers[order[0]] == "head" and tiers[order[-1]] == "tail"
    assert set(tiers.values()) >= {"head", "middle", "tail"}


def test_lm_scores_per_microbatch_match_batch(spark, tmp_path):
    """Streaming form: scoring runs per admitted micro-batch via
    foreachBatch against the FIXED trained tables (the per-doc
    aggregate never crosses batches, so per-batch output equals one
    batch pass over the union) — the composition an ingest pipeline
    uses for the perplexity gate."""
    ref = [(i, "the cat sat on the mat and the dog ran home") for i in range(3)]
    uni, bi = _train_rows(spark, ref)
    uni, bi = uni.persist(), bi.persist()
    rows = [
        (i, ["the cat sat on the mat", "zq xv wk jj", "x", ""][i % 4])
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "lm_docs")
    docs.filter(F.col("doc_id") < 10).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") >= 10).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = {}

    def on_batch(bdf, _bid):
        for r in lm.lm_perplexity(bdf, uni, bi).collect():
            got[r.doc_id] = (r.n_bigrams, r.avg_logp, r.ppl)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck_lm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        r.doc_id: (r.n_bigrams, r.avg_logp, r.ppl)
        for r in lm.lm_perplexity(docs, uni, bi).collect()
    }
    uni.unpersist(), bi.unpersist()
    assert set(got) == set(want) == set(range(20))
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None, d
        else:
            assert abs(got[d][1] - want[d][1]) < 1e-12, d
            assert abs(got[d][2] - want[d][2]) < 1e-12, d


def test_empty_reference_reports_zero_scored_bigrams(spark):
    """n_bigrams counts SCORED bigrams: against an empty reference
    every logprob is NULL, so docs report n_bigrams = 0 (the gate
    convention holds — nothing silently passes as scored)."""
    uni, bi = _train_rows(spark, [(0, "")])
    docs = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    got = lm.lm_perplexity(docs, uni, bi).collect()[0]
    assert got["n_bigrams"] == 0
    assert got["avg_logp"] is None and got["ppl"] is None


def test_lam_out_of_range_raises(spark):
    uni, bi = _train_rows(spark, [(0, "a b")])
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for bad in (1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            lm.lm_perplexity(docs, uni, bi, lam=bad)
