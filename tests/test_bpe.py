"""BPE trainer/encoder (ops/bpe): the incremental merge learner vs an
independent naive recount-from-scratch reference, encoder/training
segmentation agreement, round-trip reconstruction, distributed count
parity, determinism across partitionings, and the top-k cap."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_spark.ops import bpe


# ---------------- independent reference (naive recount) ----------------


def _naive_merges(word_freqs, n_merges, min_frequency=2):
    words = [(tuple(w) + (bpe.EOW,), f) for w, f in word_freqs if w]
    merges = []
    while len(merges) < n_merges:
        counts = Counter()
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                counts[p] += f
        if not counts:
            break
        (a, b), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_frequency:
            break
        merges.append((a, b))
        words = [(bpe._apply_merge(s, a, b), f) for s, f in words]
    return merges


def _rand_word(seed):
    # deterministic pseudo-random short words over a 4-letter alphabet
    s, out = seed, []
    for _ in range(2 + seed % 6):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append("abcd"[s % 4])
    return "".join(out)


def test_incremental_learner_matches_naive_recount():
    """The pair-index incremental learner equals the O(merges x corpus)
    recount reference on the classic Sennrich corpus and on 20
    deterministic pseudo-random corpora (tie-breaks included)."""
    classic = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    assert bpe.learn_merges(classic, 10) == _naive_merges(classic, 10)
    for seed in range(20):
        wf = [
            (_rand_word(seed * 31 + i), 1 + (i * 7 + seed) % 9)
            for i in range(30)
        ]
        got = bpe.learn_merges(wf, 15, min_frequency=1)
        want = _naive_merges(wf, 15, min_frequency=1)
        assert got == want, (seed, got, want)


def test_encoder_reproduces_training_segmentation_and_roundtrip():
    """Greedy rank-ordered encoding of each TRAINING word equals the
    segmentation reached by applying the merges in learned order, and
    concatenating tokens reconstructs word + EOW exactly."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.learn_merges(wf, 8, min_frequency=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wf:
        syms = tuple(w) + (bpe.EOW,)
        for a, b in merges:
            syms = bpe._apply_merge(syms, a, b)
        enc = bpe.encode_word(w, ranks)
        assert enc == syms, (w, enc, syms)
        assert "".join(enc) == w + bpe.EOW
    # unseen word still round-trips
    assert "".join(bpe.encode_word("lowest", ranks)) == "lowest" + bpe.EOW


def test_distributed_counts_match_driver_encoding(spark):
    """bpe_token_counts / bpe_encode over a DataFrame equal a pure-
    driver recomputation per doc; NULL/empty text count 0 / encode to
    the empty array."""
    texts = [
        (0, "the lowest lower low"),
        (1, "newest widest new wide"),
        (2, None),
        (3, ""),
        (4, "Low LOWER, low!"),  # case/punct fold to the same tokens
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    model = bpe.train_bpe(docs, n_merges=12, min_frequency=1)
    merges = model["merges"]
    ranks = {p: i for i, p in enumerate(merges)}

    import re

    def drv(t):
        if not t:
            return []
        out = []
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            out.extend(bpe.encode_word(w, ranks))
        return out

    enc = {
        r.doc_id: r.tokens
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    cnt = {
        r.doc_id: r.n_tokens
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    for d, t in texts:
        want = drv(t)
        assert enc[d] == want, (d, enc[d], want)
        assert cnt[d] == len(want)
    assert cnt[2] == 0 and cnt[3] == 0
    assert enc[4] == drv("low lower low")


def test_training_deterministic_across_partitionings(spark):
    """Same corpus, different physical layout -> identical merges
    (the (freq desc, word asc) cap ordering is total)."""
    rows = [(i, f"{_rand_word(i)} {_rand_word(i + 99)} shared common")
            for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = bpe.train_bpe(a, n_merges=20, min_frequency=1)["merges"]
    m2 = bpe.train_bpe(
        a.repartition(7), n_merges=20, min_frequency=1
    )["merges"]
    assert m1 == m2 and len(m1) == 20


def test_max_words_cap_and_bad_args(spark):
    """The word-type cap keeps only the top types by (freq desc, word
    asc) — merges learned under the cap equal merges learned on the
    driver-truncated list; n_merges < 1 raises."""
    rows = [(i, ("aa " * (i + 1)) + f"rare{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = bpe.train_bpe(docs, n_merges=5, max_words=3,
                           min_frequency=1)
    wf = [
        (r["word"], r["freq"])
        for r in bpe.word_frequencies(docs)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(3)
        .collect()
    ]
    assert capped["n_word_types"] == 3
    assert capped["merges"] == bpe.learn_merges(wf, 5, 1)
    with pytest.raises(ValueError):
        bpe.train_bpe(docs, n_merges=0)
