"""BPE tokenizer training + encoding (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; the greedy
rank-ordered encoder is the GPT-2 public reference shape) — tokenizer
CONSTRUCTION as a corpus operator, the step a training-data pipeline
runs once per corpus before token budgeting (ops/packing counts with
a fixed estimator; this learns the vocabulary those budgets assume).
The reference engine has no counterpart — training-data pipeline
layer.

100 TB shape:
  - the corpus contributes exactly ONE tokenize pass + one map-side-
    combined groupBy(word) count, capped to the top `max_words` word
    TYPES by TakeOrdered (partial per-partition top-k, k-row driver
    merge — never a global sort).  BPE merge learning runs over word
    types x frequency, not the token stream (the industry shape:
    HuggingFace/SentencePiece likewise count distributed, then learn
    merges on one node), so the driver holds <= max_words rows, not
    corpus rows.
  - merge learning is driver-side with an incremental pair index
    (pair counts + pair -> affected-word index, updated per merge) —
    O(affected word length) per merge, not a full recount.
  - encoding is an Arrow-batched pandas UDF with a per-executor
    word -> tokens memo: per unique word work, not per occurrence
    (web text's word-type/token ratio makes the memo the whole
    game).  The merge-rank table ships once in the UDF closure
    (B entries, driver-sized by construction).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens_arr

EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus-wide [a-z0-9]+ token convention —
    one tokenize pass, one narrow explode, ONE map-side-combined
    groupBy(word)."""
    toks = docs.select(_tokens_arr(F.col(text_col)).alias("_ts"))
    return (
        toks.select(F.explode("_ts").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge(syms: tuple, a: str, b: str) -> tuple:
    """Merge non-overlapping (a, b) occurrences left-to-right."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pairs(syms: tuple):
    return zip(syms, syms[1:])


def learn_merges(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_frequency: int = 2,
) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning over (word, freq) types.  Words
    start as character sequences + the end-of-word symbol; each round
    merges the max-frequency adjacent pair (ties broken by pair
    lexicographic order — fully deterministic) until `n_merges` or no
    pair reaches `min_frequency`.  Incremental bookkeeping: a pair
    count table plus a pair -> affected-word index; a merge rewrites
    only the words containing its pair (subtract the word's old
    pairs, rewrite, add the new ones).  Selection is a lazy-deletion
    max-heap keyed (-count, pair) — entries are pushed on every count
    increase and validated against the live table at pop, so picking
    each round's pair is ~O(log |pairs|), not a full table scan
    (at vocab-scale n_merges x |pairs| scans would dominate the whole
    trainer)."""
    import heapq

    words = [
        (tuple(w) + (EOW,), int(f)) for w, f in word_freqs if w
    ]
    counts: Counter = Counter()
    where: dict = {}
    for wi, (syms, f) in enumerate(words):
        for p in _pairs(syms):
            counts[p] += f
            where.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, (a, b) = heapq.heappop(heap)
        if counts.get((a, b), 0) != -negc:
            continue  # stale entry (count changed since push)
        if -negc < min_frequency:
            break  # heap max below threshold: nothing better exists
        merges.append((a, b))
        touched: set = set()
        for wi in sorted(where.get((a, b), set())):
            syms, f = words[wi]
            for p in _pairs(syms):
                counts[p] -= f
                touched.add(p)
                if counts[p] <= 0:
                    del counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del where[p]
            syms = _apply_merge(syms, a, b)
            words[wi] = (syms, f)
            for p in _pairs(syms):
                counts[p] += f
                touched.add(p)
                where.setdefault(p, set()).add(wi)
        # one push per touched pair's FINAL count: increases need a
        # fresh entry, and decreases too — their old (higher) entries
        # are now stale, and with no live entry a decreased pair could
        # never be selected again even while it is the true max
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    max_words: int = 100_000,
    min_frequency: int = 2,
    text_col: str = "text",
) -> dict:
    """Distributed word count -> driver merge learning.  Returns
    {"merges": [(a, b), ...], "n_word_types": int}.  The corpus-side
    cap keeps the driver at <= max_words rows; ordering for the cap
    is (freq desc, word asc) so the trained tokenizer is byte-stable
    across runs and partitionings."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    wf = word_frequencies(docs, text_col=text_col)
    top = wf.orderBy(
        F.col("freq").desc(), F.col("word").asc()
    ).limit(int(max_words))
    rows = top.collect()
    merges = learn_merges(
        [(r["word"], r["freq"]) for r in rows], n_merges, min_frequency
    )
    return {"merges": merges, "n_word_types": len(rows)}


def encode_word(word: str, ranks: dict) -> tuple:
    """GPT-2-style greedy encoder: repeatedly merge the lowest-rank
    adjacent pair until none of the word's pairs has a rank.  On the
    training corpus this reproduces the training segmentation (the
    rank order IS the learned merge order)."""
    syms = tuple(word) + (EOW,)
    while len(syms) > 1:
        ranked = [
            (ranks[p], p) for p in set(_pairs(syms)) if p in ranks
        ]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        syms = _apply_merge(syms, a, b)
    return syms


_MEMO_CAP = 1_000_000  # bound the per-worker word cache: web text's
# distinct-word stream is unbounded (ids, base64 fragments all match
# [a-z0-9]+), and a long-lived python worker must not grow without
# limit.  First-come fill is the right policy — frequent words appear
# early and dominate occurrences; words past the cap just re-encode.


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_col: str = "tokens",
) -> DataFrame:
    """All input columns + an array<string> column of BPE tokens
    (corpus-wide [a-z0-9]+ pre-tokenization, per-word greedy
    encoding).  Arrow-batched pandas UDF with a capped per-worker
    word memo; NULL/empty text encodes to the empty array."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    # closure-level memo: serialized once per python worker, so it
    # persists ACROSS Arrow batches (a per-batch dict would rebuild
    # the word cache every ~10k rows)
    memo: dict = {}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        def one(t):
            if not isinstance(t, str) or not t:
                return []
            out = []
            for w in tok_re.findall(t.lower()):
                got = memo.get(w)
                if got is None:
                    got = list(encode_word(w, ranks))
                    if len(memo) < _MEMO_CAP:
                        memo[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    return docs.withColumn(tokens_col, enc(F.col(text_col)))


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) under the learned vocabulary — the exact count
    ops/packing's budget estimator approximates.  Same memoized Arrow
    UDF as bpe_encode, summing lengths instead of materializing the
    token arrays (the count path never ships token strings)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    memo: dict = {}

    @F.pandas_udf("long")
    def ntok(texts: pd.Series) -> pd.Series:
        def one(t):
            if not isinstance(t, str) or not t:
                return 0
            n = 0
            for w in tok_re.findall(t.lower()):
                got = memo.get(w)
                if got is None:
                    got = len(encode_word(w, ranks))
                    if len(memo) < _MEMO_CAP:
                        memo[w] = got
                n += got
            return n

        return texts.map(one).astype("int64")

    return docs.select(id_col, ntok(F.col(text_col)).alias("n_tokens"))
