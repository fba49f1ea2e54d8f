"""BPE vocabulary induction: the Spark learner (operators/bpe.py) is
pinned merge-for-merge against a pure-Python classic-BPE reference
(Sennrich et al. 2016 — public algorithm) with the identical
deterministic tie-break (count desc, left asc, right asc)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.bpe import (
    EOW,
    bpe_vocab,
    encode_words,
    learn_bpe,
    pair_counts,
    with_symbols,
    word_freqs,
)

CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest",
    "the newest lowest west west west nest nest",
    "low low lowest newest wider wide wide",
]


def _ref_bpe(texts, n_merges, eow=EOW, min_pair_count=2):
    wf = Counter()
    for t in texts:
        for w in t.split():
            wf[w] += 1
    words = {w: list(w) + ([eow] if eow else []) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = words[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        cands = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if not cands or cands[0][1] < min_pair_count:
            break
        (l, r), c = cands[0]
        merges.append((l, r, c))
        for w in words:
            s = words[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[w] = out
    return merges, words


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_word_freqs(spark, docs):
    got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    want = Counter(w for t in CORPUS for w in t.split())
    assert got == dict(want)


def test_first_iteration_pair_counts(spark, docs):
    wf = with_symbols(word_freqs(docs))
    got = {
        (r["sym_left"], r["sym_right"]): r["pair_count"]
        for r in pair_counts(wf).collect()
    }
    ref_merges_unused, _ = _ref_bpe(CORPUS, 0)
    pc = Counter()
    freqs = Counter(w for t in CORPUS for w in t.split())
    for w, f in freqs.items():
        s = list(w) + [EOW]
        for i in range(len(s) - 1):
            pc[(s[i], s[i + 1])] += f
    assert got == dict(pc)


def test_learn_bpe_matches_reference_exactly(spark, docs):
    ref_merges, ref_words = _ref_bpe(CORPUS, 10)
    merges, wf = learn_bpe(docs, n_merges=10)
    try:
        assert merges == ref_merges
        got_words = {r["word"]: list(r["syms"]) for r in wf.collect()}
        assert got_words == ref_words
    finally:
        wf.unpersist()


def test_learn_bpe_no_eow(spark, docs):
    ref_merges, _ = _ref_bpe(CORPUS, 5, eow=None)
    merges, wf = learn_bpe(docs, n_merges=5, eow=None)
    try:
        assert merges == ref_merges
    finally:
        wf.unpersist()


def test_batched_rounds_merge_disjoint_and_reconstruct(spark, docs):
    """merges_per_round>1 is the distributed relaxation: merges within a
    round are symbol-disjoint, and every word's symbols still
    concatenate back to word+EOW (a tokenization, never corruption)."""
    merges, wf = learn_bpe(docs, n_merges=9, merges_per_round=3)
    try:
        assert len(merges) <= 9 and len(merges) >= 6
        for i in range(0, len(merges), 3):
            used = set()
            for l, r, _ in merges[i : i + 3]:
                assert l not in used and r not in used
                used.update((l, r))
        bad = wf.where(
            F.concat_ws("", F.col("syms")) != F.concat(F.col("word"), F.lit(EOW))
        ).count()
        assert bad == 0
    finally:
        wf.unpersist()


def test_encode_words_replays_learned_merges(spark, docs):
    merges, wf = learn_bpe(docs, n_merges=8)
    try:
        enc = encode_words(wf.select("word", "freq"), merges)
        diff = (
            enc.alias("e")
            .join(wf.alias("w"), "word")
            .where(F.col("e.syms") != F.col("w.syms"))
            .count()
        )
        assert diff == 0
    finally:
        wf.unpersist()


def test_vocab_totals(spark, docs):
    merges, wf = learn_bpe(docs, n_merges=6)
    try:
        vocab = {r["token"]: r["freq"] for r in bpe_vocab(wf).collect()}
        _, ref_words = _ref_bpe(CORPUS, 6)
        freqs = Counter(w for t in CORPUS for w in t.split())
        want = Counter()
        for w, syms in ref_words.items():
            for s in syms:
                want[s] += freqs[w]
        assert vocab == dict(want)
    finally:
        wf.unpersist()


def test_encode_udf_matches_fold_encoder(spark):
    """The rank-table Arrow encoder (encode_udf — production path)
    agrees with the chained-fold encode_words (exact reference path)
    on the learned merges, word for word."""
    from jschon_spark.operators.bpe import (
        encode_text,
        encode_words,
        learn_bpe,
        word_freqs,
    )

    docs = spark.createDataFrame(
        [(i, CORPUS[i % len(CORPUS)]) for i in range(30)], "doc_id long, text string"
    )
    merges, wf = learn_bpe(docs, n_merges=12)
    wf.unpersist()
    words = word_freqs(docs)
    fold = {
        r["word"]: r["syms"]
        for r in encode_words(words, merges).collect()
    }
    arrow = encode_text(
        spark.createDataFrame([(w,) for w in fold], "text string"), merges
    ).collect()
    got = {r["text"]: r["bpe_tokens"] for r in arrow}
    assert got == fold


def test_encode_udf_null_and_multiword(spark):
    from jschon_spark.operators.bpe import encode_text

    df = spark.createDataFrame([("ab ab",), (None,)], "text string")
    out = {r["text"]: r["bpe_tokens"] for r in encode_text(df, [("a", "b", 9)]).collect()}
    assert out["ab ab"] == ["ab", "</w>", "ab", "</w>"]
    assert out[None] is None
