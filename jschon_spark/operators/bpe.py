"""Distributed BPE vocabulary induction over a document corpus.

The classic byte-pair-encoding learner (Sennrich et al. 2016, public
algorithm) re-expressed Spark-first for training-data pipelines:

- the corpus collapses to a ``(word, freq)`` table first (one explode +
  one map-side-combinable hash aggregation) — by Heaps' law the distinct
  word table is orders of magnitude smaller than a 100 TB corpus, so
  every later iteration runs over the small table only;
- pair counting is ``zip_with`` over shifted slices of the symbol array
  (same O(n) shape as text.word_ngrams) → explode → one hash agg with
  map-side combine; the driver collects exactly ONE top-K row set per
  round, never data-scale rows;
- merge application is a pure ``aggregate`` HOF (pending-symbol fold)
  over the cached word table — narrow, codegen'd, no Python;
- ``merges_per_round`` batches symbol-disjoint merges so a 32k-entry
  vocabulary needs ~hundreds of rounds instead of 32k (the standard
  distributed-BPE relaxation: symbol-disjoint pairs have independent
  counts, so applying them together equals applying them sequentially;
  the approximation relative to strictly-serial BPE is only that a pair
  CREATED by an earlier merge in the same round cannot be selected
  until the next round). ``merges_per_round=1`` is exact classic BPE
  (pytest-pinned against a pure-Python reference implementation).

Each round persists the rewritten word table and materializes it before
dropping the parent so logical plans stay one layer deep (no
analysis-time lineage growth across rounds).

Reference repo has no tokenizer; this is part of the
beyond-the-reference training-pipeline surface (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words_col

EOW = "</w>"  # end-of-word marker (classic BPE); pass eow=None to disable


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over whitespace tokens — one shuffle on the word
    key, partial aggregation map-side."""
    return (
        df.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def with_symbols(
    wf: DataFrame, word_col: str = "word", eow: Optional[str] = EOW, out: str = "syms"
) -> DataFrame:
    """Initial symbol array: one single-character symbol per char, plus
    the optional end-of-word marker. Pure sequence+substr HOF."""
    w = F.col(word_col)
    chars = F.transform(F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1)))
    syms = chars if eow is None else F.concat(chars, F.array(F.lit(eow)))
    return wf.withColumn(out, syms)


def _adjacent_pairs(syms: Column) -> Column:
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("sym_left"), b.alias("sym_right")),
    )


def pair_counts(
    wf_syms: DataFrame, syms_col: str = "syms", freq_col: str = "freq"
) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency:
    ``(sym_left, sym_right, pair_count)``. One explode + one hash agg."""
    return (
        wf_syms.select(F.explode(_adjacent_pairs(F.col(syms_col))).alias("p"), F.col(freq_col))
        .select("p.sym_left", "p.sym_right", freq_col)
        .groupBy("sym_left", "sym_right")
        .agg(F.sum(freq_col).alias("pair_count"))
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Replace non-overlapping left-to-right occurrences of the adjacent
    symbol pair ``(left, right)`` with the merged symbol — the classic
    BPE merge step as a single ``aggregate`` fold carrying a pending
    symbol.

    CRITICAL: the input Column is referenced exactly ONCE, so chained
    merges grow the expression linearly. An earlier variant guarded the
    fold with ``when(has_pair, folded).otherwise(syms)`` — three
    references to ``syms`` — and Catalyst's analysis expanded an
    8-merge chain to a ~5^8-node tree (driver OOM; same mechanism as
    the staged-materialization fix in compiler/core.py)."""
    merged_sym = left + right

    def step(s: Column, x: Column) -> Column:
        return (
            F.when(s.pend.isNull(), F.struct(s.acc.alias("acc"), x.alias("pend")))
            .when(
                (s.pend == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(s.acc, F.array(F.lit(merged_sym))).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(F.concat(s.acc, F.array(s.pend)).alias("acc"), x.alias("pend"))
            )
        )

    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit(None).cast("string").alias("pend"),
        ),
        step,
        lambda s: F.when(s.pend.isNull(), s.acc).otherwise(F.concat(s.acc, F.array(s.pend))),
    )


def _select_disjoint(rows, k: int) -> List[Tuple[str, str, int]]:
    """Greedy top-K symbol-disjoint pair selection (driver-side over the
    collected top candidates — tens of rows, never data-scale)."""
    picked: List[Tuple[str, str, int]] = []
    used: set = set()
    for r in rows:
        l, rr = r["sym_left"], r["sym_right"]
        if l in used or rr in used:
            continue
        picked.append((l, rr, int(r["pair_count"])))
        used.update((l, rr))
        if len(picked) >= k:
            break
    return picked


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    eow: Optional[str] = EOW,
    min_pair_count: int = 2,
    merges_per_round: int = 1,
) -> Tuple[List[Tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges; returns ``(merges, words)``
    where ``merges`` is ``[(sym_left, sym_right, pair_count), ...]`` in
    application order and ``words`` the final ``(word, freq, syms)``
    DataFrame (left persisted; caller unpersists).

    Ties break deterministically on (count desc, sym_left asc,
    sym_right asc) — same total order as the pure-Python reference in
    tests/test_bpe.py, so ``merges_per_round=1`` is bit-identical to
    serial BPE."""
    wf = with_symbols(word_freqs(df, text_col=text_col), eow=eow).persist()
    wf.count()
    merges: List[Tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        # over-collect 4x so greedy disjoint filtering still fills the round
        top = (
            pair_counts(wf)
            .where(F.col("pair_count") >= min_pair_count)
            .orderBy(F.desc("pair_count"), F.asc("sym_left"), F.asc("sym_right"))
            .limit(max(4 * want, 8))
            .collect()
        )
        picked = _select_disjoint(top, want)
        if not picked:
            break
        merges.extend(picked)
        col = F.col("syms")
        for l, r, _ in picked:
            col = merge_pair_expr(col, l, r)
        nxt = wf.withColumn("syms", col).persist()
        nxt.count()  # materialize before dropping the parent cache
        wf.unpersist()
        wf = nxt
    return merges, wf


def bpe_vocab(wf_syms: DataFrame, syms_col: str = "syms", freq_col: str = "freq") -> DataFrame:
    """``(token, freq)`` over the final symbol inventory."""
    return (
        wf_syms.select(F.explode(F.col(syms_col)).alias("token"), F.col(freq_col))
        .groupBy("token")
        .agg(F.sum(freq_col).alias("freq"))
    )


def encode_words(
    wf: DataFrame,
    merges: List[Tuple[str, str, int]],
    word_col: str = "word",
    eow: Optional[str] = EOW,
    out: str = "syms",
) -> DataFrame:
    """Apply a learned merge list to (new) words — the tokenizer-apply
    step, one map-only projection chaining the merge folds in order.
    Bounded merge lists only (each merge adds one HOF layer to the
    expression); production-sized vocabularies (32k) would batch this
    through a trie in a pandas_udf instead."""
    df = with_symbols(wf, word_col=word_col, eow=eow, out=out)
    col = F.col(out)
    for l, r, _ in merges:
        col = merge_pair_expr(col, l, r)
    return df.withColumn(out, col)


def encode_udf(merges: List[Tuple[str, str, int]], eow: Optional[str] = EOW):
    """Arrow-batched BPE encoder for PRODUCTION-SIZED merge lists —
    ``text -> array<string>`` of BPE tokens. ``encode_words`` chains one
    ``aggregate`` HOF per merge (fine for tens of merges, unusable at
    32k); this is the classic rank-table apply (the public GPT-2
    ``bpe()`` algorithm, Radford et al. 2019 / Sennrich et al. 2016):
    per word, repeatedly merge the adjacent pair with the LOWEST merge
    rank until none applies — O(word_len · merges_applied) with a dict
    lookup per pair, independent of vocabulary size.

    Two batch-level savings keep the Python cost bounded:
    - words dedupe within each Arrow batch (Zipf: a handful of distinct
      words dominate), each distinct word encodes once;
    - an encode cache persists across batches within the worker
      (capped), so hot words cost one dict hit corpus-wide per worker.

    The rank dict rides task-broadcast into the workers once."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    _cache: dict = {}

    def bpe_word(word: str) -> list:
        got = _cache.get(word)
        if got is not None:
            return got
        syms = list(word) + ([eow] if eow else [])
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best, best_rank = i, rk
            if best is None:
                break
            # merge ALL non-overlapping occurrences of the best pair
            # left-to-right (= merge_pair_expr's fold semantics)
            l, r = syms[best], syms[best + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        if len(_cache) < 65536:
            _cache[word] = syms
        return syms

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            toks: list = []
            for w in t.split():
                toks.extend(bpe_word(w))
            return toks

        return texts.map(one)

    return encode


def encode_text(df: DataFrame, merges: List[Tuple[str, str, int]],
                text_col: str = "text", out: str = "bpe_tokens",
                eow: Optional[str] = EOW) -> DataFrame:
    """``text`` → BPE token array column using the learned merges —
    map-only, Arrow-batched, vocabulary-size-independent."""
    return df.withColumn(out, encode_udf(merges, eow=eow)(F.col(text_col)))
