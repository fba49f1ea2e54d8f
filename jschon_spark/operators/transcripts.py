"""Transcript quality assurance: WER / CER between hypothesis and
reference transcripts — the standard ASR data-QA gate for audio+text
training pairs (drop or down-weight clips whose transcript disagrees
with a second source: another ASR pass, a human pass, or a forced
re-decode).

- CER (character error rate) is pure JVM: ``levenshtein`` /
  ref length — codegen'd, shuffle-free, SQL-portable (DuckDB has the
  same function, so the driver query is oracle-exact).
- WER (word error rate) needs word-level edit distance, which no SQL
  engine exposes. The kernel is an Arrow-batched pandas UDF running a
  per-row dynamic program whose INNER loop is fully vectorized: row i
  of the DP table is computed with two numpy ops plus the classic
  prefix-min identity for the insertion chain
  (min_k<=j cur[k] + (j-k)  =  j + running-min(cur[k]-k)),
  so a pair costs O(len(hyp)) numpy calls, not O(n*m) Python steps.

Normalization (lowercase, punctuation stripped, whitespace collapsed)
mirrors text.normalize_text so WER measures content disagreement, not
formatting.

At the 10^12-row design point both metrics are map-only over the
(clip_id, hyp, ref) join — the join itself is the usual broadcast vs
sort-merge choice by table size (table_checks.referential_check).

Reference scope note: handrews/jschon (pure JSON Schema validation)
has no ASR surface; this is part of the training-data-pipeline
extension the brief mandates beyond reference parity.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Mirrors cer()'s normalization exactly: \w keeps '_' as a word char,
# so '_' is stripped explicitly in BOTH — WER and CER must agree on
# underscore-containing transcripts.
_NORM_RE = re.compile(r"[^\w\s]|_", re.UNICODE)

WER_TYPE = T.StructType(
    [
        T.StructField("wer", T.DoubleType()),
        T.StructField("n_ref_words", T.IntegerType()),
        T.StructField("n_edits", T.IntegerType()),
    ]
)


def _norm_words(s: str) -> list:
    return _NORM_RE.sub(" ", s.lower()).split()


def word_edit_distance(hyp: list, ref: list) -> int:
    """Word-level Levenshtein with a vectorized inner loop (see module
    docstring for the prefix-min identity)."""
    n, m = len(hyp), len(ref)
    if n == 0:
        return m
    if m == 0:
        return n
    ref_arr = np.array(ref, dtype=object)
    j_idx = np.arange(1, m + 1)
    prev = np.arange(m + 1, dtype=np.int64)
    for i, h in enumerate(hyp, 1):
        cost = (ref_arr != h).astype(np.int64)
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        # substitution / deletion against the previous row
        cur[1:] = np.minimum(prev[:-1] + cost, prev[1:] + 1)
        # insertion chain: cur[j] = min(cur[j], min_{k<j} cur[k] + j - k)
        shifted = np.minimum.accumulate(cur - np.arange(m + 1))
        cur = np.minimum(cur, shifted + np.arange(m + 1))
        prev = cur
    return int(prev[m])


def wer_udf(normalize: bool = True):
    """(hyp, ref) → struct(wer, n_ref_words, n_edits). WER is edits
    divided by reference length; an empty reference with a non-empty
    hypothesis scores wer = n_hyp (insertions / 0-length ref reported
    against a floor of 1 word, the common convention)."""

    @pandas_udf(WER_TYPE)
    def k(hyp: pd.Series, ref: pd.Series) -> pd.DataFrame:
        wers = np.full(len(hyp), np.nan)
        nrefs = np.zeros(len(hyp), dtype=np.int32)
        nedits = np.zeros(len(hyp), dtype=np.int32)
        for i, (h, r) in enumerate(zip(hyp, ref)):
            if h is None or r is None:
                continue
            hw = _norm_words(h) if normalize else h.split()
            rw = _norm_words(r) if normalize else r.split()
            d = word_edit_distance(hw, rw)
            nrefs[i] = len(rw)
            nedits[i] = d
            wers[i] = d / max(len(rw), 1)
        return pd.DataFrame(
            {"wer": wers, "n_ref_words": nrefs, "n_edits": nedits}
        )

    return k


def with_wer(
    df: DataFrame,
    hyp_col: str = "transcript",
    ref_col: str = "ref_transcript",
    normalize: bool = True,
) -> DataFrame:
    """Append wer / n_ref_words / n_edits columns (map-only)."""
    s = wer_udf(normalize)(F.col(hyp_col), F.col(ref_col))
    return (
        df.withColumn("_w", s)
        .withColumn("wer", F.col("_w.wer"))
        .withColumn("n_ref_words", F.col("_w.n_ref_words"))
        .withColumn("n_edits", F.col("_w.n_edits"))
        .drop("_w")
    )


def cer(hyp: Column, ref: Column) -> Column:
    """Character error rate — JVM levenshtein over the normalized
    strings divided by normalized reference length (floor 1). Pure
    codegen'd Columns; DuckDB replays it exactly."""
    nh = F.regexp_replace(F.lower(hyp), r"[^\w\s]|_", " ")
    nr = F.regexp_replace(F.lower(ref), r"[^\w\s]|_", " ")
    nh = F.trim(F.regexp_replace(nh, r"\s+", " "))
    nr = F.trim(F.regexp_replace(nr, r"\s+", " "))
    return F.levenshtein(nh, nr) / F.greatest(F.length(nr), F.lit(1))


def transcript_agreement_gate(
    df: DataFrame,
    max_wer: float = 0.3,
    hyp_col: str = "transcript",
    ref_col: str = "ref_transcript",
) -> DataFrame:
    """Curation gate: keep rows whose transcripts agree (wer <= max_wer;
    rows where either side is missing fail closed)."""
    out = with_wer(df, hyp_col=hyp_col, ref_col=ref_col)
    return out.withColumn(
        "keep_transcript",
        F.coalesce(F.col("wer") <= F.lit(float(max_wer)), F.lit(False)),
    )
