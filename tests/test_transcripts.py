"""WER/CER transcript QA: the vectorized word-DP pinned against a
plain-Python reference DP and hand-computed cases, normalization
semantics, the Spark stage, and the CER Column vs Python levenshtein."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.transcripts import (
    _norm_words,
    cer,
    transcript_agreement_gate,
    wer_udf,
    with_wer,
    word_edit_distance,
)


def _ref_dp(a: list, b: list) -> int:
    """Textbook O(n*m) edit distance."""
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[n][m]


def test_word_dp_hand_cases():
    assert word_edit_distance([], []) == 0
    assert word_edit_distance(["a"], []) == 1
    assert word_edit_distance([], ["a", "b"]) == 2
    assert word_edit_distance(["a", "b", "c"], ["a", "b", "c"]) == 0
    assert word_edit_distance(["a", "x", "c"], ["a", "b", "c"]) == 1  # sub
    assert word_edit_distance(["a", "c"], ["a", "b", "c"]) == 1  # del from ref
    assert word_edit_distance(["a", "b", "b", "c"], ["a", "b", "c"]) == 1  # ins


def test_word_dp_matches_reference_dp():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    for _ in range(60):
        a = [vocab[i] for i in rng.integers(0, 12, rng.integers(0, 25))]
        b = [vocab[i] for i in rng.integers(0, 12, rng.integers(0, 25))]
        assert word_edit_distance(a, b) == _ref_dp(a, b), (a, b)


def test_normalization():
    assert _norm_words("Hello,   WORLD!") == ["hello", "world"]
    assert _norm_words("") == []


def test_with_wer_stage(spark):
    rows = pd.DataFrame(
        {
            "clip_id": ["a", "b", "c", "d", "e"],
            "transcript": [
                "the cat sat",
                "The CAT sat!",
                "the dog sat",
                None,
                "one two three four",
            ],
            "ref_transcript": [
                "the cat sat",
                "the cat sat",
                "the cat sat",
                "the cat sat",
                "",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = with_wer(df).toPandas().set_index("clip_id")
    assert out.loc["a", "wer"] == 0.0
    assert out.loc["b", "wer"] == 0.0  # normalization: case/punct-proof
    assert out.loc["c", "wer"] == pytest.approx(1 / 3)
    assert np.isnan(out.loc["d", "wer"])  # missing side
    assert out.loc["e", "wer"] == 4.0  # empty ref, floor 1
    gated = transcript_agreement_gate(df, max_wer=0.3).toPandas().set_index("clip_id")
    assert gated.loc["a", "keep_transcript"] and gated.loc["b", "keep_transcript"]
    assert not gated.loc["c", "keep_transcript"]  # 0.33 > 0.3
    assert not gated.loc["d", "keep_transcript"]  # fails closed


def test_cer_matches_python(spark):
    import re

    def norm(s):
        return re.sub(r"\s+", " ", re.sub(r"[^\w\s]|_", " ", s.lower())).strip()

    def lev(a, b):
        return _ref_dp(list(a), list(b))

    rows = [("x", "Kitten!", "sitting"), ("y", "same text", "same text"),
            ("z", "", "abc")]
    df = spark.createDataFrame(rows, "clip_id string, hyp string, ref string")
    got = (
        df.select("clip_id", cer(F.col("hyp"), F.col("ref")).alias("cer"))
        .toPandas()
        .set_index("clip_id")["cer"]
    )
    for cid, h, r in rows:
        nh, nr = norm(h), norm(r)
        assert got[cid] == pytest.approx(lev(nh, nr) / max(len(nr), 1)), cid


def test_wer_stage_is_map_only(spark):
    df = spark.createDataFrame(
        [("a", "x", "y")], "clip_id string, transcript string, ref_transcript string"
    )
    plan = with_wer(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_wer_cer_share_normalization(spark):
    """WER and CER strip underscores identically (r4 ADVICE: _norm_words
    kept '_' as a word char while cer() stripped it) — identical
    transcripts modulo underscores score 0 on BOTH metrics."""
    from jschon_spark.operators.transcripts import _norm_words, cer, with_wer

    assert _norm_words("hello_world foo") == ["hello", "world", "foo"]
    df = spark.createDataFrame(
        [("hello_world foo", "hello world foo")],
        "transcript string, ref_transcript string",
    )
    row = (
        with_wer(df)
        .withColumn("c", cer(F.col("transcript"), F.col("ref_transcript")))
        .collect()[0]
    )
    assert row["wer"] == 0.0
    assert row["c"] == 0.0
