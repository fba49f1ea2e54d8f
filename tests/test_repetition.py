"""Gopher-style repetition signals: hand-computed fractions on planted
repetitive/list-like documents, gate behavior, and JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.text import (
    repetition_columns,
    repetition_gate,
    with_repetition_signals,
    word_ngrams,
    word_ngrams_all,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spam spam spam spam spam spam"),                # all dup 2-grams
        (1, "one two three four five six"),                  # no repetition
        (2, "line a\nline a\nline b"),                       # 1/3 dup lines
        (3, "- item one\n- item two\n- item three\nintro"),  # 3/4 bullet lines
        (4, "to be continued...\nmore text..."),             # ellipsis lines
        (5, ""),                                             # empty: all zeros
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def sig(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    cols = repetition_columns(F.col("text"))
    row = df.select(*[c.alias(k) for k, c in cols.items()]).collect()[0]
    return row.asDict()


def test_all_dup_2grams(spark):
    s = sig(spark, "spam spam spam spam spam spam")
    # 5 bigrams, 1 distinct -> 4/5; 4 trigrams, 1 distinct -> 3/4
    assert s["dup_2gram_fraction"] == pytest.approx(4 / 5)
    assert s["dup_3gram_fraction"] == pytest.approx(3 / 4)


def test_clean_doc_zero_fractions(spark):
    s = sig(spark, "one two three four five six")
    assert s["dup_2gram_fraction"] == 0.0
    assert s["dup_3gram_fraction"] == 0.0
    assert s["dup_line_fraction"] == 0.0


def test_dup_lines_and_bullets(spark):
    s = sig(spark, "line a\nline a\nline b")
    assert s["n_lines"] == 3
    assert s["dup_line_fraction"] == pytest.approx(1 / 3)
    s = sig(spark, "- item one\n- item two\n- item three\nintro")
    assert s["bullet_line_fraction"] == pytest.approx(3 / 4)
    s = sig(spark, "to be continued...\nmore text...")
    assert s["ellipsis_line_fraction"] == 1.0


def test_empty_doc_all_zero(spark):
    s = sig(spark, "")
    assert s["n_lines"] == 0
    assert all(
        s[k] == 0.0
        for k in (
            "dup_line_fraction",
            "dup_2gram_fraction",
            "dup_3gram_fraction",
            "bullet_line_fraction",
            "ellipsis_line_fraction",
        )
    )


def test_gate_and_signals_stage(spark, docs):
    out = {r["doc_id"]: r for r in with_repetition_signals(docs).collect()}
    assert not out[0]["repetition_ok"]  # duplicate-gram spam
    assert out[1]["repetition_ok"]
    assert not out[2]["repetition_ok"]  # 1/3 dup lines > 0.30
    assert not out[4]["repetition_ok"]  # ellipsis lines > 0.30
    assert out[5]["repetition_ok"]      # empty doc: zeros pass (length gates live elsewhere)


def test_word_ngrams_all_vs_distinct(spark):
    df = spark.createDataFrame([("a b a b a",)], "t string")
    all_g = df.select(word_ngrams_all(F.col("t"), 2)).collect()[0][0]
    dis_g = df.select(word_ngrams(F.col("t"), 2)).collect()[0][0]
    assert all_g == ["a b", "b a", "a b", "b a"]
    assert sorted(dis_g) == ["a b", "b a"]


def test_jvm_only_plan(spark, docs):
    plan = with_repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection, map-only
