"""PII scrubbing: replacement tokens, masked-chain counting (an IPv4's
digits must not double-count as a phone), and JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.text import scrub_pii, with_pii_scrub


def scrub(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(scrub_pii(F.col("text"))).collect()[0][0]


def counts(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return with_pii_scrub(df).collect()[0].asDict()


def test_email_scrub(spark):
    assert scrub(spark, "mail me at jane.doe+spam@sub.example.co.uk today") == (
        "mail me at <EMAIL> today"
    )


def test_ipv4_scrub_not_phone(spark):
    row = counts(spark, "server at 192.168.100.200 responded")
    assert row["n_ipv4"] == 1 and row["n_phone"] == 0 and row["n_email"] == 0
    assert row["scrubbed_text"] == "server at <IP> responded"


def test_phone_scrub(spark):
    row = counts(spark, "call +1 (415) 555-0123 now")
    assert row["n_phone"] == 1
    assert row["scrubbed_text"] == "call <PHONE> now"


def test_mixed_document(spark):
    text = "a@b.io or 10.0.0.7 or +44 20 7946 0958 end"
    row = counts(spark, text)
    assert (row["n_email"], row["n_ipv4"], row["n_phone"]) == (1, 1, 1)
    assert row["scrubbed_text"] == "<EMAIL> or <IP> or <PHONE> end"


def test_clean_text_untouched(spark):
    text = "nothing sensitive here, just words and the number 42"
    row = counts(spark, text)
    assert (row["n_email"], row["n_ipv4"], row["n_phone"]) == (0, 0, 0)
    assert row["scrubbed_text"] == text


def test_jvm_only_plan(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = with_pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
