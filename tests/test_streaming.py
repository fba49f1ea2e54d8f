"""Structured Streaming validation end-to-end: file source → compiled
schema predicates → watermarked windowed flag rollup → memory sink.

The compiled predicates are ordinary Column expressions, so the same
CompiledSchema drives batch and streaming identically (SURVEY.md §2.6
flag output, per-window instead of per-partition).
"""

import datetime as dt

import pandas as pd
import pytest

from jschon_spark.compiler import compile_schema
from jschon_spark.streaming import validate_stream, windowed_flag_summary

SCHEMA = {
    "type": "object",
    "required": ["event_type"],
    "properties": {
        "value": {"type": "number", "minimum": 0, "maximum": 100},
        "event_type": {"enum": ["click", "view", "purchase"]},
    },
}

DDL = "ts timestamp, event_type string, value double"

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)


def _rows():
    rows = []
    for minute in range(3):
        for i in range(10):
            ts = BASE + dt.timedelta(minutes=minute, seconds=i * 5)
            # one enum violation + one maximum violation in minute 1
            if minute == 1 and i == 0:
                rows.append((ts, "bogus", 5.0))
            elif minute == 1 and i == 1:
                rows.append((ts, "click", 500.0))
            else:
                rows.append((ts, "view", float(i)))
    return rows


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    pdf = pd.DataFrame(_rows(), columns=["ts", "event_type", "value"])
    spark.createDataFrame(pdf, schema=DDL).coalesce(1).write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in")


def test_streaming_windowed_flag(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(DDL).parquet(stream_dir)
    assert stream.isStreaming
    validated = validate_stream(stream, compile_schema(SCHEMA), instance_columns=["event_type", "value"])
    windowed = windowed_flag_summary(validated, ts_col="ts", window_duration="1 minute", watermark="5 minutes")
    q = (
        windowed.writeStream.format("memory")
        .queryName("flag_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from flag_sink order by window_start").toPandas()
    finally:
        q.stop()
    assert len(out) == 3
    assert out["n_rows"].tolist() == [10, 10, 10]
    assert out["n_invalid"].tolist() == [0, 2, 0]
    assert out["window_valid"].tolist() == [True, False, True]


def test_streaming_violations_rows(spark, stream_dir, tmp_path):
    """basic-format violation rows also stream (append mode, row-level)."""
    from jschon_spark.output import basic_output

    stream = spark.readStream.schema(DDL).parquet(stream_dir)
    validated = validate_stream(stream, compile_schema(SCHEMA), instance_columns=["event_type", "value"])
    viols = basic_output(validated, ["ts"])
    q = (
        viols.writeStream.format("memory")
        .queryName("viol_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from viol_sink").toPandas()
    finally:
        q.stop()
    assert sorted(out["keyword"].tolist()) == ["enum", "maximum"]
