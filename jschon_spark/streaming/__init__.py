"""Structured Streaming validation.

The compiled schema predicates are ordinary Column expressions, so the
same CompiledSchema drives ``readStream`` sources unchanged. Streaming
adds: event-time watermarks for late rows and windowed violation-count
aggregation (≙ the flag output rolled up per window instead of per
partition).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jschon_spark.compiler import CompiledSchema


def validate_stream(
    stream_df: DataFrame,
    compiled: CompiledSchema,
    instance_columns: Optional[list[str]] = None,
) -> DataFrame:
    """Append valid/violations to a streaming DataFrame — identical
    plan fragments as the batch path (Catalyst treats them the same)."""
    return compiled.validate(stream_df, instance_columns=instance_columns)


def windowed_flag_summary(
    validated: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-event-time-window pass/fail counts with a watermark bounding
    state (late rows beyond the watermark are dropped — documented
    streaming semantics, not a silent loss)."""
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("valid").cast("long")).alias("n_valid"),
            F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
            F.min("valid").alias("window_valid"),
        )
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_rows", "n_valid", "n_invalid", "window_valid")
    )
