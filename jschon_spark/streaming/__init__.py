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


def running_flag_state(
    validated: DataFrame,
    key_col: str = "part_id",
    valid_col: str = "valid",
) -> DataFrame:
    """CUSTOM STATEFUL operator: cumulative per-partition pass/fail
    counters maintained across micro-batches via
    ``applyInPandasWithState`` — the streaming analogue of the batch
    ``flag_summary`` where each trigger emits the RUNNING totals for
    every partition it touched (state = two longs per partition, so
    state size is bounded by partition count, not row count)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = validated.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_rows long, n_valid long, n_invalid long, partition_valid boolean"
    )
    state_schema = "n_rows long, n_valid long"

    def update(key, pdfs, state: GroupState):
        rows = 0
        valid = 0
        for pdf in pdfs:
            rows += len(pdf)
            valid += int(pdf[valid_col].fillna(False).astype(bool).sum())
        prev_rows, prev_valid = state.get if state.exists else (0, 0)
        n_rows, n_valid = prev_rows + rows, prev_valid + valid
        state.update((n_rows, n_valid))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n_rows],
                "n_valid": [n_valid],
                "n_invalid": [n_rows - n_valid],
                "partition_valid": [n_valid == n_rows],
            }
        )

    return validated.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash
    within the watermark horizon passes, replays/duplicates are
    dropped. Built on ``dropDuplicatesWithinWatermark`` (state expiry
    handled by the engine — bounded state, no custom bookkeeping)."""
    return (
        stream_df.withColumn("content_hash", F.md5(F.col(content_col).cast("binary")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
