"""jschon-style evaluation outputs over validated DataFrames.

``flag``  — per-row boolean, rolled up per partition
            (reference jschon/output.py:39-43)
``basic`` — flat violation rows with instance/keyword locations
            (reference jschon/output.py:46-70)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def basic_output(df: DataFrame, id_cols: list[str], violations_col: str = "violations") -> DataFrame:
    """Explode per-row violation arrays into `basic`-format rows:
    one row per failed keyword, addressed by instance/keyword paths."""
    v = F.explode(F.col(violations_col)).alias("v")
    return (
        df.where(F.size(violations_col) > 0)
        .select(*id_cols, v)
        .select(
            *id_cols,
            F.col("v.instance_path").alias("instance_path"),
            F.col("v.keyword_path").alias("keyword_path"),
            F.col("v.keyword").alias("keyword"),
            F.col("v.error").alias("error"),
        )
    )


def flag_summary(
    df: DataFrame, partition_col: str | Column, valid_col: str = "valid"
) -> DataFrame:
    """Per-partition pass/fail parity rows: the partition passes iff
    every row in it passed (``flag`` rolled up). Map-side partial
    aggregation keeps this a single cheap shuffle of tiny rows."""
    valid = F.col(valid_col)
    return (
        df.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(valid.cast("long")).alias("n_valid"),
            F.sum((~valid).cast("long")).alias("n_invalid"),
            F.min(valid).alias("partition_valid"),
        )
        .orderBy(partition_col)
    )


def violation_histogram(df: DataFrame, violations_col: str = "violations") -> DataFrame:
    """Counts by (keyword, keyword_path) — a quick profile of what
    failed across the table."""
    v = F.explode(F.col(violations_col)).alias("v")
    return (
        df.where(F.size(violations_col) > 0)
        .select(v)
        .groupBy(F.col("v.keyword").alias("keyword"), F.col("v.keyword_path").alias("keyword_path"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .orderBy(F.desc("n_violations"))
    )
