"""Checkpoint manifest: partition-keyed lineage + metrics, resume via
anti-join (north rule requirement; no jschon counterpart).

The manifest is an append-only parquet table keyed by the (Iceberg-style)
partition id. A resumable run:

1. reads the manifest, takes the set of completed partitions,
2. anti-joins the pending partition list against it,
3. processes only pending partitions (partition-pruned scans via a
   ``part_id`` filter → directory pruning on the partitioned layout),
4. appends one manifest row per finished partition with metrics.

At 10^12 rows the manifest has one row per partition (thousands), so it
broadcasts trivially.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DDL = (
    "part_id int, run_id string, completed_at timestamp, n_rows long, "
    "n_valid long, n_invalid long, partition_valid boolean, source_path string"
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(MANIFEST_DDL).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_DDL)


def completed_partitions(spark: SparkSession, path: str) -> DataFrame:
    return read_manifest(spark, path).select("part_id").distinct()


def pending_partitions(spark: SparkSession, path: str, all_parts: DataFrame) -> DataFrame:
    """Partitions not yet recorded — the resume frontier."""
    done = completed_partitions(spark, path)
    return all_parts.join(F.broadcast(done), "part_id", "left_anti")


def append_results(
    spark: SparkSession,
    path: str,
    flag_rows: DataFrame,
    run_id: str,
    source_path: str = "",
) -> None:
    """Record per-partition flag summaries (lineage = run_id + source)."""
    (
        flag_rows.select(
            F.col("part_id").cast("int"),
            F.lit(run_id).alias("run_id"),
            F.current_timestamp().alias("completed_at"),
            F.col("n_rows").cast("long"),
            F.col("n_valid").cast("long"),
            F.col("n_invalid").cast("long"),
            F.col("partition_valid"),
            F.lit(source_path).alias("source_path"),
        ).write.mode("append").parquet(path)
    )


def new_run_id() -> str:
    return f"run-{int(time.time() * 1000):x}"


def read_committed(
    spark: SparkSession,
    manifest_path: str,
    outputs: DataFrame,
    partition_col: str = "part_id",
) -> DataFrame:
    """Filter an output table down to COMMITTED rows.

    Output parquet is append-only and written BEFORE the manifest row
    (see append_results callers), so a crash mid-run leaves orphan
    output rows tagged with a run_id that never reached the manifest.
    The manifest append is the commit point: semi-joining outputs on
    (partition, run_id) against it makes exactly-once reads out of
    at-least-once writes — the Iceberg-snapshot pattern in miniature.
    The manifest is one row per partition, so the join side broadcasts.
    """
    from pyspark.sql import Window

    # one winning run per partition (first commit by timestamp, run_id
    # tiebreak): two RACING runs that both processed a partition would
    # otherwise both be visible, duplicating rows
    m = read_manifest(spark, manifest_path).select(
        F.col("part_id").alias(partition_col), "run_id", "completed_at"
    )
    w = Window.partitionBy(partition_col).orderBy("completed_at", "run_id")
    committed = (
        m.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(partition_col, "run_id")
    )
    return outputs.join(F.broadcast(committed), [partition_col, "run_id"], "semi")
