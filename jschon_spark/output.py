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


def detailed_output(
    df: DataFrame,
    id_cols: list[str],
    violations_col: str = "violations",
    max_rows: int = 100,
) -> list[dict]:
    """jschon ``detailed`` output for a SAMPLE of failing rows: the flat
    `basic` violation rows re-nested into the pruned hierarchy keyed by
    keyword location (reference jschon/output.py:73-103). Tree-shaped
    and driver-side by design — at table scale the flat violations
    DataFrame is the product; this is the human-debugging view, so it
    is capped at ``max_rows`` documents."""
    rows = (
        df.where(F.size(violations_col) > 0)
        .select(*id_cols, F.col(violations_col).alias("_viols"))
        .limit(max_rows)
        .collect()
    )
    out = []
    for r in rows:
        root: dict = {
            "valid": False,
            "instanceLocation": "",
            "keywordLocation": "",
            "errors": [],
        }
        index: dict[str, dict] = {"": root}
        for v in sorted(r["_viols"], key=lambda v: v["keyword_path"]):
            segs = [s for s in v["keyword_path"].split("/") if s]
            parent = root
            prefix = ""
            # attach under the deepest existing ancestor node
            for s in segs[:-1]:
                prefix = f"{prefix}/{s}"
                if prefix in index:
                    parent = index[prefix]
            node = {
                "valid": False,
                "instanceLocation": v["instance_path"],
                "keywordLocation": v["keyword_path"],
                "error": v["error"],
            }
            index[v["keyword_path"]] = node
            parent.setdefault("errors", []).append(node)
        ident = {c: r[c] for c in id_cols}
        out.append({**ident, "result": root})
    return out


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
