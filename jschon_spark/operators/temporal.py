"""Temporal joins: as-of (point-in-time) join.

The as-of join — each left row picks the latest right row with
``right_ts <= left_ts`` per key (``direction="backward"``; "forward"
takes the earliest ``right_ts >= left_ts``) — is the workhorse of
point-in-time feature lookup (no leakage from the future) and event
attribution.

Spark-first strategy: NOT a range join (an inequality join degenerates
to a per-key cross product that explodes on hot keys) and NOT a
broadcast loop. Instead the classic union+window formulation:

1. tag both sides and UNION their key/ts columns (right side carries
   its payload, left side nulls),
2. one window per key ordered by (ts, side) computes
   ``last(right_payload, ignorenulls=true)`` — the running "most
   recent right row seen",
3. keep the left rows: their filled payload IS the as-of match.

Cost: ONE shuffle of (keys + right payload) on the join key and one
sort within partitions — the same shape as any groupBy, linear in
|left| + |right|, hot keys sort locally instead of exploding. At equal
timestamps the right row sorts first, so ``right_ts == left_ts``
matches (ASOF >= semantics, same as DuckDB's ASOF JOIN, which the
driver oracle uses).

Reference scope note: handrews/jschon has no table operators; this is
part of the training-pipeline surface (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: every ``left`` row, plus the payload of the latest
    ``right`` row at-or-before its timestamp (backward) / earliest
    at-or-after (forward) with equal ``on`` keys; nulls when none
    exists (left-outer semantics). ``tolerance_seconds`` additionally
    nulls matches further away than the given age."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    rpay = [c for c in right.columns if c not in on]
    lkeep = [c for c in left.columns]
    rnames = {c: (c + suffix if c in lkeep else c) for c in rpay}

    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*lkeep).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*rpay).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lkeep).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rpay).alias("_r"),
    )
    unioned = lt.unionByName(rt)

    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if direction == "forward":
        order = [F.col("_ts").desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))

    out = filled.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        age = F.abs(
            F.col("_ts").cast("double") - F.col("_match." + right_ts).cast("double")
        )
        out = out.withColumn(
            "_match", F.when(age <= tolerance_seconds, F.col("_match"))
        )
    cols = [F.col(f"_l.{c}").alias(c) for c in lkeep]
    cols += [F.col(f"_match.{c}").alias(rnames[c]) for c in rpay]
    return out.select(*cols)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessionization: events of one user belong to the same
    session while consecutive gaps stay <= ``gap_minutes``. Appends
    ``is_session_start`` and the per-user 1-based ``session_idx``.

    Scale shape: ONE hash-partition shuffle on the user key + an
    in-partition sort — the canonical sessionize plan; a hot key (bot
    user) sorts in one partition instead of exploding (AQE skew split
    applies). Tie-break on ``order_col`` keeps the assignment
    deterministic under equal timestamps. Timestamps are compared in
    microseconds via unix_micros; TIMESTAMP_NTZ columns are cast so the
    session-timezone shift cancels in the difference."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    start = prev.isNull() | ((us - prev) > int(gap_minutes * 60_000_000))
    run = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", start).withColumn(
        "session_idx", F.sum(F.col("is_session_start").cast("int")).over(run)
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup over `sessionize`: event count, first/last
    timestamp, duration in seconds. One additional map-side-combinable
    aggregation on (user, session_idx) — same partitioning as the
    sessionize shuffle, so AQE reuses the exchange."""
    s = sessionize(df, user_col, ts_col, order_col, gap_minutes)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            ((F.max(us) - F.min(us)) / 1e6).alias("duration_s"),
        )
    )
