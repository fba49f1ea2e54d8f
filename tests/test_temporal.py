"""As-of join (operators/temporal.py): backward/forward semantics,
equal-timestamp inclusion, tolerance, missing matches, and plan shape
(one exchange on the key, no range-join explosion)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "L10"),
            (1, _ts(20), "L20"),
            (1, _ts(5), "L5"),
            (2, _ts(10), "Lk2"),
            (3, _ts(10), "Lk3"),  # key with no right rows
        ],
        "k int, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), "R8"),
            (1, _ts(10), "R10"),  # equal ts with L10
            (1, _ts(15), "R15"),
            (2, _ts(30), "R30"),  # only after the left row
        ],
        "k int, ts timestamp, rval string",
    )
    return left, right


def test_backward(spark, frames):
    left, right = frames
    got = {r["lval"]: r for r in asof_join(left, right, on=["k"]).collect()}
    assert got["L5"]["rval"] is None  # nothing at or before t=5
    assert got["L10"]["rval"] == "R10"  # equal ts matches (>= semantics)
    assert got["L20"]["rval"] == "R15"  # latest at-or-before
    assert got["Lk2"]["rval"] is None  # right row only in the future
    assert got["Lk3"]["rval"] is None  # no right rows for the key
    assert got["L20"]["ts_right"] == _ts(15)


def test_forward(spark, frames):
    left, right = frames
    got = {
        r["lval"]: r
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert got["L5"]["rval"] == "R8"
    assert got["L10"]["rval"] == "R10"
    assert got["L20"]["rval"] is None
    assert got["Lk2"]["rval"] == "R30"


def test_tolerance(spark, frames):
    left, right = frames
    got = {
        r["lval"]: r
        for r in asof_join(left, right, on=["k"], tolerance_seconds=3).collect()
    }
    assert got["L10"]["rval"] == "R10"  # age 0
    assert got["L20"]["rval"] is None  # R15 is 5s old > 3s


def test_plan_single_exchange_no_range_join(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2  # the union sides
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ sessionize


def _sess_df(spark):
    from datetime import datetime

    rows = [
        # user 1: 3 events, gap of 31 min splits after the second
        (0, datetime(2024, 1, 1, 10, 0, 0), 1),
        (1, datetime(2024, 1, 1, 10, 20, 0), 1),
        (2, datetime(2024, 1, 1, 10, 51, 0), 1),
        # user 2: exactly 30-min gap stays in one session (> not >=)
        (3, datetime(2024, 1, 1, 9, 0, 0), 2),
        (4, datetime(2024, 1, 1, 9, 30, 0), 2),
        # user 2: same-timestamp tie-break by event_id
        (5, datetime(2024, 1, 1, 12, 0, 0), 2),
        (6, datetime(2024, 1, 1, 12, 0, 0), 2),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")


def test_sessionize_values(spark):
    from jschon_spark.operators.temporal import sessionize

    out = {r["event_id"]: r for r in sessionize(_sess_df(spark)).collect()}
    assert [out[i]["session_idx"] for i in range(3)] == [1, 1, 2]
    assert out[2]["is_session_start"]
    # boundary: exactly 30 minutes does NOT split
    assert out[4]["session_idx"] == 1 and not out[4]["is_session_start"]
    # 12:00 events are a new session; equal timestamps share it
    assert out[5]["session_idx"] == 2 and out[6]["session_idx"] == 2
    assert out[5]["is_session_start"] and not out[6]["is_session_start"]


def test_session_stats_values(spark):
    from jschon_spark.operators.temporal import session_stats

    out = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(_sess_df(spark)).collect()
    }
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["duration_s"] == 1200.0
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["duration_s"] == 0.0
    assert out[(2, 1)]["n_events"] == 2 and out[(2, 1)]["duration_s"] == 1800.0
    assert out[(2, 2)]["n_events"] == 2


def test_sessionize_one_shuffle(spark):
    from jschon_spark.operators.temporal import sessionize

    plan = sessionize(_sess_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hash partition on the user key
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
