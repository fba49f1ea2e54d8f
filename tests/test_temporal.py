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
