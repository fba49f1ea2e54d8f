"""Speaking-rate / transcript-duration plausibility checks
(table_checks.speaking_rate_checks) — the transcript↔audio consistency
gate the north star's clip+transcript validation implies beyond exact
equality."""

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.table_checks import (
    speaking_rate_checks,
    speaking_rate_columns,
)

ROWS = [
    # clip_id, transcript, dur_ms            expected checks
    ("ok", "three words here now", 1500, []),                 # 2.67 wps, 13.3 cps
    ("slow", "hi", 10000, ["speaking_rate_low", "articulation_rate_low"]),  # 0.1 wps, 0.2 cps
    ("fast", " ".join(["w"] * 50), 1000, ["speaking_rate_high", "articulation_rate_high"]),
    ("chars", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", 1000,
     ["articulation_rate_high"]),                             # 1 wps ok, 50 cps high
    ("nullt", None, 1000, []),                                # required owns nulls
    ("zerod", "some words", 0, []),                           # minimum owns dur<=0
]


@pytest.fixture(scope="module")
def clips(spark):
    return spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in ROWS],
        "clip_id string, transcript string, dur_ms int",
    )


def test_expected_violations(spark, clips):
    got = speaking_rate_checks(clips).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["clip_id"], []).append(r["check"])
    want = {cid: checks for cid, _, _, checks in ROWS if checks}
    assert {k: sorted(v) for k, v in by_id.items()} == {
        k: sorted(v) for k, v in want.items()
    }


def test_rates_and_keywords(spark, clips):
    rows = {(r["clip_id"], r["check"]): r for r in speaking_rate_checks(clips).collect()}
    slow = rows[("slow", "speaking_rate_low")]
    assert slow["keyword"] == "speakingRate"
    assert abs(slow["words_per_sec"] - 0.1) < 1e-9
    aslow = rows[("slow", "articulation_rate_low")]
    assert aslow["keyword"] == "articulationRate"
    assert abs(aslow["chars_per_sec"] - 0.2) < 1e-9


def test_rate_columns_null_safety(spark, clips):
    cols = speaking_rate_columns(F.col("transcript"), F.col("dur_ms"))
    out = clips.select(
        "clip_id", cols["words_per_sec"].alias("wps"), cols["chars_per_sec"].alias("cps")
    ).collect()
    by_id = {r["clip_id"]: r for r in out}
    assert by_id["nullt"]["wps"] is None and by_id["nullt"]["cps"] is None
    assert by_id["zerod"]["wps"] is None and by_id["zerod"]["cps"] is None


def test_map_only_plan(spark, clips):
    """No shuffle anywhere: the check is a generate+project over the scan."""
    plan = speaking_rate_checks(clips)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
