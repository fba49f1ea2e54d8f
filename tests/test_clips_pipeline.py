"""End-to-end clips validation against the fixture oracle.

The fixture injects a known count of each violation (FIXTURES.md §1);
the pipeline must recover exactly those counts — this is the
"per-partition pass/fail parity" gate of BASELINE.md.
"""

import numpy as np
import pandas as pd
import pytest

from jschon_spark import fixtures as fx
from jschon_spark.pipeline import run_validation

N = 2000  # tiny scale


@pytest.fixture(scope="module")
def clips_df(spark):
    pdf = fx.gen_clips_batch(np.arange(N), audio=True)
    return spark.createDataFrame(pdf, schema=fx.CLIPS_DDL)


@pytest.fixture(scope="module")
def transcripts_df(spark):
    pdf = fx.gen_transcripts_batch(np.arange(N))
    return spark.createDataFrame(pdf, schema=fx.TRANSCRIPTS_DDL)


@pytest.fixture(scope="module")
def results(spark, clips_df, transcripts_df):
    return run_validation(
        spark, clips_df, transcripts_df, baseline=fx.baseline_snapshot(), audio=True
    )


def test_violation_counts_match_injection(results):
    expected = fx.expected_violation_counts(N)
    viols = results["violations"].toPandas()
    by_kw = viols.groupby("keyword").size().to_dict()
    assert by_kw.get("pattern", 0) == expected["pattern"]
    assert by_kw.get("enum", 0) == expected["enum"]
    assert by_kw.get("minimum", 0) == expected["minimum"]
    assert by_kw.get("maximum", 0) == expected["maximum"]
    assert by_kw.get("required", 0) == expected["required"]
    assert by_kw.get("maxLength", 0) == expected["maxLength"]


def test_flag_summary_partition_parity(results):
    flag = results["flag"].toPandas().set_index("part_id").sort_index()
    assert set(flag.index) == set(range(fx.N_PARTS))
    assert int(flag["n_rows"].sum()) == N
    # exact per-partition parity: a partition is invalid iff one of its
    # row ids carries a row-level injection slot
    row_slots = (fx.SLOT_PATTERN, fx.SLOT_ENUM, fx.SLOT_MIN, fx.SLOT_MAX, fx.SLOT_REQUIRED, fx.SLOT_MAXLEN)
    expected_invalid_parts = {
        i % fx.N_PARTS for i in range(N) if (i % fx.MOD) in row_slots
    }
    got_invalid_parts = set(flag.index[~flag["partition_valid"]])
    assert got_invalid_parts == expected_invalid_parts
    expected_total = sum(
        fx.expected_violation_counts(N)[k]
        for k in ["pattern", "enum", "minimum", "maximum", "required", "maxLength"]
    )
    assert int(flag["n_invalid"].sum()) == expected_total


def test_uniqueness_check(results):
    expected = fx.expected_violation_counts(N)
    dups = results["duplicates"].toPandas()
    assert int((dups["n_occurrences"] - 1).sum()) == expected["duplicate_clip_id"]


def test_referential_checks(results):
    expected = fx.expected_violation_counts(N)
    assert results["missing_transcripts"].count() == expected["missing_transcript_row"]
    assert results["orphan_transcripts"].count() == expected["orphan_transcript"]
    # duplicate clip_id pairs join both texts under one key → each dup
    # key also surfaces as a (genuine) mismatch
    assert (
        results["transcript_mismatches"].count()
        == expected["text_mismatch"] + expected["duplicate_clip_id"]
    )


def test_audio_invariant(results):
    expected = fx.expected_violation_counts(N)
    av = results["audio_violations"].toPandas()
    by_kw = av.groupby("keyword").size().to_dict()
    assert by_kw.get("snr", 0) == expected["snr"]
    assert by_kw.get("frames", 0) == expected["truncated"]
    assert by_kw.get("decode", 0) == 0


def test_drift_same_distribution_passes(results):
    drift = results["drift"]
    assert drift["ks_pass"], drift
    assert drift["psi_pass"], drift


def test_drift_shifted_distribution_fails(spark, clips_df):
    from pyspark.sql import functions as F

    from jschon_spark.operators.table_checks import drift_check

    shifted = clips_df.withColumn("dur_ms", (F.col("dur_ms") * 1.5).cast("int"))
    drift = drift_check(shifted, fx.baseline_snapshot())
    assert not drift["ks_pass"], drift


def test_column_stats(results):
    stats = results["stats"].toPandas().set_index("column_name")
    assert int(stats.loc["clip_id", "n_rows"]) == N
    assert stats.loc["transcript", "n_nulls"] > 0
    assert float(stats.loc["dur_ms", "null_rate"]) == 0.0


def test_manifest_resume(spark, clips_df, tmp_path):
    from jschon_spark import manifest as mf
    from jschon_spark.output import flag_summary
    from jschon_spark.pipeline import validate_clips_rows

    path = str(tmp_path / "manifest")
    all_parts = clips_df.select("part_id").distinct()
    pending0 = mf.pending_partitions(spark, path, all_parts)
    assert pending0.count() == fx.N_PARTS

    # complete half the partitions
    half = clips_df.where("part_id < 8")
    flags = flag_summary(validate_clips_rows(half), "part_id")
    mf.append_results(spark, path, flags, run_id="r1", source_path="fixture")
    pending1 = mf.pending_partitions(spark, path, all_parts)
    assert pending1.count() == fx.N_PARTS - 8
    assert set(r.part_id for r in pending1.collect()) == set(range(8, 16))


def test_audio_adversarial_payloads(spark):
    """Malformed payloads must produce decode violations, never crash
    the job (the reference raises at load; at table scale every bad row
    is a violation row — SURVEY §1.4)."""
    import io
    import struct
    import wave

    import numpy as np

    from jschon_spark.audio import with_audio_invariant
    from jschon_spark.fixtures import clip_seed, synth_pcm

    def wav_bytes(samples, sr, nch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(samples.astype("<i2").tobytes())
        return buf.getvalue()

    good = synth_pcm(clip_seed("clip-aa"), 16000, 1600)  # 100 ms @ 16 kHz
    stereo = np.repeat(good, 2)
    rows = [
        ("clip-aa", good.tobytes(), 16000, 100, "pcm_s16le"),  # pristine
        ("clip-ab", None, 16000, 100, "pcm_s16le"),  # null payload
        ("clip-ac", good.tobytes()[:-1], 16000, 100, "pcm_s16le"),  # odd length
        ("clip-ad", good.tobytes(), 16000, 100, "flac"),  # undecodable codec
        ("clip-ae", b"RIFFgarbage", 16000, 100, "wav"),  # corrupt header
        ("clip-af", wav_bytes(stereo, 16000, nch=2), 16000, 100, "wav"),  # stereo
        ("clip-ag", wav_bytes(good, 8000), 16000, 100, "wav"),  # header sr mismatch
        ("clip-ah", b"", 16000, 100, "pcm_s16le"),  # empty → 0 frames
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], 0) for r in rows],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, part_id int",
    )
    out = {r.clip_id: r for r in with_audio_invariant(df).collect()}
    assert out["clip-aa"].audio_valid is True
    for cid in ("clip-ab", "clip-ac", "clip-ad", "clip-ae", "clip-af", "clip-ag", "clip-ah"):
        assert out[cid].audio_valid is False, cid
        kws = {v.keyword for v in out[cid].audio_violations}
        assert kws, cid
    # decode failures vs frame-count failures are distinguished
    assert {v.keyword for v in out["clip-ae"].audio_violations} == {"decode"}
    assert {v.keyword for v in out["clip-ah"].audio_violations} == {"frames"}


def test_drift_statistics_matches_numpy_reference(spark):
    """The fully-distributed PSI/KS plan agrees with the driver-side
    numpy ks_statistic/psi_statistic on the same binned data."""
    import numpy as np
    import pandas as pd

    from jschon_spark.operators.table_checks import (
        drift_statistics,
        ks_statistic,
        psi_statistic,
    )

    rng = np.random.default_rng(7)
    cur = rng.normal(100.0, 20.0, 4000)
    base = rng.normal(110.0, 25.0, 5000)
    width = 10.0
    cur_df = spark.createDataFrame(pd.DataFrame({"v": cur}))
    base_df = spark.createDataFrame(pd.DataFrame({"v": base}))
    row = drift_statistics(cur_df, base_df, "v", width).collect()[0]

    def binned(x):
        b = np.floor(x / width).astype(int)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin_lo": u.astype(float), "count": c})

    cb, bb = binned(cur), binned(base)
    ks = ks_statistic(cb, bb)
    # psi_statistic clamps raw shares; drift_statistics uses the same
    # eps=1e-6 clamp on shares — compare to 6dp
    psi = psi_statistic(cb.rename(columns={"bin_lo": "k"}), bb.rename(columns={"bin_lo": "k"}), key="k")
    assert abs(row["ks"] - ks) < 1e-6, (row["ks"], ks)
    assert abs(row["psi"] - psi) < 1e-6, (row["psi"], psi)
    # drift against itself is exactly zero
    zero = drift_statistics(cur_df, cur_df, "v", width).collect()[0]
    assert zero["psi"] == 0.0 and zero["ks"] == 0.0


def test_drift_distributed_is_default_and_matches_driver_path(spark, clips_df):
    """Round-4 wiring: the pipeline's drift stage runs the fully
    distributed drift_plan (no driver-side binning — the only
    collect is the single stats row), and agrees with the legacy
    driver-side numpy drift_check on the same inputs."""
    from jschon_spark.operators.table_checks import (
        drift_check,
        drift_check_distributed,
        drift_plan,
    )

    baseline = fx.baseline_snapshot()
    meta = clips_df.drop("bytes")
    old = drift_check(meta, baseline)
    new = drift_check_distributed(meta, baseline)
    assert abs(old["ks_dur"] - new["ks_dur"]) < 1e-6, (old, new)
    assert abs(old["psi_sr"] - new["psi_sr"]) < 1e-6, (old, new)
    assert old["ks_pass"] == new["ks_pass"] and old["psi_pass"] == new["psi_pass"]

    # plan shape: binning happens in Spark aggregates (two hash
    # aggregations over the floor()/cast() bin keys), with no Python
    # evaluation anywhere in the plan
    qe = drift_plan(meta, baseline)._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    assert plan.count("Aggregate") >= 4, plan  # 2 bin counts + 2 totals (+ folds)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the bin key is a floor() expression (visible pre-optimization; the
    # optimizer may constant-fold it into a LocalRelation for tiny inputs)
    assert "FLOOR" in qe.analyzed().toString().upper()


def test_transcript_checks_single_join(spark):
    """Round-4: the three clip<->transcript referential checks come out
    of ONE full-outer join (both sides are fact-sized at 10^12 rows —
    three anti/anti/inner joins would shuffle both tables three times).
    Value semantics: hand-built rows covering all three categories plus
    agreeing/dup/null-key rows."""
    from jschon_spark.operators.table_checks import transcript_checks

    clips = spark.createDataFrame(
        [
            ("c1", "hello world"),   # agrees
            ("c2", "goodbye"),       # text differs -> mismatch
            ("c3", "no transcript"), # missing from side table
            ("c5", None),            # both null -> agrees (null-safe)
            ("c6", "dup"),           # duplicate key, one copy mismatches
            ("c6", "dup"),
            (None, "null key"),      # null key never matches -> missing
        ],
        "clip_id string, transcript string",
    )
    transcripts = spark.createDataFrame(
        [
            ("t1", "c1", "hello world"),
            ("t2", "c2", "goodbye!"),
            ("t4", "c4", "orphan row"),  # no such clip
            ("t5", "c5", None),
            ("t6", "c6", "dup"),
        ],
        "transcript_id string, clip_id string, text string",
    )
    got = transcript_checks(clips, transcripts)
    by = {}
    for r in got.collect():
        by.setdefault(r["check"], []).append(r)
    assert sorted(r["clip_id"] or "∅" for r in by["missing_transcript"]) == ["c3", "∅"]
    assert [(r["transcript_id"], r["clip_id"], r["text"]) for r in by["orphan_transcript"]] == [
        ("t4", "c4", "orphan row")
    ]
    assert sorted(r["clip_id"] for r in by["transcript_mismatch"]) == ["c2"]

    # plan: exactly one join, no Python (AQE plan strings repeat the
    # initial plan below the final one — look at the final section only)
    import re

    plan = got._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    joins = re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    assert len(joins) == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_transcript_outputs_schema_compat(spark, clips_df, transcripts_df):
    """The derived outputs keep their pre-combination schemas (consumers
    write them as-is)."""
    from jschon_spark.pipeline import run_validation

    out = run_validation(spark, clips_df, transcripts=transcripts_df, audio=False)
    assert out["missing_transcripts"].columns == [
        "clip_id", "instance_path", "keyword_path", "keyword", "error",
    ]
    assert out["orphan_transcripts"].columns == transcripts_df.columns
    assert out["transcript_mismatches"].columns == ["clip_id"]
    out["transcript_checks"].unpersist()


def test_categorical_histograms_one_pass_matches_per_column(spark, clips_df):
    """Round-4: both categorical histograms come from ONE grouping-sets
    scan; values match the per-column groupBys exactly (null data
    values included — grouping() disambiguates them)."""
    from jschon_spark.operators.table_checks import (
        categorical_histogram,
        categorical_histograms,
    )

    meta = clips_df.drop("bytes")
    combined = categorical_histograms(meta, ["codec", "sr_hz"])
    by: dict = {}
    for r in combined.collect():
        by.setdefault(r["column"], {})[r["value"]] = r["count"]
    for col in ("codec", "sr_hz"):
        per = {
            (str(r["value"]) if r["value"] is not None else None): r["count"]
            for r in categorical_histogram(meta, col).collect()
        }
        assert by[col] == per, col

    # plan: a single Exchange (one shuffle) feeds both histograms
    plan = combined._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan  # grouping-sets expansion, not two scans


def test_speaking_rate_stage_present_and_map_only(results):
    """run_validation exposes the transcript-duration plausibility check
    whenever transcript+dur_ms exist; plan stays shuffle-free."""
    sr = results["speaking_rate"]
    assert set(sr.columns) == {
        "clip_id", "keyword", "check", "words_per_sec", "chars_per_sec"
    }
    plan = sr._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # fixture transcripts are plausible for their durations by
    # construction; only injected violation rows may trip the band
    rows = sr.collect()
    assert all(r["keyword"] in ("speakingRate", "articulationRate") for r in rows)
