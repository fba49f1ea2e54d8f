"""Energy-VAD speech segmentation: kernel math on hand-built signals
(silence, tones, gap bridging / blip dropping order), the distributed
stage against the fixture synthesis contract, and the within-segment
chunk plan's fencepost + offset arithmetic."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jschon_spark import fixtures as fx
from jschon_spark.audio.segments import (
    segment_chunk_plan,
    speech_segments_np,
    with_speech_segments,
)

SR = 16000


def tone(ms: int, amp: float = 0.5, f0: float = 440.0, sr: int = SR) -> np.ndarray:
    n = sr * ms // 1000
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * 32767 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)


def silence(ms: int, sr: int = SR) -> np.ndarray:
    return np.zeros(sr * ms // 1000, dtype=np.int16)


# ------------------------------------------------------------- kernel math


def test_silence_has_no_segments():
    assert speech_segments_np(silence(1000), SR) == []
    assert speech_segments_np(np.zeros(0, dtype=np.int16), SR) == []


def test_pure_tone_is_one_full_span_segment():
    segs = speech_segments_np(tone(1000), SR)
    assert segs == [(0, 1000)]


def test_long_gap_splits_segments():
    x = np.concatenate([tone(400), silence(300), tone(400)])
    segs = speech_segments_np(x, SR, min_gap_ms=100)
    assert segs == [(0, 400), (700, 1100)]


def test_short_gap_is_bridged():
    x = np.concatenate([tone(400), silence(80), tone(400)])
    segs = speech_segments_np(x, SR, min_gap_ms=100)
    assert segs == [(0, 880)]


def test_blip_dropped_but_bridged_blips_survive():
    # a lone 60 ms burst dies under min_segment_ms=100 ...
    assert speech_segments_np(tone(60), SR, min_segment_ms=100) == []
    # ... but two 60 ms bursts bridged across a 60 ms gap form one
    # 180 ms segment: bridging runs BEFORE the short-segment drop
    x = np.concatenate([tone(60), silence(60), tone(60)])
    assert speech_segments_np(x, SR, min_gap_ms=100, min_segment_ms=100) == [(0, 180)]


def test_sub_frame_tail_dropped():
    # 1010 ms = 50 full 20 ms frames + a 10 ms tail: tail never counts
    segs = speech_segments_np(tone(1010), SR)
    assert segs == [(0, 1000)]


def test_threshold_gate():
    # -50 dBFS tone sits below the -45 dBFS default gate
    quiet = tone(500, amp=10 ** (-50 / 20))
    assert speech_segments_np(quiet, SR) == []
    assert speech_segments_np(quiet, SR, threshold_dbfs=-55.0) == [(0, 500)]


# ------------------------------------------------------------ Spark stage


@pytest.fixture(scope="module")
def seg_pdf(spark):
    pdf = fx.gen_clips_batch(np.arange(300), audio=True)
    # fault injection: row 0 = leading+trailing silence around speech,
    # row 1 = pure silence, row 2 = undecodable codec
    sr0 = int(pdf.loc[0, "sr_hz"])
    x0 = np.concatenate(
        [silence(500, sr0), tone(1000, sr=sr0), silence(500, sr0)]
    )
    pdf.loc[0, "bytes"] = x0.tobytes()
    pdf.loc[0, "codec"] = "pcm_s16le"
    pdf.loc[0, "dur_ms"] = 2000
    pdf.loc[1, "bytes"] = silence(800, int(pdf.loc[1, "sr_hz"])).tobytes()
    pdf.loc[1, "codec"] = "pcm_s16le"
    pdf.loc[2, "codec"] = "opus"
    df = spark.createDataFrame(pdf, schema=fx.CLIPS_DDL)
    out = with_speech_segments(df).toPandas().set_index("clip_id")
    return pdf, out


def test_stage_trims_silence_padding(seg_pdf):
    pdf, out = seg_pdf
    row = out.loc[pdf.loc[0, "clip_id"]]
    assert bool(row["segments_ok"])
    segs = list(row["segments"])
    assert len(segs) == 1
    assert segs[0]["start_ms"] == 500 and segs[0]["end_ms"] == 1500
    assert row["speech_ms"] == 1000


def test_stage_silence_and_undecodable_rows(seg_pdf):
    pdf, out = seg_pdf
    silent = out.loc[pdf.loc[1, "clip_id"]]
    assert bool(silent["segments_ok"]) and list(silent["segments"]) == []
    assert silent["speech_ms"] == 0
    bad = out.loc[pdf.loc[2, "clip_id"]]
    assert not bool(bad["segments_ok"]) and bad["segments"] is None


def test_stage_drops_bytes_and_bounds_speech(seg_pdf):
    pdf, out = seg_pdf
    assert "bytes" not in out.columns
    ok = out[out["segments_ok"]]
    assert len(ok) > 250  # fixture corpus decodes
    # speech never exceeds the clip duration (frame-grid rounding only
    # ever shortens), and fixture tones are mostly speech-active
    assert (ok["speech_ms"] <= ok["dur_ms"].astype("int64") + 20).all()


def test_stage_matches_kernel_row(seg_pdf):
    pdf, out = seg_pdf
    from jschon_spark.audio import decode_pcm

    row = pdf.iloc[5]
    dec, hdr_sr = decode_pcm(row["bytes"], row["codec"])
    sr = hdr_sr or int(row["sr_hz"])
    expected = speech_segments_np(dec, sr)
    got = [(s["start_ms"], s["end_ms"]) for s in out.loc[row["clip_id"], "segments"]]
    assert got == expected


# --------------------------------------------------------- chunk planning


def chunks(spark, segs, sr=16000, window_ms=5000, hop_ms=4000):
    df = spark.createDataFrame(
        [("c1", sr, [{"start_ms": a, "end_ms": b} for a, b in segs])],
        "clip_id string, sr_hz int, segments array<struct<start_ms:long,end_ms:long>>",
    )
    return [
        r.asDict()
        for r in segment_chunk_plan(df, window_ms=window_ms, hop_ms=hop_ms)
        .orderBy("seg_idx", "chunk_idx")
        .collect()
    ]


def test_chunk_plan_fencepost(spark):
    # exactly one window -> one chunk; one ms past -> two
    assert len(chunks(spark, [(0, 5000)])) == 1
    got = chunks(spark, [(0, 5001)])
    assert [(c["start_ms"], c["end_ms"]) for c in got] == [(0, 5000), (4000, 5001)]


def test_chunk_plan_offsets_onto_clip_timeline(spark):
    got = chunks(spark, [(2000, 7000), (9000, 10000)])
    assert [(c["seg_idx"], c["start_ms"], c["end_ms"]) for c in got] == [
        (0, 2000, 7000),
        (1, 9000, 10000),
    ]
    # n_samples follows the chunk duration at the row's rate
    assert got[0]["n_samples"] == 5000 * 16000 // 1000
    assert got[1]["n_samples"] == 1000 * 16000 // 1000


def test_chunks_never_straddle_gaps(spark):
    segs = [(500, 11500), (12000, 12500)]
    got = chunks(spark, segs)
    for c in got:
        a, b = segs[c["seg_idx"]]
        assert a <= c["start_ms"] < c["end_ms"] <= b


def test_chunk_plan_no_shuffle(spark):
    df = spark.createDataFrame(
        [("c1", 16000, [{"start_ms": 0, "end_ms": 9000}])],
        "clip_id string, sr_hz int, segments array<struct<start_ms:long,end_ms:long>>",
    )
    plan = segment_chunk_plan(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_plan_rejects_bad_params(spark):
    df = spark.range(1).select(
        F.lit("c").alias("clip_id"),
        F.lit(16000).alias("sr_hz"),
        F.lit(None).cast("array<struct<start_ms:long,end_ms:long>>").alias("segments"),
    )
    with pytest.raises(ValueError):
        segment_chunk_plan(df, hop_ms=0)
