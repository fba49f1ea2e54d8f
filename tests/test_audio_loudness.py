"""BS.1770 / EBU R128 loudness: kernel math pinned to the spec's own
calibration points (997 Hz 0 dBFS sine = -3.01 LUFS; the 48 kHz
K-weighting coefficient table reproduced to 1e-10), gating behavior,
true-peak oversampling, and the distributed mapInArrow stage."""

import numpy as np
import pytest

from jschon_spark import fixtures as fx
from jschon_spark.audio.loudness import (
    DB_FLOOR,
    _k_highpass,
    _k_shelf,
    clip_loudness,
    loudness_gate,
    r128_gain_db,
    with_loudness,
)

SR = 48000


def tone(f: float, amp: float = 1.0, sr: int = SR, dur: float = 2.0) -> np.ndarray:
    t = np.arange(int(dur * sr)) / sr
    return np.clip(amp * np.sin(2 * np.pi * f * t) * 32767, -32768, 32767).astype(
        np.int16
    )


# ------------------------------------------------------------- filter design


def test_48k_coefficients_match_itu_table():
    """The rate-parametric design must reproduce BS.1770-4's published
    48 kHz biquad tables (shelf + high-pass) exactly."""
    b, a = _k_shelf(48000)
    np.testing.assert_allclose(
        b, [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=1e-10
    )
    np.testing.assert_allclose(a[1:], [-1.69065929318241, 0.73248077421585], atol=1e-10)
    b, a = _k_highpass(48000)
    np.testing.assert_allclose(b, [1.0, -2.0, 1.0], atol=0)
    np.testing.assert_allclose(a[1:], [-1.99004745483398, 0.99007225036621], atol=1e-10)


# ------------------------------------------------------------- kernel math


def test_spec_calibration_point():
    """BS.1770-4: a 997 Hz 0 dBFS sine reads -3.01 LKFS."""
    li, mom, _st, _lra, tp, nblk = clip_loudness(tone(997), SR, {})
    assert li == pytest.approx(-3.01, abs=0.05)
    assert mom == pytest.approx(-3.01, abs=0.05)
    assert tp == pytest.approx(0.0, abs=0.05)  # full-scale sine
    assert nblk == 17  # 2 s, 400 ms blocks at 100 ms hop


def test_linearity_in_level():
    li20, *_ = clip_loudness(tone(997, 0.1), SR, {})
    assert li20 == pytest.approx(-23.01, abs=0.05)


@pytest.mark.parametrize("sr", [8000, 16000, 44100])
def test_rate_parametric_design(sr):
    """The calibration point must hold at non-48k rates (filters are
    redesigned per rate, not resampled)."""
    li, *_ = clip_loudness(tone(997, 1.0, sr), sr, {})
    assert li == pytest.approx(-3.01, abs=0.08)


def test_k_weighting_shape():
    """+~4 dB shelf above ~2 kHz; strong attenuation below the 38 Hz
    high-pass corner."""
    ref, *_ = clip_loudness(tone(997), SR, {})
    hi, *_ = clip_loudness(tone(10000), SR, {})
    lo, *_ = clip_loudness(tone(30), SR, {})
    assert hi - ref == pytest.approx(4.0, abs=0.8)
    assert lo < ref - 7.0


def test_gating_rejects_silence():
    """0.5 s tone + 3.5 s silence: gated integrated loudness stays near
    the burst's own level instead of being diluted 9 dB by silence."""
    x = np.concatenate([tone(997, 1.0, dur=0.5), np.zeros(int(3.5 * SR), np.int16)])
    li, mom, _st, _lra, _, nblk = clip_loudness(x, SR, {})
    ungated = -0.691 + 10 * np.log10(np.mean((x / 32768.0) ** 2) * 2.4)  # ~ -12
    assert li == pytest.approx(-3.7, abs=1.2)  # boundary blocks admit some silence
    assert li > ungated + 4.0
    assert mom == pytest.approx(-3.01, abs=0.1)
    assert 0 < nblk < 17


def test_true_peak_sees_intersample_overs():
    """f = sr/4 with 45-degree phase: every SAMPLE is at 0.707 of the
    true crest; 4x bandlimited oversampling must recover ~0 dBTP."""
    n = SR // 2
    x = (0.999 * np.sin(2 * np.pi * (SR / 4) * np.arange(n) / SR + np.pi / 4) * 32767)
    li, mom, _st, _lra, tp, _ = clip_loudness(x.astype(np.int16), SR, {})
    sample_peak_db = 20 * np.log10(np.max(np.abs(x)) / 32768.0)
    assert sample_peak_db < -2.9
    assert tp == pytest.approx(0.0, abs=0.3)


def test_short_clip_single_block():
    """Clips shorter than one 400 ms gating block: whole-clip estimate,
    n_gating_blocks = 0 flags the sub-spec measurement."""
    li, mom, _st, _lra, _, nblk = clip_loudness(tone(997, 0.5, 16000, 0.3), 16000, {})
    assert nblk == 0
    assert li == pytest.approx(-3.01 - 6.02, abs=0.3)
    assert li == mom


def test_degenerate_payloads():
    out = clip_loudness(np.zeros(0, np.int16), SR, {})
    assert (out[0], out[1], out[4], out[5]) == (DB_FLOOR, DB_FLOOR, DB_FLOOR, 0)
    li, mom, _st, _lra, tp, nblk = clip_loudness(np.zeros(SR, np.int16), SR, {})
    assert li == DB_FLOOR and tp == DB_FLOOR and nblk == 0


# ------------------------------------------------------------- Spark stage


@pytest.fixture(scope="module")
def clips_loudness(spark):
    pdf = fx.gen_clips_batch(np.arange(300), audio=True)
    df = spark.createDataFrame(pdf, schema=fx.CLIPS_DDL)
    out = with_loudness(df)
    out = out.withColumn("gain", r128_gain_db(-23.0))
    return loudness_gate(out).toPandas().set_index("clip_id")


def test_stage_drops_bytes_and_measures(clips_loudness):
    assert "bytes" not in clips_loudness.columns
    assert clips_loudness["loudness_ok"].mean() > 0.95


def test_stage_matches_kernel_row(clips_loudness):
    pdf = fx.gen_clips_batch(np.arange(10), audio=True)
    row = pdf.iloc[0]
    from jschon_spark.audio import decode_pcm

    dec, hdr_sr = decode_pcm(row["bytes"], row["codec"])
    expected = clip_loudness(dec, hdr_sr or int(row["sr_hz"]), {})
    got = clips_loudness.loc[row["clip_id"]]
    assert got["integrated_lufs"] == pytest.approx(expected[0], abs=1e-9)
    assert got["true_peak_dbtp"] == pytest.approx(expected[4], abs=1e-9)
    assert got["n_gating_blocks"] == expected[5]


def test_normalization_gain_column(clips_loudness):
    ok = clips_loudness[clips_loudness["loudness_ok"]]
    measurable = ok[ok["integrated_lufs"] > DB_FLOOR]
    np.testing.assert_allclose(
        measurable["gain"], -23.0 - measurable["integrated_lufs"], atol=1e-9
    )


def test_gate_columns(clips_loudness):
    ok = clips_loudness[clips_loudness["loudness_ok"]]
    keep = ok[ok["keep_loudness"]]
    assert (keep["integrated_lufs"] >= -45.0).all()
    assert (keep["integrated_lufs"] <= -5.0).all()
    assert (keep["true_peak_dbtp"] <= -0.1).all()
    # undecodable rows never pass the keep gate
    bad = clips_loudness[~clips_loudness["loudness_ok"]]
    assert (~bad["keep_loudness"].astype(bool)).all()


def test_stage_is_map_only(spark):
    """No shuffle: the measurement stage must stay map-side."""
    pdf = fx.gen_clips_batch(np.arange(50), audio=True)
    df = spark.createDataFrame(pdf, schema=fx.CLIPS_DDL)
    plan = with_loudness(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_loudness(spark, tmp_path):
    """with_loudness is a stateless mapInArrow stage, so it runs
    unchanged inside Structured Streaming; measurements match the
    batch kernel on the same payloads."""
    import datetime as dt

    t997 = tone(997, 0.5, 16000, 1.0)
    rows = [(dt.datetime(2026, 1, 1), "s0", t997.tobytes(), "pcm_s16le", 16000)]
    ddl = "ts timestamp, clip_id string, bytes binary, codec string, sr_hz int"
    src = tmp_path / "src_loud"
    src.mkdir()
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(src / "b.parquet"))
    stream = spark.readStream.schema(ddl).parquet(str(src / "*.parquet"))
    q = (
        with_loudness(stream)
        .writeStream.format("memory")
        .queryName("loud_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_loud"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT clip_id, loudness_ok, integrated_lufs FROM loud_sink"
        ).collect()
    finally:
        q.stop()
    assert len(out) == 1 and out[0]["loudness_ok"]
    expected = clip_loudness(t997, 16000, {})[0]
    assert out[0]["integrated_lufs"] == pytest.approx(expected, abs=1e-9)


# ------------------------------------------------------------- LRA / short-term


def test_lra_two_level_program():
    """12 s program: 6 s at -13 LUFS then 6 s at -33 LUFS. The 3 s
    short-term distribution is bimodal ~20 LU apart, so LRA ~ 20 and
    shortterm_max sits at the loud level."""
    x = np.concatenate([tone(997, 1.0, SR, 6.0), tone(997, 0.1, SR, 6.0)])
    li, mom, st, lra, tp, nblk = clip_loudness(x, SR, {})
    assert st == pytest.approx(-3.01, abs=0.2)
    assert lra == pytest.approx(20.0, abs=2.5)
    # integrated gates keep both levels (-33 is above mean-10? no: the
    # -10 LU relative gate drops the quiet half) -> integrated near loud
    assert li == pytest.approx(-3.2, abs=1.0)


def test_lra_steady_tone_is_zero():
    x = tone(997, 0.5, SR, 6.0)
    _, _, st, lra, _, _ = clip_loudness(x, SR, {})
    assert st == pytest.approx(-9.03, abs=0.2)
    assert lra == pytest.approx(0.0, abs=0.1)


def test_shortterm_nan_for_short_clips():
    out = clip_loudness(tone(997, 0.5, SR, 1.0), SR, {})
    assert np.isnan(out[2]) and np.isnan(out[3])
