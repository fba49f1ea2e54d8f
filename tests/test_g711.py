"""G.711 µ-law / A-law decode: LUTs pinned to canonical spec values,
sign symmetry, monotonicity, round-trip SNR at the codec's theoretical
quality, and the zero-copy Spark stage path (features/loudness over
pcm_mulaw clips)."""

import numpy as np
import pytest

from jschon_spark.audio import ALAW_LUT, MULAW_LUT, decode_pcm

SR = 8000  # telephony


# ------------------------------------------------------------- table math


def test_mulaw_canonical_values():
    assert MULAW_LUT[0xFF] == 0  # positive zero
    assert MULAW_LUT[0x7F] == 0  # negative zero
    assert MULAW_LUT[0x80] == 32124  # max positive
    assert MULAW_LUT[0x00] == -32124  # max negative


def test_alaw_canonical_values():
    assert ALAW_LUT[0xD5] == 8  # smallest positive
    assert ALAW_LUT[0x55] == -8  # smallest negative
    assert ALAW_LUT[0xAA] == 32256  # max positive
    assert ALAW_LUT[0x2A] == -32256  # max negative


@pytest.mark.parametrize("lut", [MULAW_LUT, ALAW_LUT], ids=["mulaw", "alaw"])
def test_sign_symmetry(lut):
    """Flipping the sign bit negates the sample for every code."""
    b = np.arange(256)
    np.testing.assert_array_equal(lut[b ^ 0x80], -lut[b].astype(np.int32))


def test_mulaw_monotone_positive():
    """Positive µ-law codes 0xFF..0x80 decode to strictly increasing
    magnitudes (0xFF is +0, 0x80 is max)."""
    pos = MULAW_LUT[np.arange(0xFF, 0x7F, -1)].astype(np.int32)
    assert (np.diff(pos) > 0).all()


def test_alaw_monotone_positive():
    """Positive A-law codes sorted by value are 128 distinct increasing
    magnitudes from 8 to 32256."""
    pos = np.sort(ALAW_LUT[np.arange(0x80, 0x100)].astype(np.int32))
    assert pos[0] == 8 and pos[-1] == 32256
    assert (np.diff(pos) > 0).all()


@pytest.mark.parametrize(
    "codec,lut,min_snr",
    [("pcm_mulaw", MULAW_LUT, 35.0), ("pcm_alaw", ALAW_LUT, 34.0)],
)
def test_roundtrip_snr(codec, lut, min_snr):
    """Nearest-code companding of a -12 dBFS tone decodes back at the
    codec's theoretical SNR (~38 dB) — checks the LUT's VALUE SPACING,
    not just individual entries."""
    t = np.arange(SR) / SR
    x = (0.25 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    order = np.argsort(lut)
    sorted_vals = lut[order].astype(np.int32)
    idx = np.clip(np.searchsorted(sorted_vals, x), 1, 255)
    lower_closer = (x - sorted_vals[idx - 1]) < (sorted_vals[idx] - x)
    codes = order[np.where(lower_closer, idx - 1, idx)].astype(np.uint8)
    dec, sr = decode_pcm(codes.tobytes(), codec)
    assert sr is None and len(dec) == len(x)
    err = dec.astype(np.float64) - x.astype(np.float64)
    snr = 10 * np.log10(np.dot(x, x.astype(np.float64)) / np.dot(err, err))
    assert snr > min_snr


def test_decode_pcm_null():
    assert decode_pcm(None, "pcm_mulaw") == (None, None)


# ------------------------------------------------------------- Spark stage


def test_features_over_mulaw_clips(spark):
    """The zero-copy Arrow walk decodes G.711 rows: tone frequency and
    level recovered through with_audio_features and with_loudness."""
    import pandas as pd

    from jschon_spark import fixtures as fx
    from jschon_spark.audio.features import with_audio_features
    from jschon_spark.audio.loudness import with_loudness

    t = np.arange(2 * SR) / SR
    x = (0.25 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    # companding via the decode table (nearest code)
    order = np.argsort(MULAW_LUT)
    sv = MULAW_LUT[order].astype(np.int32)
    idx = np.clip(np.searchsorted(sv, x), 1, 255)
    codes = order[
        np.where((x - sv[idx - 1]) < (sv[idx] - x), idx - 1, idx)
    ].astype(np.uint8)
    rows = pd.DataFrame(
        {
            "clip_id": ["m0"],
            "bytes": [codes.tobytes()],
            "sr_hz": np.int32([SR]),
            "dur_ms": np.int32([2000]),
            "codec": ["pcm_mulaw"],
            "transcript": ["t"],
            "part_id": np.int32([0]),
        }
    )
    df = spark.createDataFrame(rows, schema=fx.CLIPS_DDL)
    feats = with_audio_features(df).toPandas().iloc[0]
    assert feats["features_ok"]
    assert feats["dominant_freq_hz"] == pytest.approx(440, abs=2 * SR / 16384)
    # -12 dBFS sine -> rms -15 dBFS (within companding noise)
    assert feats["rms_dbfs"] == pytest.approx(-15.05, abs=0.2)
    loud = with_loudness(df).toPandas().iloc[0]
    assert loud["loudness_ok"]
    assert loud["integrated_lufs"] == pytest.approx(-12.04 - 3.01, abs=1.0)
