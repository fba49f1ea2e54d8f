"""Landmark-based trim-robust audio matching (audio/landmarks.py):
kernel determinism, containment detection at arbitrary (non-hop-aligned)
trim offsets, gain invariance through peak positions, stop-hash skew
guard, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jschon_spark.audio.landmarks import (
    HOP,
    audio_containment_pairs,
    clip_landmarks,
    landmark_postings,
)

SR = 16000


def _mix(seed: int, secs: float = 2.0, gain: float = 0.5) -> np.ndarray:
    """Dense deterministic signal (same builder as the fingerprint
    tests): seeded tones + seeded colored-noise bed."""
    rng = np.random.default_rng(seed)
    n = int(SR * secs)
    t = np.arange(n) / SR
    x = np.zeros(n)
    for f, a, ph in zip(
        rng.uniform(320, 2800, 5), rng.uniform(0.3, 1.0, 5), rng.uniform(0, 6.28, 5)
    ):
        env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t + ph)
        x += a * env * np.sin(2 * np.pi * f * t + ph)
    spec = np.fft.rfft(rng.standard_normal(n))
    shape = np.interp(
        np.linspace(0, 1, len(spec)), np.linspace(0, 1, 16), rng.uniform(0.05, 1.0, 16)
    )
    bed = np.fft.irfft(spec * shape, n)
    x += 0.8 * bed / np.std(bed)
    x /= np.max(np.abs(x))
    return np.clip(x * gain * 32767.0, -32768, 32767).astype(np.int16)


def _noisy(x: np.ndarray, seed: int, level: float = 0.02) -> np.ndarray:
    rng = np.random.default_rng(seed)
    peak = float(np.max(np.abs(x)))
    return np.clip(
        x.astype(np.float64) + level * peak * rng.standard_normal(len(x)), -32768, 32767
    ).astype(np.int16)


def _clips_df(spark, rows):
    return spark.createDataFrame(
        [(cid, x.tobytes(), "pcm_s16le", SR) for cid, x in rows],
        "clip_id string, bytes binary, codec string, sr_hz int",
    )


def test_kernel_deterministic_and_nonempty():
    x = _mix(1)
    h1, t1 = clip_landmarks(x, SR, {})
    h2, t2 = clip_landmarks(x, SR, {})
    assert np.array_equal(h1, h2) and np.array_equal(t1, t2)
    assert len(h1) > 100
    assert len(clip_landmarks(np.zeros(100, dtype=np.int16), SR, {})[0]) == 0


def test_containment_at_arbitrary_offsets(spark):
    """Snippets cut at NON-hop-aligned offsets (the case that killed
    exact sub-fingerprint matching) still match their source at the
    right frame offset, through 2% noise."""
    base = _mix(42, secs=3.0)
    cuts = {"s1": 16000, "s2": 20000}  # 16000/256 = 62.5: not frame-aligned
    rows = [("full", base)] + [
        (k, _noisy(base[c : c + 16000], 7)) for k, c in cuts.items()
    ]
    rows += [(f"o{i}", _mix(200 + i, secs=1.5)) for i in range(6)]
    got = {
        (r["id_a"], r["id_b"]): r
        for r in audio_containment_pairs(_clips_df(spark, rows)).collect()
    }
    for k, c in cuts.items():
        assert ("full", k) in got, f"missed {k}: {list(got)}"
        assert abs(got[("full", k)]["delta_frames"] - c / HOP) <= 1
        # distinct-hash votes (measured: true 30-41, false <= 6 here)
        assert got[("full", k)]["votes"] > 25
    false = [p for p in got if p[0].startswith("o") or p[1].startswith("o")]
    assert not false, false


def test_gain_changed_copy_matches(spark):
    base = _mix(5, secs=2.0)
    quiet = (base.astype(np.float64) * 0.3).astype(np.int16)
    got = audio_containment_pairs(
        _clips_df(spark, [("a", base), ("b", quiet)])
    ).collect()
    assert len(got) == 1 and got[0]["delta_frames"] == 0 and got[0]["votes"] > 25


def test_stop_hash_filter_bounds_skew(spark):
    """A degenerate corpus (every clip the same hum) floods one hash
    family; the corpus-wide frequency filter drops those postings."""
    t = np.arange(SR) / SR
    hum = np.clip(0.4 * 32767 * np.sin(2 * np.pi * 120 * t), -32768, 32767).astype(
        np.int16
    )
    rows = [(f"h{i}", hum) for i in range(12)]
    posting = landmark_postings(_clips_df(spark, rows), max_posting_freq=11)
    assert posting.count() == 0  # every hash occurs 12 > 11 times


def test_posting_stage_map_only(spark):
    df = _clips_df(spark, [("a", _mix(1))])
    plan = (
        landmark_postings(df, max_posting_freq=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
