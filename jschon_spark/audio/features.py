"""Real DSP feature extraction over decoded audio payloads.

The multimodal image path (operators/multimodal.py) must stub its
decode — no codec libraries ship in this environment. Audio is
different: pcm_s16le and standard WAV payloads decode with numpy
``frombuffer`` views alone, so the whole feature chain here is REAL
signal processing, not a hash-based fake:

- level:    rms_dbfs, peak_dbfs (dB relative to int16 full scale)
- clipping: fraction of samples at digital full scale
- activity: zero-crossing rate, silence ratio over 20 ms frames,
            blind SNR estimate (90th/10th-percentile frame energy — a
            no-reference quality signal for speech-like audio)
- spectrum: dominant frequency, spectral centroid, 85% rolloff and
            flatness from a Hann-windowed rFFT of a bounded window

Execution model matches the audio invariant kernel
(audio/__init__.py:_arrow_audio_batches): mapInArrow, payload bytes
enter Python as borrowed Arrow buffers read through zero-copy int16
views, per-sample math fully vectorized per row (a clip's working set
is cache-resident — see _row_snr's note on why row-at-a-time beats
whole-batch concatenation on a bandwidth-starved host). Per-row Python
is O(1) header work plus ~20 numpy calls.

At the 10^12-row design point this stage is embarrassingly parallel
(map-only, no shuffle); the output drops ``bytes`` so everything
downstream is metadata-sized.

Reference scope note: handrews/jschon has no audio surface (pure JSON
Schema validation, jschon/jsonschema.py); this module is part of the
training-data-pipeline extension the task brief mandates beyond
reference parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jschon_spark.audio import G711_LUTS, _parse_wav_header, decode_pcm

# dB floor used wherever a log of zero power would otherwise occur
#  (all-zero payloads, empty frames).
DB_FLOOR = -120.0

# rFFT window: bounded so a pathological 900 s row costs the same as a
# normal one; 16384 points gives sub-3 Hz bin resolution at 44.1 kHz.
FFT_WINDOW = 16384

# 20 ms frames below this RMS level count as silence.
SILENCE_THRESHOLD_DBFS = -45.0

FEATURE_FIELDS = [
    ("rms_dbfs", T.DoubleType()),
    ("peak_dbfs", T.DoubleType()),
    ("clipping_ratio", T.DoubleType()),
    ("zero_crossing_rate", T.DoubleType()),
    ("silence_ratio", T.DoubleType()),
    ("snr_est_db", T.DoubleType()),
    ("dominant_freq_hz", T.DoubleType()),
    ("spectral_centroid_hz", T.DoubleType()),
    ("spectral_rolloff_hz", T.DoubleType()),
    ("spectral_flatness", T.DoubleType()),
]

# blind SNR: frames quieter than the 10th percentile are "noise",
# louder than the 90th are "signal" — meaningful for speech-like
# on/off activity (a STATIONARY tone reads ~0 by construction).
_SNR_EST_CAP_DB = 100.0


def _db(power_ratio: float) -> float:
    if power_ratio <= 0.0:
        return DB_FLOOR
    return max(DB_FLOOR, 10.0 * float(np.log10(power_ratio)))


def clip_features(x: np.ndarray, sr: int, scratch: dict) -> tuple:
    """All features for one decoded int16 clip. Vectorized numpy on a
    cache-resident row; the Hann window and rFFT frequency axis are
    memoized per (sr, nfft) in ``scratch`` across the batch."""
    n = len(x)
    if n == 0 or sr <= 0:
        return (DB_FLOOR, DB_FLOOR, 0.0, 0.0, 1.0, np.nan, 0.0, 0.0, 0.0, 1.0)
    xf = x.astype(np.float32)
    full = np.float32(32767.0)

    # --- level / clipping -------------------------------------------------
    mean_sq = float(np.dot(xf, xf)) / n
    rms_dbfs = _db(mean_sq / float(full * full))
    peak = float(np.max(np.abs(xf)))
    peak_dbfs = _db((peak * peak) / float(full * full))
    clipping_ratio = float(np.count_nonzero(np.abs(x) >= 32766)) / n

    # --- activity ---------------------------------------------------------
    if n > 1:
        s = np.signbit(x)
        zcr = float(np.count_nonzero(s[1:] != s[:-1])) / (n - 1)
    else:
        zcr = 0.0
    frame = max(1, sr // 50)  # 20 ms
    n_frames = n // frame
    if n_frames:
        fr = xf[: n_frames * frame].reshape(n_frames, frame)
        fr_power = np.einsum("ij,ij->i", fr, fr) / frame
        thresh = float(full * full) * (10.0 ** (SILENCE_THRESHOLD_DBFS / 10.0))
        silence_ratio = float(np.count_nonzero(fr_power < thresh)) / n_frames
        if n_frames >= 5:
            p10, p90 = np.percentile(fr_power, [10.0, 90.0])
            floor = max(float(p10), 0.25)  # quarter-LSB^2 floor
            snr_est = min(
                _SNR_EST_CAP_DB, 10.0 * float(np.log10(max(float(p90), floor) / floor))
            )
        else:
            snr_est = float("nan")
    else:
        snr_est = float("nan")
        silence_ratio = 1.0 if mean_sq / float(full * full) < 10.0 ** (
            SILENCE_THRESHOLD_DBFS / 10.0
        ) else 0.0

    # --- spectrum ---------------------------------------------------------
    nfft = min(n, FFT_WINDOW)
    key = (sr, nfft)
    cached = scratch.get(key)
    if cached is None:
        win = np.hanning(nfft).astype(np.float32)
        freqs = np.fft.rfftfreq(nfft, d=1.0 / sr)
        cached = (win, freqs)
        scratch[key] = cached
    win, freqs = cached
    start = (n - nfft) // 2  # centered window avoids edge transients
    spec = np.fft.rfft(xf[start : start + nfft] * win)
    power = (spec.real**2 + spec.imag**2)[1:]  # drop DC
    total = float(power.sum())
    if total <= 0.0:
        return (rms_dbfs, peak_dbfs, clipping_ratio, zcr, silence_ratio, snr_est, 0.0, 0.0, 0.0, 1.0)
    f_axis = freqs[1:]
    dominant = float(f_axis[int(np.argmax(power))])
    centroid = float(np.dot(f_axis, power) / total)
    rolloff = float(f_axis[int(np.searchsorted(np.cumsum(power), 0.85 * total))])
    # geometric/arithmetic power mean: ~1 for white noise, ->0 for a tone
    flatness = float(np.exp(np.mean(np.log(power + 1e-12))) / (total / len(power)))
    return (
        rms_dbfs,
        peak_dbfs,
        clipping_ratio,
        zcr,
        silence_ratio,
        snr_est,
        dominant,
        centroid,
        rolloff,
        min(1.0, flatness),
    )


def iter_decoded(batch):
    """Shared zero-copy decode walk for Arrow audio kernels: yields
    ``(row_index, int16_samples, sample_rate)`` for every decodable row
    of the batch (pcm_s16le as a direct frombuffer view on the Arrow
    data buffer; WAV via the allocation-free header parse with a stdlib
    fallback). Undecodable rows (null payload, odd length, unknown
    codec, corrupt header) are silently not yielded — callers treat
    absence as their not-ok state."""
    names = batch.schema.names
    blob = batch.column(names.index("bytes"))
    n = len(blob)
    bufs = blob.buffers()
    if not n or bufs[1] is None:
        return
    width, odt = (8, np.int64) if pa.types.is_large_binary(blob.type) else (4, np.int32)
    offs = np.frombuffer(bufs[1], dtype=odt, count=n + 1, offset=blob.offset * width)
    raw = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    srs = batch.column(names.index("sr_hz")).to_numpy(zero_copy_only=False)
    codecs = batch.column(names.index("codec")).to_pylist()
    row_valid = blob.is_valid().to_numpy(zero_copy_only=False) if blob.null_count else None
    for i in range(n):
        if row_valid is not None and not row_valid[i]:
            continue
        s0, s1 = int(offs[i]), int(offs[i + 1])
        c = codecs[i]
        sr = int(srs[i])
        if c == "pcm_s16le":
            if (s1 - s0) % 2:
                continue
            dec = np.frombuffer(raw, dtype="<i2", count=(s1 - s0) // 2, offset=s0)
        elif c in G711_LUTS:
            # 8-bit telephony (G.711): one LUT gather on the zero-copy
            # uint8 view of the Arrow buffer
            dec = G711_LUTS[c][
                np.frombuffer(raw, dtype=np.uint8, count=s1 - s0, offset=s0)
            ]
        elif c == "wav":
            parsed = _parse_wav_header(raw, s0, s1)
            if parsed is None:
                # slow path: stdlib wave parse, then the IMA ADPCM
                # (fmt 0x11) container walk — both inside decode_pcm
                dec, hdr_sr = decode_pcm(bytes(raw[s0:s1]), "wav")
                if dec is None:
                    continue
                if hdr_sr:
                    sr = hdr_sr
            else:
                d0, d1, hdr_sr = parsed
                if (d1 - d0) % 2:
                    continue
                dec = np.frombuffer(raw, dtype="<i2", count=(d1 - d0) // 2, offset=d0)
                sr = hdr_sr
        elif c == "adpcm_ima":
            # 4-bit IMA ADPCM blocks (audio/adpcm.py): block-lane
            # vectorized scan over a zero-copy uint8 view
            from jschon_spark.audio.adpcm import decode_ima_adpcm

            dec = decode_ima_adpcm(
                np.frombuffer(raw, dtype=np.uint8, count=s1 - s0, offset=s0)
            )
            if dec is None:
                continue
        else:
            continue
        yield i, dec, sr


def _arrow_feature_batches(batches, keep_bytes: bool = False):
    """mapInArrow kernel: zero-copy decode (same buffer walk as the
    invariant kernel) then clip_features per row. Emits every non-bytes
    input column plus the feature columns (``keep_bytes`` passes the
    payload through for stages whose survivors feed payload sinks)."""
    for batch in batches:
        names = batch.schema.names
        n = batch.num_rows
        cols = {name: np.full(n, np.nan, dtype=np.float64) for name, _ in FEATURE_FIELDS}
        ok = np.zeros(n, dtype=bool)

        scratch: dict = {}
        for i, dec, sr in iter_decoded(batch):
            vals = clip_features(dec, sr, scratch)
            ok[i] = True
            for (name, _), v in zip(FEATURE_FIELDS, vals):
                cols[name][i] = v

        arrays = [
            batch.column(j) for j, nm in enumerate(names) if nm != "bytes" or keep_bytes
        ]
        out_names = [nm for nm in names if nm != "bytes" or keep_bytes]
        arrays.append(pa.array(ok))
        out_names.append("features_ok")
        for name, _ in FEATURE_FIELDS:
            arrays.append(pa.array(cols[name]))
            out_names.append(name)
        yield pa.RecordBatch.from_arrays(arrays, out_names)


def with_audio_features(df: DataFrame, keep_bytes: bool = False) -> DataFrame:
    """Append real DSP feature columns to a clips DataFrame (and drop
    ``bytes`` unless ``keep_bytes``). Map-only: no shuffle, audio
    payload never materializes as Python objects, output is
    metadata-sized by default. Select only the columns you need BEFORE
    calling if the frame is wide — the kernel passes every non-bytes
    column through."""
    out_fields = [f for f in df.schema.fields if f.name != "bytes" or keep_bytes]
    out_fields.append(T.StructField("features_ok", T.BooleanType()))
    out_fields += [T.StructField(name, dt) for name, dt in FEATURE_FIELDS]
    return df.mapInArrow(
        lambda batches: _arrow_feature_batches(batches, keep_bytes=keep_bytes),
        T.StructType(out_fields),
    )


def audio_quality_flags(
    df: DataFrame,
    transcript_col: str = "transcript",
    min_rms_dbfs: float = -40.0,
    max_clipping_ratio: float = 0.01,
    max_silence_ratio: float = 0.5,
    max_tokens_per_sec: float = 8.0,
) -> DataFrame:
    """Training-data curation gates over the extracted features —
    pure JVM-side expressions (whole-stage codegen) on the metadata-
    sized feature frame:

    - too_quiet:      level below a usable floor
    - clipped:        audible digital clipping
    - mostly_silent:  majority of 20 ms frames under the silence gate
    - rate_implausible: transcript token rate beyond human speech
      (tokens/sec computed JVM-side from whitespace tokens / duration)

    ``keep`` is the conjunction of all gates passing (rows that failed
    decode are dropped by definition).
    """
    dur_s = F.col("dur_ms").cast("double") / F.lit(1000.0)
    tokens = F.when(
        F.col(transcript_col).isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(transcript_col)), r"\s+")))
    tokens_per_sec = F.when(dur_s > 0, tokens.cast("double") / dur_s).otherwise(F.lit(None))

    too_quiet = F.col("rms_dbfs") < F.lit(min_rms_dbfs)
    clipped = F.col("clipping_ratio") > F.lit(max_clipping_ratio)
    mostly_silent = F.col("silence_ratio") > F.lit(max_silence_ratio)
    rate_implausible = tokens_per_sec > F.lit(max_tokens_per_sec)

    def flag(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    return (
        df.withColumn("tokens_per_sec", tokens_per_sec)
        .withColumn("too_quiet", flag(too_quiet))
        .withColumn("clipped", flag(clipped))
        .withColumn("mostly_silent", flag(mostly_silent))
        .withColumn("rate_implausible", flag(rate_implausible))
        .withColumn(
            "keep",
            F.col("features_ok")
            & ~flag(too_quiet)
            & ~flag(clipped)
            & ~flag(mostly_silent)
            & ~flag(rate_implausible),
        )
    )
