#!/usr/bin/env python
"""Audio near-dup (spectral fingerprint) throughput at corpus scale
(BASELINE.md evidence — the one dedup family without a big-n anchor
before round 5).

Synthesizes N dense-spectrum clips JVM→Arrow (five seeded tones with
amplitude envelopes over seeded colored noise — the fingerprint's
design regime; a pure tone would measure the noise floor, see
tests/test_audio_fingerprint.py::_mix) with every 50th clip a NOISY
COPY of its predecessor (same content seed + fresh noise at ~14 dB SNR
+ small gain change — a re-encode/re-record stand-in), runs the full
decode→fingerprint→banded-join pipeline IN ONE PLAN (no disk), and
reports clips/s, candidate volume, and planted-copy recall.

The ladder lesson applies here too: radius and require_chunks must be
sized to the corpus (128-bit, radius 10, chunk-pair keys ≈ 21 bits at
the 100k default — candidates stay ~linear; radius 14 at this n would
drop to 16-bit keys and go quadratic).

Usage: python bench_audio_dedup_scale.py [n_clips] [radius] [require_chunks]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SR = 16000
SECS = 2.0


def _mix(seed: int, rng_noise) -> np.ndarray:
    """Dense deterministic signal (content seed) + per-CLIP noise bed."""
    rng = np.random.default_rng(seed)
    n = int(SR * SECS)
    t = np.arange(n) / SR
    x = np.zeros(n)
    for f, a, ph in zip(
        rng.uniform(320, 2800, 5), rng.uniform(0.3, 1.0, 5), rng.uniform(0, 6.28, 5)
    ):
        env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t + ph)
        x += a * env * np.sin(2 * np.pi * f * t + ph)
    # seeded colored broadband bed (content, same seed → same bed)
    spec = np.fft.rfft(rng.standard_normal(n))
    shape = rng.uniform(0.2, 1.0, len(spec))
    x += 0.35 * np.fft.irfft(spec * shape, n) / np.sqrt(np.mean(shape**2))
    x = x / np.max(np.abs(x)) * 0.6
    if rng_noise is not None:
        # variant = re-record stand-in: 5%-of-peak additive noise (the
        # fingerprint's documented robustness regime, ~26 dB SNR — see
        # tests/test_audio_fingerprint.py::_noisy) + a gain change the
        # fingerprint is invariant to by construction
        x = x * rng_noise.uniform(0.7, 1.3)
        x = x + 0.05 * np.max(np.abs(x)) * rng_noise.standard_normal(n)
        x = np.clip(x, -0.999, 0.999)
    return (x * 32767).astype(np.int16)


def gen_batches(pdf_iter):
    import pandas as pd

    for pdf in pdf_iter:
        ids = pdf["id"].to_numpy()
        rows = {"clip_id": [], "bytes": [], "codec": [], "sr_hz": []}
        for i in ids:
            i = int(i)
            is_copy = i % 50 == 1
            seed = i - 1 if is_copy else i
            noise = np.random.default_rng(10_000_000 + i) if is_copy else None
            rows["clip_id"].append(f"c{i:08d}")
            rows["bytes"].append(_mix(seed, noise).tobytes())
            rows["codec"].append("pcm_s16le")
            rows["sr_hz"].append(SR)
        yield pd.DataFrame(rows)


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from pyspark.sql import functions as F

    from jschon_spark.audio.fingerprint import with_audio_fingerprint
    from jschon_spark.operators.dedup import (
        simhash128_buckets,
        simhash128_near_duplicates,
    )
    from jschon_spark.session import get_session

    # size shuffle width to the BANDING volume, exactly as a cluster
    # deployment would (~250k exploded rows per post-shuffle partition
    # keeps the shuffle-hash build side memory-resident): n_clips ×
    # C(radius+rc, rc) rows feed the self-join, which at rc=3 is 560
    # rows/clip — the session default (max(cpus, 8)) OOMs the hash map
    import math

    n_band_rows = n_clips * math.comb(radius + rc, rc)
    shuffle = min(512, max(16, n_band_rows // 250_000))
    spark = get_session(
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")
    clips = spark.range(n_clips).repartition(64).mapInPandas(
        gen_batches, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    planted = sum(1 for i in range(n_clips) if i % 50 == 1)

    # warmup (worker spawn + import) on a small slice
    spark.range(500).mapInPandas(
        gen_batches, "clip_id string, bytes binary, codec string, sr_hz int"
    ).write.format("noop").mode("overwrite").save()

    # candidate volume at the chosen banding (one bucket-count agg over
    # the fingerprint pass — measured, not estimated)
    t0 = time.perf_counter()
    fp = with_audio_fingerprint(clips).where(F.col("fingerprint_ok")).persist()
    n_ok = fp.count()
    fp_sec = time.perf_counter() - t0
    buckets = simhash128_buckets(
        fp,
        id_col="clip_id",
        cols=("audio_fp_a", "audio_fp_b"),
        max_hamming=radius,
        require_chunks=rc,
    )
    cand = (
        buckets.groupBy("chunk_id", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("p"))
        .collect()[0]["p"]
    )

    t0 = time.perf_counter()
    pairs = simhash128_near_duplicates(
        fp,
        id_col="clip_id",
        cols=("audio_fp_a", "audio_fp_b"),
        max_hamming=radius,
        require_chunks=rc,
    ).collect()
    join_sec = time.perf_counter() - t0
    fp.unpersist()
    hit = sum(
        1
        for r in pairs
        if r.id_b == f"c{int(r.id_a[1:]) + 1:08d}" and int(r.id_b[1:]) % 50 == 1
    )
    print(
        json.dumps(
            {
                "metric": "audio_near_dup_throughput",
                "n_clips": n_clips,
                "radius": radius,
                "require_chunks": rc,
                "fingerprint_sec": round(fp_sec, 2),
                "fingerprint_clips_per_sec": round(n_ok / fp_sec, 1),
                "join_sec": round(join_sec, 2),
                "candidate_pairs": int(cand),
                "candidates_per_clip": round(cand / n_clips, 3),
                "pairs_found": len(pairs),
                "planted_copies": planted,
                "planted_recall": round(hit / planted, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
