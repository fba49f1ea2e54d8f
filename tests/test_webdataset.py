"""Tar-shard (WebDataset-convention) source/sink: member parsing, ext
pushdown, sample grouping, write→read round trip, and composition with
the audio decode kernel."""

import io
import os
import tarfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from jschon_spark.sources.webdataset import (
    _split_member,
    group_samples,
    read_tar_shards,
    write_tar_shards,
)

SR = 16000


def _tone(freq, secs=0.5, amp=0.3):
    t = np.arange(int(SR * secs)) / SR
    return np.clip(amp * np.sin(2 * np.pi * freq * t) * 32767, -32768, 32767).astype(
        np.int16
    )


def _make_shard(path, samples):
    with tarfile.open(path, "w") as tf:
        for key, parts in samples:
            for ext, data in parts.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    for s in range(3):
        samples = [
            (
                f"{s:02d}{i:04d}",
                {
                    "wav": _tone(300 + 100 * i).tobytes(),
                    "txt": f"transcript {s}/{i}".encode(),
                    "json": b'{"meta": 1}',
                },
            )
            for i in range(4)
        ]
        _make_shard(str(d / f"shard-{s:03d}.tar"), samples)
    return str(d)


def test_split_member():
    assert _split_member("0001.wav") == ("0001", "wav")
    assert _split_member("a/b/0001.seg.wav") == ("a/b/0001", "seg.wav")
    assert _split_member("noext") == ("noext", "")


def test_read_members_and_ext_pushdown(spark, shard_dir):
    all_members = read_tar_shards(spark, shard_dir)
    assert all_members.count() == 3 * 4 * 3
    wav_only = read_tar_shards(spark, shard_dir, exts=["wav"]).collect()
    assert len(wav_only) == 12 and all(r["ext"] == "wav" for r in wav_only)
    assert all(len(r["bytes"]) == SR for r in wav_only)  # 0.5 s int16


def test_group_samples(spark, shard_dir):
    grouped = group_samples(read_tar_shards(spark, shard_dir)).collect()
    assert len(grouped) == 12
    r = next(g for g in grouped if g["key"] == "000002")
    assert set(r["parts"].keys()) == {"wav", "txt", "json"}
    assert r["parts"]["txt"] == b"transcript 0/2"


def test_roundtrip_and_manifest(spark, shard_dir, tmp_path):
    members = read_tar_shards(spark, shard_dir)
    out = str(tmp_path / "rewritten")
    manifest = write_tar_shards(members, out, n_shards=2).collect()
    written = [r for r in manifest if r["n_members"] > 0]
    assert sum(r["n_members"] for r in written) == 36
    assert all(os.path.exists(r["shard_path"]) for r in written)
    back = read_tar_shards(spark, out)
    assert back.count() == 36
    # byte-identical payloads survive the round trip
    a = {(r["key"], r["ext"]): r["bytes"] for r in members.collect()}
    b = {(r["key"], r["ext"]): r["bytes"] for r in back.collect()}
    assert a == b


def test_compose_with_audio_features(spark, shard_dir):
    """Shard members flow straight into the audio kernels: wav payloads
    decode and the per-sample tone frequency is recovered."""
    from jschon_spark.audio.features import with_audio_features

    wav = read_tar_shards(spark, shard_dir, exts=["wav"]).select(
        F.col("key").alias("clip_id"),
        F.col("bytes"),
        F.lit("pcm_s16le").alias("codec"),
        F.lit(SR).alias("sr_hz"),
    )
    feats = {r["clip_id"]: r for r in with_audio_features(wav).collect()}
    assert all(r["features_ok"] for r in feats.values())
    assert abs(feats["000003"]["dominant_freq_hz"] - 600.0) < 4.0


def test_wav_clips_to_tar_shards_roundtrip(spark, tmp_path):
    """End-to-end export: condition clips to canonical WAV, shard the
    (key, wav, bytes)+(key, txt, transcript) samples into tars, read
    back, decode byte-identically."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from jschon_spark import fixtures as fx
    from jschon_spark.audio import decode_pcm
    from jschon_spark.audio.conditioning import condition_clips
    from jschon_spark.sources.webdataset import read_tar_shards, write_tar_shards

    clips = spark.createDataFrame(
        fx.gen_clips_batch(np.arange(40), audio=True), schema=fx.CLIPS_DDL
    )
    cond = condition_clips(clips, target_sr=16000, out_codec="wav").where(
        "conditioned_ok"
    )
    wav = cond.select(
        F.col("clip_id").alias("key"), F.lit("wav").alias("ext"), F.col("bytes")
    )
    txt = cond.select(
        F.col("clip_id").alias("key"),
        F.lit("txt").alias("ext"),
        F.coalesce(F.col("transcript"), F.lit("")).cast("binary").alias("bytes"),
    )
    out_dir = str(tmp_path / "wds")
    manifest = write_tar_shards(wav.unionByName(txt), out_dir, n_shards=3).collect()
    assert sum(m["n_members"] for m in manifest) == 2 * cond.count()

    back = read_tar_shards(spark, out_dir + "/*.tar").toPandas()
    wavs = back[back["ext"] == "wav"].set_index("key")
    orig = cond.select("clip_id", "bytes").toPandas().set_index("clip_id")
    assert len(wavs) == len(orig)
    some = list(orig.index)[:5]
    for k in some:
        assert bytes(wavs.loc[k, "bytes"]) == bytes(orig.loc[k, "bytes"])
        dec, sr = decode_pcm(bytes(wavs.loc[k, "bytes"]), "wav")
        assert sr == 16000 and dec is not None
