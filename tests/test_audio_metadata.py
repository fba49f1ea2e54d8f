"""Container-metadata extraction (audio/metadata.py): RIFF INFO tags,
ID3v2.3/2.4 text frames across encodings, malformed containers, and the
Spark stage (map-only, headers-only)."""

import struct

import numpy as np
import pytest

from jschon_spark.audio.conditioning import wav_bytes
from jschon_spark.audio.metadata import (
    extract_audio_metadata,
    parse_id3v2,
    parse_wav_metadata,
    with_audio_metadata,
)


def _wav_with_info(tags: dict) -> bytes:
    x = (np.arange(100) % 64).astype(np.int16)
    base = wav_bytes(x, 8000)
    info = b"INFO"
    for fourcc, val in tags.items():
        v = val.encode("latin-1") + b"\x00"
        info += fourcc + struct.pack("<I", len(v)) + v + (b"\x00" if len(v) & 1 else b"")
    chunk = b"LIST" + struct.pack("<I", len(info)) + info
    out = base + chunk
    # patch RIFF size
    return b"RIFF" + struct.pack("<I", len(out) - 8) + out[8:]


def _id3(frames: dict, major: int = 4) -> bytes:
    body = b""
    for fid, (enc, text) in frames.items():
        if enc == 0:
            payload = bytes([0]) + text.encode("latin-1")
        elif enc == 1:
            payload = bytes([1]) + text.encode("utf-16")
        elif enc == 2:
            payload = bytes([2]) + text.encode("utf-16-be")
        else:
            payload = bytes([3]) + text.encode("utf-8")
        sz = len(payload)
        raw = (
            bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
            if major == 4
            else struct.pack(">I", sz)
        )
        body += fid.encode() + raw + b"\x00\x00" + payload
    total = len(body)
    hdr = b"ID3" + bytes([major, 0, 0]) + bytes(
        [(total >> 21) & 0x7F, (total >> 14) & 0x7F, (total >> 7) & 0x7F, total & 0x7F]
    )
    return hdr + body + b"\xff\xfbAUDIOFRAMES"  # undecodable audio after the tag


def test_wav_info_tags_and_fmt():
    blob = _wav_with_info({b"INAM": "My Clip", b"IART": "Someone", b"ICRD": "2024"})
    m = parse_wav_metadata(blob)
    assert m["container"] == "wav"
    assert (m["fmt_tag"], m["header_sr"], m["n_channels"], m["bits_per_sample"]) == (1, 8000, 1, 16)
    assert m["tags"] == {"title": "My Clip", "artist": "Someone", "date": "2024"}


def test_wav_without_info_has_empty_tags():
    x = (np.arange(50) % 32).astype(np.int16)
    m = parse_wav_metadata(wav_bytes(x, 16000))
    assert m["container"] == "wav" and m["tags"] == {}


@pytest.mark.parametrize("major", [3, 4])
@pytest.mark.parametrize("enc", [0, 1, 2, 3])
def test_id3_text_frames_all_encodings(major, enc):
    blob = _id3({"TIT2": (enc, "Tïtle ✓" if enc else "Title"), "TPE1": (enc, "Artist")}, major)
    m = parse_id3v2(blob)
    assert m["container"] == "id3"
    assert m["tags"]["artist"] == "Artist"
    assert m["tags"]["title"].startswith("T")


def test_unrecognized_and_malformed():
    assert extract_audio_metadata(b"")["container"] is None
    assert extract_audio_metadata(b"\x00\x01rawpcm")["container"] is None
    assert extract_audio_metadata(None)["container"] is None
    # truncated ID3 header / bad version → not a crash
    assert parse_id3v2(b"ID3\x02\x00\x00\x00\x00\x00\x00") is None
    trunc = _wav_with_info({b"INAM": "x"})[:20]
    m = parse_wav_metadata(trunc)
    assert m is not None and m["container"] == "wav"  # header-only, no tags


def test_spark_stage(spark):
    rows = [
        ("w", _wav_with_info({b"INAM": "Song", b"ISFT": "enc v1"})),
        ("i", _id3({"TALB": (3, "Album"), "TCON": (0, "Jazz")})),
        ("r", b"\x00\x01" * 50),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in with_audio_metadata(df).collect()}
    assert out["w"]["container"] == "wav"
    assert out["w"]["tags"]["title"] == "Song" and out["w"]["tags"]["software"] == "enc v1"
    assert out["w"]["header_sr"] == 8000
    assert out["i"]["container"] == "id3"
    assert out["i"]["tags"] == {"album": "Album", "genre": "Jazz"}
    assert out["r"]["container"] is None and out["r"]["tags"] is None
    # map-only
    plan = with_audio_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
