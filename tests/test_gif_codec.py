"""GIF codec (operators/gif.py): lossless LZW round trips (GIF is an
indexed lossless format — unlike JPEG, decode must be EXACT), interlace
de-scrambling, transparency, frame counting, typed errors, and the
Spark image_stats path."""

import struct

import numpy as np
import pytest

from jschon_spark.operators import multimodal as mm
from jschon_spark.operators.gif import (
    decode_gif,
    encode_gif,
    gif_frame_count,
)


def _quad(h=32, w=48):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[: h // 2, : w // 2] = [200, 30, 60]
    img[: h // 2, w // 2 :] = [20, 180, 90]
    img[h // 2 :, : w // 2] = [50, 60, 220]
    img[h // 2 :, w // 2 :] = [120, 120, 120]
    return img


def test_lossless_roundtrips():
    img = _quad()
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    base = np.random.default_rng(5).integers(0, 256, (16, 16), dtype=np.uint8)
    img2 = np.stack([base, base // 2, 255 - base], axis=-1)  # ≤256 colors
    assert np.array_equal(decode_gif(encode_gif(img2)), img2)
    g = (np.arange(10)[:, None] * 25 + np.arange(12)[None, :]).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(g))[:, :, 0], g)


def test_lzw_dictionary_reset_stress():
    """A 200x200 256-color gradient forces the LZW dictionary past 4096
    entries → clear-code resets; round trip must stay exact."""
    grad = (np.add.outer(np.arange(200), np.arange(200)) % 256).astype(np.uint8)
    img = np.stack([grad] * 3, axis=-1)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlaced_frame_descrambles():
    """Flip the interlace flag on a stream whose rows were pre-scrambled
    in GIF pass order — decode must return the original image."""
    img = _quad(17, 8)  # odd height exercises every interlace pass
    h = img.shape[0]
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    blob = bytearray(encode_gif(img[order]))
    # our encoder layout: 6+7 header/LSD, 3*2^k palette, 0x2C, 8 bytes,
    # then the iflags byte
    k = (blob[10] & 7) + 1
    iflags_at = 13 + 3 * (1 << k) + 1 + 8
    assert blob[iflags_at - 9] == 0x2C
    blob[iflags_at] |= 0x40
    assert np.array_equal(decode_gif(bytes(blob)), img)


def test_transparency_returns_rgba():
    img = _quad(8, 8)
    blob = bytearray(encode_gif(img))
    # transparent index 0 = first palette color; inject a GCE before 0x2C
    at = blob.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    blob[at:at] = gce
    out = decode_gif(bytes(blob))
    assert out.shape == (8, 8, 4)
    # palette index 0 is the first unique color → those pixels go alpha 0
    first_color = np.unique(img.reshape(-1, 3), axis=0)[0]
    mask = (img == first_color).all(axis=2)
    assert np.array_equal(out[:, :, 3] == 0, mask)
    assert np.array_equal(out[:, :, :3], img)


def test_frame_count_and_errors():
    img = _quad(8, 8)
    blob = encode_gif(img)
    assert gif_frame_count(blob) == 1
    # splice a second frame: descriptor through DATA TERMINATOR of the
    # first (the stream tail is <term 0x00><trailer 0x3B>)
    at = blob.index(b"\x2c", 13)
    frame = blob[at:-1]  # includes the \x00 terminator
    two = blob[:-1] + frame + b"\x3b"
    assert gif_frame_count(two) == 2
    assert decode_gif(two).shape == img.shape  # first frame decoded
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        encode_gif(np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8))


def test_sniff_and_image_stats(spark):
    img = _quad()
    blob = mm.encode_gif(img)
    assert mm.sniff_format(blob) == "gif"
    assert np.array_equal(mm.decode_image(blob), img)
    df = spark.createDataFrame(
        [("g1", blob), ("g2", blob[:30])], "media_id string, payload binary"
    )
    out = {r["media_id"]: r for r in mm.image_stats(df).collect()}
    y = mm._luma(img)
    assert out["g1"]["decode_error"] is None
    assert out["g1"]["format"] == "gif"
    assert abs(out["g1"]["mean_luma"] - y.mean()) < 1e-9
    assert out["g2"]["decode_error"] is not None


def test_median_cut_quantize_then_encode():
    """Photographic (>256-color) input: median-cut to 256 colors, then
    a lossless GIF round trip of the quantized image; quantization
    error stays small on smooth content."""
    from jschon_spark.operators.gif import quantize_median_cut

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    q = quantize_median_cut(img, 256)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 256
    assert np.array_equal(decode_gif(encode_gif(q)), q)
    # smooth gradient quantizes tightly (mean abs error < 8/channel)
    grad = np.stack(
        [np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8) * 2] * 3, axis=-1
    )
    qg = quantize_median_cut(grad, 64)
    assert np.abs(qg.astype(int) - grad.astype(int)).mean() < 8.0
    # determinism
    assert np.array_equal(quantize_median_cut(img, 256), q)
