"""Baseline JPEG codec (operators/jpeg.py): encode→decode round trips
across subsampling modes, restart intervals, grayscale and odd sizes;
typed errors for truncated and non-baseline streams; and the full
Spark image_stats path over planted JPEG payloads (the synthesis-
contract oracle pattern shared by the PNG/BMP/PPM codecs)."""

import numpy as np
import pytest

from jschon_spark import fixtures as fx
from jschon_spark.operators import multimodal as mm
from jschon_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _quad_img(h=32, w=48):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[: h // 2, : w // 2] = [200, 30, 60]
    img[: h // 2, w // 2 :] = [20, 180, 90]
    img[h // 2 :, : w // 2] = [50, 60, 220]
    img[h // 2 :, w // 2 :] = [120, 120, 120]
    return img


def test_roundtrip_444_high_quality_block_aligned_exact():
    """Flat 8x8-aligned quadrants survive q95 4:4:4 bit-exactly (DCT of
    a constant block is DC-only; q95 DC steps are ~1)."""
    img = _quad_img()
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) == 0


@pytest.mark.parametrize("quality,tol_mean", [(95, 1.0), (85, 2.0), (60, 5.0)])
def test_roundtrip_quality_ladder(quality, tol_mean):
    """Smooth gradients (the content JPEG is built for) reconstruct
    within a quality-ordered mean-error bound."""
    h, w = 24, 40
    grad = np.clip(np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 2, 0, 255)
    img = np.stack([grad, 255 - grad, np.full_like(grad, 128)], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < tol_mean, (quality, err.mean())


def test_roundtrip_420_and_restart():
    img = _quad_img(33, 49)  # odd dims: MCU padding + crop both sides
    b420 = encode_jpeg(img, 95, subsample="420")
    brst = encode_jpeg(img, 95, subsample="420", restart_interval=2)
    d420 = decode_jpeg(b420)
    drst = decode_jpeg(brst)
    assert d420.shape == img.shape
    # restart markers change the byte stream but not the pixels
    assert b420 != brst
    assert (d420 == drst).all()
    # luma is full-resolution in 4:2:0 — tight even at chroma edges
    y_in = mm._luma(img)
    y_out = mm._luma(d420)
    assert np.abs(y_in - y_out).mean() < 0.5


def test_roundtrip_grayscale_and_odd_sizes():
    rng = np.random.default_rng(7)
    g = (np.arange(20)[:, None] * 7 + np.arange(30)[None, :] * 3).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (20, 30, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 23)]:
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(im, 95)).shape == (h, w, 3)


def test_determinism():
    img = _quad_img()
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)
    blob = encode_jpeg(img, 85, subsample="420", restart_interval=3)
    assert decode_jpeg(blob).tobytes() == decode_jpeg(blob).tobytes()


def test_typed_errors():
    img = _quad_img(16, 16)
    blob = encode_jpeg(img, 85)
    with pytest.raises(ValueError):  # ImageDecodeError subclasses ValueError
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 3])  # truncated mid-stream
    # flip SOF0 (0xC0) to SOF2 (0xC2): progressive must be a typed
    # unsupported error, not garbage pixels
    i = blob.find(b"\xff\xc0")
    prog = blob[:i] + b"\xff\xc2" + blob[i + 2 :]
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    # entropy garbage: corrupt a byte in the scan body
    bad = bytearray(blob)
    bad[-20] ^= 0x55
    try:
        out = decode_jpeg(bytes(bad))  # may still decode (JPEG is robust)
        assert out.shape == img.shape
    except ValueError:
        pass  # or raise a typed error — never anything else


def test_sniff_and_builtin_dispatch():
    img = _quad_img(16, 16)
    blob = encode_jpeg(img, 90)
    assert mm.sniff_format(blob) == "jpeg"
    out = mm.decode_image(blob)  # format inferred
    assert out.shape == img.shape
    out2 = mm.decode_image(blob, "jpg")  # extension alias
    assert (out == out2).all()


def test_image_stats_over_planted_jpegs(spark):
    """gen_images_batch now cycles jpeg payloads (ids ≡ 3 mod 4);
    image_stats decodes them with stats close to the known source image
    (q95 lossy bound), and a truncated jpeg surfaces as a decode_error
    row (truncated by hand — the fixture's own trunc slot, id ≡ 9 mod
    1000, never lands on jpeg in the 5-cycle)."""
    ids = np.array([3, 13], dtype=np.int64)
    pdf = fx.gen_images_batch(ids)
    assert list(pdf["format"]) == ["jpeg", "jpeg"]
    trunc_blob = pdf["payload"][0][: len(pdf["payload"][0]) // 3]
    rows = list(zip(pdf["media_id"], pdf["payload"])) + [("trunc", trunc_blob)]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in mm.image_stats(df).collect()}
    for i in (3, 13):
        r = out[f"img{int(i):08d}"]
        img = fx.synth_image(int(fx._splitmix64(np.array([i], dtype=np.uint64))[0]))
        assert r["decode_error"] is None
        assert (r["width"], r["height"], r["channels"]) == (img.shape[1], img.shape[0], 3)
        y = mm._luma(img)
        assert abs(r["mean_luma"] - y.mean()) < 1.0
        assert abs(r["std_luma"] - y.std()) < 2.0
    trunc = out["trunc"]
    assert trunc["decode_error"] is not None and trunc["mean_luma"] is None
