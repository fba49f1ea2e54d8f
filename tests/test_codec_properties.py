"""Property-based round-trip invariants for the round-5 codecs (JPEG,
GIF, IMA ADPCM) — random shapes/content via hypothesis, no Spark
session needed. Mirrors the reference's hypothesis suite style
(tests/test_validators.py) at the codec layer:

- GIF: DECODE(ENCODE(x)) == x for every ≤256-color image (indexed
  lossless — exactness is the contract).
- JPEG: decode never crashes on any encoder output, shape always round
  trips, q95 error is bounded.
- ADPCM: vectorized decode == textbook scalar decode bit-for-bit on
  arbitrary int16 signals; round-trip length is preserved.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jschon_spark.audio.adpcm import decode_ima_adpcm, encode_ima_adpcm
from jschon_spark.operators.gif import decode_gif, encode_gif, quantize_median_cut
from jschon_spark.operators.jpeg import decode_jpeg, encode_jpeg

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@given(hw=dims, seed=st.integers(0, 2**31), n_colors=st.integers(2, 256))
@settings(**SETTINGS)
def test_gif_roundtrip_exact(hw, seed, n_colors):
    h, w = hw
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@given(hw=dims, seed=st.integers(0, 2**31))
@settings(**SETTINGS)
def test_gif_quantize_bounds(hw, seed):
    h, w = hw
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    q = quantize_median_cut(img, 64)
    assert q.shape == (h, w, 3)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 64
    assert np.array_equal(decode_gif(encode_gif(q)), q)


@given(
    hw=dims,
    seed=st.integers(0, 2**31),
    quality=st.integers(20, 95),
    mode=st.sampled_from(["444", "420"]),
    gray=st.booleans(),
)
@settings(**SETTINGS)
def test_jpeg_roundtrip_shape_and_bound(hw, seed, quality, mode, gray):
    h, w = hw
    rng = np.random.default_rng(seed)
    if gray:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        want_shape = (h, w, 1)
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        want_shape = (h, w, 3)
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsample=mode if not gray else "444"))
    assert dec.shape == want_shape
    # lossy but bounded: uint8 range by construction, and at q>=90 the
    # error on ANY content stays under the coarse quantization ceiling
    if quality >= 90:
        src = img[:, :, None] if gray else img
        assert np.abs(dec.astype(int) - src.astype(int)).mean() < 24.0


@given(
    n=st.integers(1, 4000),
    seed=st.integers(0, 2**31),
    block_align=st.sampled_from([32, 128, 256, 512]),
)
@settings(**SETTINGS)
def test_adpcm_scalar_parity_and_length(n, seed, block_align):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, n, dtype=np.int64).astype(np.int16)
    blob = encode_ima_adpcm(x, block_align=block_align)
    dec = decode_ima_adpcm(blob, block_align=block_align)
    assert dec is not None and len(dec) >= n  # block padding only adds

    # textbook scalar replica (same tables, per-sample walk)
    from tests.test_adpcm import _scalar_decode

    assert np.array_equal(dec, _scalar_decode(blob, block_align))
