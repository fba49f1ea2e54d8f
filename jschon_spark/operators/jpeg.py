"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81).

JPEG is the dominant image format in any real multimodal corpus, so the
built-in decoder set (operators/multimodal.py: PPM/PGM, BMP, PNG) was
dishonest without it — every JPEG payload needed an injected
codec-library ``decoder=``.  This module implements the baseline
sequential DCT process from the public spec with numpy and the stdlib
only:

- **decode_jpeg**: marker parse (DQT/DHT/SOF0/SOF1/DRI/SOS, APPn/COM
  skipped), Huffman entropy decode via a 16-bit-prefix lookup table
  (one table probe per symbol — the classic libjpeg fast path, not
  bit-by-bit tree walking), restart-interval handling, dequantize +
  de-zigzag, batch matrix IDCT over all blocks of a component at once
  (``A.T @ X @ A`` with the separable DCT-II basis), chroma upsampling
  for sampling factors 1-2 (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), JFIF
  YCbCr→RGB.  Progressive (SOF2) and the other non-baseline coding
  processes raise ``ImageDecodeError`` — they are different entropy
  layouts, not a truncation bug.
- **encode_jpeg**: the matching fixture-side encoder (4:4:4, Annex K
  quantization tables scaled by the libjpeg quality curve, Annex K
  Huffman tables) so tests can synthesize deterministic payloads and
  pin decode against the known source image (the synthesis-contract
  oracle pattern used by every other codec here).

Everything is deterministic: same array + quality → same bytes; same
bytes → same pixels.  The per-symbol entropy loop is the only Python
loop; all pixel math (IDCT, color transform, upsample) is vectorized
over whole components, and in the Spark pipeline the decode runs
inside the Arrow-batched ``image_stats``/``extract_features`` stages,
i.e. embarrassingly parallel across executors.

Reference scope note: handrews/jschon has no media surface; this is
part of the training-data-pipeline extension the task brief mandates.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]


class ImageDecodeError(ValueError):
    # re-bound by multimodal.py so callers see ONE error type; defined
    # here too so this module imports standalone
    pass


# -- constants from the public spec (ITU-T T.81 Annex K) ---------------------

# zigzag scan: _ZZ[i] = natural (row-major) index of the i-th zigzag coef
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# separable DCT-II basis: A[k, n] = c_k cos((2n+1) k pi / 16)
_A = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _c = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
del _k, _n, _c


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """The libjpeg quality curve: 1-100 → table scale factor."""
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.floor((base * s + 50.0) / 100.0)
    return np.clip(t, 1, 255)


# -- Huffman code construction ----------------------------------------------

def _huff_codes(bits: list, vals: list) -> dict:
    """symbol → (code, length), canonical order per the spec."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lut(bits: list, vals: list) -> tuple:
    """16-bit-prefix lookup: peek 16 bits, one probe gives (symbol,
    code length). Unassigned prefixes keep length 0 → invalid code."""
    sym = [0] * 65536
    ln = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = [vals[k]] * (hi - lo)
            ln[lo:hi] = [length] * (hi - lo)
            code += 1
            k += 1
        if code > (1 << length):
            raise ImageDecodeError("over-subscribed Huffman table")
        code <<= 1
    return sym, ln


# -- color transforms (JFIF) ------------------------------------------------

def _rgb_to_ycbcr(f: np.ndarray) -> tuple:
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# -- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return dc


def _pad_to(ch: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return np.pad(
        ch, ((0, rows - ch.shape[0]), (0, cols - ch.shape[1])), mode="edge"
    )


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF JPEG with Annex K quantization (quality-scaled)
    and Huffman tables. Accepts HxW, HxWx1 (grayscale, 1-component
    stream) or HxWx3 (RGB). ``subsample`` is ``"444"`` or ``"420"``
    (box-mean chroma downsample, 16x16 MCUs); ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs — both exist so the
    decoder's MCU-interleave, upsample, and restart paths have a
    first-party bitstream source."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ImageDecodeError(f"encode_jpeg wants HxW[x{{1,3}}], got {a.shape}")
    if subsample not in ("444", "420"):
        raise ImageDecodeError(f"subsample must be 444 or 420, got {subsample!r}")
    h, w, c = a.shape
    if h == 0 or w == 0:
        raise ImageDecodeError("empty image")
    gray = c == 1
    f = a.astype(np.float64)
    planes = [f[:, :, 0]] if gray else list(_rgb_to_ycbcr(f))

    if gray or subsample == "444":
        factors = [(1, 1)] * len(planes)
    else:
        factors = [(2, 2), (1, 1), (1, 1)]
        # box-mean 2x2 chroma downsample (pad odd dims first)
        for ci in (1, 2):
            p = _pad_to(planes[ci], h + (h % 2), w + (w % 2))
            planes[ci] = 0.25 * (
                p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
            )
    hmax = max(fx for fx, _ in factors)
    vmax = max(fy for _, fy in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qt_l = _scale_qt(_Q_LUMA, quality)
    qt_c = _scale_qt(_Q_CHROMA, quality)
    qts = [qt_l] if gray else [qt_l, qt_c]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (tables in zigzag order per the spec)
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in qt[_ZZ])
    # SOF0
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hs, vs = factors[ci]
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, int(restart_interval))
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_tabs = [_huff_codes(*_DC_LUMA)] + ([] if gray else [_huff_codes(*_DC_CHROMA)] * 2)
    ac_tabs = [_huff_codes(*_AC_LUMA)] + ([] if gray else [_huff_codes(*_AC_CHROMA)] * 2)

    # quantized zigzag coefficients per component, as a full MCU-aligned
    # block grid (rows = mcuy*v, cols = mcux*h) — all vectorized
    comp_zz = []
    grids = []
    for ci, plane in enumerate(planes):
        hs, vs = factors[ci]
        rows, cols = mcuy * vs * 8, mcux * hs * 8
        p = _pad_to(plane, rows, cols) - 128.0
        nby, nbx = rows // 8, cols // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = _A @ blocks @ _A.T
        qt = qts[0] if ci == 0 else qts[1]
        q = np.round(coef.reshape(-1, 64) / qt[None, :]).astype(np.int32)
        comp_zz.append(q[:, _ZZ].reshape(nby, nbx, 64))
        grids.append((nby, nbx))

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                hs, vs = factors[ci]
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            bw,
                            comp_zz[ci][my * vs + by, mx * hs + bx],
                            preds[ci],
                            dc_tabs[ci],
                            ac_tabs[ci],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------

class _BitReader:
    """Bit reader over unstuffed entropy bytes; 16-bit peek feeds the
    Huffman LUT. Consuming past the real data raises (truncated)."""

    __slots__ = ("d", "pos", "acc", "n", "consumed", "total")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.consumed = 0
        self.total = 8 * len(data)

    def _fill(self, need: int) -> None:
        while self.n < need:
            byte = self.d[self.pos] if self.pos < len(self.d) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def huff(self, lut_sym: list, lut_len: list) -> int:
        self._fill(16)
        v = (self.acc >> (self.n - 16)) & 0xFFFF
        length = lut_len[v]
        if length == 0:
            raise ImageDecodeError("invalid Huffman code")
        if self.consumed + length > self.total:
            raise ImageDecodeError("truncated entropy-coded data")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        self.consumed += length
        return lut_sym[v]

    def receive_extend(self, s: int) -> int:
        if self.consumed + s > self.total:
            raise ImageDecodeError("truncated entropy-coded data")
        self._fill(s)
        v = (self.acc >> (self.n - s)) & ((1 << s) - 1)
        self.n -= s
        self.acc &= (1 << self.n) - 1
        self.consumed += s
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


def _split_scan(b: bytes, pos: int) -> tuple:
    """Entropy-coded data from ``pos`` → (list of unstuffed segments
    split at RST markers, index just past the scan)."""
    segs, cur = [], bytearray()
    n = len(b)
    i = pos
    while i < n:
        byte = b[i]
        if byte != 0xFF:
            cur.append(byte)
            i += 1
            continue
        nxt = b[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker: scan over
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline sequential JPEG → HxWxC uint8 (C = 1 or 3)."""
    b = bytes(blob or b"")
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG payload")
    qts: dict = {}
    luts: dict = {}
    frame = None
    dri = 0
    segs = None
    scan_comps = None
    pos = 2
    n = len(b)
    while pos < n:
        if b[pos] != 0xFF:
            raise ImageDecodeError("expected marker")
        while pos < n and b[pos] == 0xFF:  # optional fill bytes
            pos += 1
        if pos >= n:
            raise ImageDecodeError("truncated marker stream")
        m = b[pos]
        pos += 1
        if m == 0xD9:  # EOI
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:  # parameterless
            continue
        if pos + 2 > n:
            raise ImageDecodeError("truncated segment length")
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seg_len]
        if seg_len < 2 or len(seg) != seg_len - 2:
            raise ImageDecodeError("truncated segment")
        pos += seg_len
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ImageDecodeError("16-bit quantization tables unsupported")
                if i + 65 > len(seg):
                    raise ImageDecodeError("truncated DQT")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=i + 1)
                nat = np.zeros(64, dtype=np.float64)
                nat[_ZZ] = zz.astype(np.float64)  # stored zigzag → natural
                qts[tq] = nat
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                if i + 17 > len(seg):
                    raise ImageDecodeError("truncated DHT")
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                if i + 17 + nv > len(seg):
                    raise ImageDecodeError("truncated DHT values")
                vals = list(seg[i + 17 : i + 17 + nv])
                luts[(tc, th)] = _huff_lut(bits, vals)
                i += 17 + nv
        elif m in (0xC0, 0xC1):  # baseline / extended sequential (Huffman)
            prec, fh, fw, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ImageDecodeError(f"{prec}-bit precision unsupported")
            if fh == 0 or fw == 0 or nc not in (1, 3):
                raise ImageDecodeError(f"unsupported frame {fw}x{fh}x{nc}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                hs, vs = hv >> 4, hv & 15
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ImageDecodeError(f"sampling factors {hs}x{vs} unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageDecodeError("non-baseline JPEG coding process unsupported (e.g. progressive)")
        elif m == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ImageDecodeError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next((c for c in frame["comps"] if c["id"] == cid), None)
                if comp is None:
                    raise ImageDecodeError("scan references unknown component")
                scan_comps.append((comp, tt >> 4, tt & 15))
            if ns != len(frame["comps"]):
                raise ImageDecodeError("multi-scan JPEG unsupported")
            segs, pos = _split_scan(b, pos)
            break  # baseline: single scan carries the whole image
        # else: APPn / COM / others — skipped
    if frame is None or segs is None:
        raise ImageDecodeError("missing SOF/SOS")

    fh, fw, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    # coefficient stores: (block_rows, block_cols, 64) per component
    stores = []
    for comp, _, _ in scan_comps:
        stores.append(
            np.zeros((mcuy * comp["v"], mcux * comp["h"], 64), dtype=np.float64)
        )

    for comp, tdc, tac in scan_comps:
        if (0, tdc) not in luts or (1, tac) not in luts:
            raise ImageDecodeError("scan references missing Huffman table")
        if comp["tq"] not in qts:
            raise ImageDecodeError("missing quantization table")

    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(scan_comps)
    mcu_count = 0
    coef = np.zeros(64, dtype=np.float64)
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ImageDecodeError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                preds = [0] * len(scan_comps)
            for ci, (comp, tdc, tac) in enumerate(scan_comps):
                dc_sym, dc_len = luts[(0, tdc)]
                ac_sym, ac_len = luts[(1, tac)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef[:] = 0.0
                        s = reader.huff(dc_sym, dc_len)
                        diff = reader.receive_extend(s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_sym, ac_len)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ImageDecodeError("AC coefficient index overflow")
                            coef[k] = reader.receive_extend(sz)
                            k += 1
                        stores[ci][my * comp["v"] + by, mx * comp["h"] + bx] = coef
            mcu_count += 1

    # dequantize (zigzag-indexed), de-zigzag, batch IDCT, reassemble
    planes = []
    for ci, (comp, _, _) in enumerate(scan_comps):
        rows, cols, _ = stores[ci].shape
        zzq = qts[comp["tq"]][_ZZ]  # natural table → zigzag index order
        deq = stores[ci].reshape(-1, 64) * zzq[None, :]
        nat = np.zeros_like(deq)
        nat[:, _ZZ] = deq
        blocks = _A.T @ nat.reshape(-1, 8, 8) @ _A + 128.0
        plane = (
            blocks.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
        # crop to the component's own dims, then upsample to full frame
        ch = -(-fh * comp["v"] // vmax)
        cw = -(-fw * comp["h"] // hmax)
        plane = plane[:ch, :cw]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
