"""Baseline JPEG (ITU T.81 sequential DCT, JFIF container) — pure
numpy + stdlib, no codec libraries.

Closes the tile-sink format gap (SURVEY 2.1: gdal2tiles --tiledriver
JPEG, gdal2tiles.py options.tiledriver): the sandbox has no PIL/libjpeg
(probed every round), so both directions are implemented from the
public spec, like the r4 PNG codec (RFC 2083 + stdlib zlib).

Scope — exactly what tile artifacts need:
  - encoder: grayscale (1 component) or RGB (3 components, 4:4:4 — no
    chroma subsampling), standard Annex-K-style quantization tables
    scaled by `quality` with the libjpeg 5000/q | 200-2q rule;
  - entropy coding: canonical Huffman tables GENERATED here (12
    4-bit DC codes, 162 8-bit AC codes — valid per T.81 since the
    tables ride the DHT segment; simpler and safer than transcribing
    the 162-entry Annex K defaults, at a few % size cost);
  - decoder: parses DQT/SOF0/DHT/SOS generically (any baseline
    non-subsampled stream with <= 2 table slots per class), Huffman
    bitstream with 0xFF00 unstuffing, dequantize + IDCT + color
    convert. Round-trip error is quantization-bounded, which the
    tests pin as PSNR floors.

JPEG is lossy: unlike the PNG sink there is no byte-exactness oracle;
parity with the reference is structural (marker layout, component
setup) + rate/distortion sanity, the same standard gdal2tiles itself
relies on libjpeg for.
"""
from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------- DCT bases

_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _D[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# zigzag: generated diagonal walk (T.81 figure 5)
_ZIG = np.zeros(64, dtype=np.int64)
_i = 0
for _s in range(15):
    rng = range(_s + 1)
    for _k in (rng if _s % 2 else reversed(rng)):
        _y = _k
        _x = _s - _k
        if _y < 8 and _x < 8:
            _ZIG[_i] = _y * 8 + _x
            _i += 1

# Annex K reference quantization tables (public constants)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------- canonical Huffman setup

# DC: symbols 0..11 (magnitude categories), all length 4
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# AC: 162 run/size symbols, all length 8 (EOB=0x00, ZRL=0xF0)
_AC_VALS = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] \
    + [0xF0]
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_VALS)     # all codes length 8


def _canonical(bits, vals):
    """(symbol -> (code, length)) from the DHT BITS/VALS lists."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


_DC_ENC = _canonical(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)   # 1-padding per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_blocks, 8, 8) row-major MCU order, edge-padded."""
    H, W = plane.shape
    ph = (H + 7) // 8 * 8
    pw = (W + 7) // 8 * 8
    p = np.empty((ph, pw), dtype=np.float64)
    p[:H, :W] = plane
    p[H:, :W] = plane[-1:, :]
    p[:, W:] = p[:, W - 1:W]
    return (p.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _encode_plane_coefs(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    b = _blocks(plane.astype(np.float64) - 128.0)
    f = np.einsum("ux,nxy,vy->nuv", _D, b, _D)
    q = qt.reshape(8, 8).astype(np.float64)
    coefs = np.round(f / q).astype(np.int64)
    return coefs.reshape(-1, 64)[:, _ZIG]      # zigzagged


def _rgb_to_ycbcr(rgb: np.ndarray):
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode(img: np.ndarray, *, quality: int = 85) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as baseline
    JFIF. 4:4:4, one DC + one AC Huffman table per table class."""
    img = np.asarray(img)
    assert img.dtype == np.uint8 and img.ndim in (2, 3)
    color = img.ndim == 3
    H, W = img.shape[:2]
    qt_l = _scaled_qt(QT_LUM, quality)
    if color:
        qt_c = _scaled_qt(QT_CHR, quality)
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [(y, qt_l, 0), (cb, qt_c, 1), (cr, qt_c, 1)]
    else:
        planes = [(img, qt_l, 0)]

    coef = [_encode_plane_coefs(p, qt) for p, qt, _ in planes]
    n_blocks = coef[0].shape[0]

    w = _BitWriter()
    prev_dc = [0] * len(planes)
    for n in range(n_blocks):                 # interleaved MCUs (4:4:4)
        for ci in range(len(planes)):
            z = coef[ci][n]
            diff = int(z[0]) - prev_dc[ci]
            prev_dc[ci] = int(z[0])
            cat = _category(diff)
            code, ln = _DC_ENC[cat]
            w.put(code, ln)
            if cat:
                v = diff if diff > 0 else diff + (1 << cat) - 1
                w.put(v, cat)
            run = 0
            last_nz = int(np.max(np.nonzero(z)[0])) if np.any(z[1:]) else 0
            for k in range(1, 64):
                v = int(z[k])
                if k > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln2 = _AC_ENC[0xF0]
                    w.put(c, ln2)
                    run -= 16
                cat = _category(v)
                c, ln2 = _AC_ENC[(run << 4) | cat]
                w.put(c, ln2)
                vv = v if v > 0 else v + (1 << cat) - 1
                w.put(vv, cat)
                run = 0
            if last_nz < 63:
                c, ln2 = _AC_ENC[0x00]        # EOB
                w.put(c, ln2)
    entropy = w.flush()

    out = bytearray(b"\xff\xd8")                          # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qt_l[_ZIG].tolist()))
    if color:
        out += _seg(0xDB, bytes([1]) + bytes(qt_c[_ZIG].tolist()))
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, H, W, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)                                # SOF0
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if color:
        out += _seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)                                # SOS
    out += entropy
    out += b"\xff\xd9"                                    # EOI
    return bytes(out)


# ------------------------------------------------------------ decoder

class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.i >= len(self.d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            b = self.d[self.i]
            self.i += 1
            if b == 0xFF:
                nxt = self.d[self.i] if self.i < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.i += 1                 # unstuff
                else:
                    self.i -= 1                 # marker: pad from here
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v


def _build_dec(bits, vals):
    dec = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            dec[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return dec


def _huff_read(r: _BitReader, dec) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read(1)
        if (ln, code) in dec:
            return dec[(ln, code)]
    raise ValueError("bad Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode(data: bytes) -> np.ndarray:
    """Decode a baseline non-subsampled JFIF stream (what encode()
    emits; any 8-bit SOF0 with 1x1 sampling parses). Returns (H, W)
    uint8 or (H, W, 3) RGB uint8."""
    assert data[:2] == b"\xff\xd8", "not a JPEG"
    i = 2
    qts = {}
    huff = {}
    comps = []
    H = W = 0
    scan = None
    while i < len(data):
        assert data[i] == 0xFF, "marker desync"
        m = data[i + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + ln]
        i += 2 + ln
        if m == 0xDB:
            j = 0
            while j < len(seg):
                pq_tq = seg[j]
                assert pq_tq >> 4 == 0, "16-bit QT unsupported"
                t = np.zeros(64, dtype=np.int64)
                t[_ZIG] = np.frombuffer(seg[j + 1:j + 65], dtype=np.uint8)
                qts[pq_tq & 0xF] = t
                j += 65
        elif m == 0xC0:
            _, H, W, nc = struct.unpack(">BHHB", seg[:6])
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                assert samp == 0x11, "subsampled JPEG unsupported"
                comps.append((cid, tq))
        elif m in (0xC1, 0xC2, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tc_th = seg[j]
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                huff[(tc_th >> 4, tc_th & 0xF)] = _build_dec(bits, vals)
                j += 17 + nv
        elif m == 0xDA:
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c:3 + 2 * c]
                scan.append((cid, tables >> 4, tables & 0xF))
            entropy = data[i:]
            break
    assert scan is not None and H and W

    bw = (W + 7) // 8
    bh = (H + 7) // 8
    n_blocks = bw * bh
    r = _BitReader(entropy)
    planes = []
    qt_of = {cid: qts[tq] for cid, tq in comps}
    coefs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in scan]
    prev_dc = [0] * len(scan)
    for n in range(n_blocks):
        for si, (cid, td, ta) in enumerate(scan):
            z = coefs[si][n]
            cat = _huff_read(r, huff[(0, td)])
            diff = _extend(r.read(cat), cat) if cat else 0
            prev_dc[si] += diff
            z[0] = prev_dc[si]
            k = 1
            while k < 64:
                rs = _huff_read(r, huff[(1, ta)])
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                cat = rs & 0xF
                z[k] = _extend(r.read(cat), cat)
                k += 1
    for si, (cid, td, ta) in enumerate(scan):
        q = qt_of[cid].astype(np.float64)
        f = np.zeros((n_blocks, 64))
        f[:, _ZIG] = coefs[si] * q[_ZIG]
        f = f.reshape(-1, 8, 8)
        b = np.einsum("ux,nuv,vy->nxy", _D, f, _D) + 128.0
        p = (b.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
             .reshape(bh * 8, bw * 8))[:H, :W]
        planes.append(p)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r_, g_, b_], axis=2)), 0, 255) \
        .astype(np.uint8)
