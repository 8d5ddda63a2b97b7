"""Dependency-free PNG codec (stdlib zlib only) for the tile sink.

The PNG format is public (RFC 2083 / W3C PNG spec). gdal2tiles writes
its {z}/{x}/{y}.png artifacts through the PNG driver
(gdal2tiles.py tile rendering + autotest/pyscripts/test_gdal2tiles.py
expected_cs checksums over the written bands); this codec closes the
sink end-to-end without any image dependency: 8-bit grayscale (color
type 0) and RGBA (color type 6), filter 0 scanlines, one zlib IDAT.

The decoder exists for verification (tests read the written artifact
back and recompute the reference checksum) and supports the filters
our encoder emits plus Paeth/Sub/Up/Average for robustness.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _encode(arr: np.ndarray, color_type: int, channels: int) -> bytes:
    assert arr.dtype == np.uint8
    h, w = arr.shape[0], arr.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    # filter byte 0 (None) per scanline
    scan = np.empty((h, 1 + w * channels), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = raw
    idat = zlib.compress(scan.tobytes(), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def encode_rgba(arr: np.ndarray) -> bytes:
    """(h, w, 4) uint8 -> PNG bytes (color type 6)."""
    assert arr.ndim == 3 and arr.shape[2] == 4
    return _encode(arr, 6, 4)


def encode_gray(arr: np.ndarray) -> bytes:
    """(h, w) uint8 -> PNG bytes (color type 0)."""
    assert arr.ndim == 2
    return _encode(arr[:, :, None], 0, 1)


def decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (h, w) for grayscale, (h, w, 4) for
    RGBA. 8-bit depth, no interlace, filters 0-4."""
    assert buf[:8] == _SIG, "not a PNG"
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        crc_got = struct.unpack(">I", buf[pos + 8 + ln:pos + 12 + ln])[0]
        assert crc_got == (zlib.crc32(tag + data) & 0xFFFFFFFF), "bad CRC"
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data)
            assert depth == 8 and comp == 0 and filt == 0 and inter == 0
            assert color_type in (0, 6)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    ch = 4 if color_type == 6 else 1
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=p + 1).astype(np.int32)
        p += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    if ch == 1:
        return out
    return out.reshape(h, w, 4)
