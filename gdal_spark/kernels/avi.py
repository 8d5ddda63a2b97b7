"""Minimal AVI (RIFF) MJPEG container — writer + frame parser.

Makes the multimodal VIDEO branch real: an AVI file whose video stream
is Motion-JPEG is just RIFF framing around per-frame JPEG payloads
(public format: RIFF 'AVI ' -> LIST hdrl {avih, LIST strl {strh,
strf/BITMAPINFOHEADER 'MJPG'}} -> LIST movi {'00dc' chunks} -> idx1),
and the frames decode with the in-repo baseline JPEG codec
(kernels/jpeg.py). No libav in this container (probed every round);
this covers the demux-and-decode path a frame-sampling training
pipeline needs. Audio streams, other codecs, and OpenDML extensions
are out of scope — the parser skips unknown chunks and rejects
non-MJPG video like a demuxer would.
"""
from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (kept for API symmetry with siblings)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def write_mjpeg(frames: list[bytes], *, width: int, height: int,
                fps: int = 10) -> bytes:
    """Single-video-stream MJPEG AVI from per-frame JPEG buffers."""
    n = len(frames)
    max_len = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),       # dwMicroSecPerFrame
        0, 0,
        0x10,                           # AVIF_HASINDEX
        n, 0, 1, max_len, width, height,
        0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_len,
        0xFFFFFFFF, 0, 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' kind field)
    idx = b""
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def read_frames(buf: bytes):
    """-> (width, height, [jpeg_bytes per frame]). Walks RIFF
    generically; frames are the movi LIST's '00dc'/'00db' chunks in
    order. Rejects non-AVI RIFF and non-MJPG video streams."""
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI ", "not an AVI"
    width = height = None
    frames = []
    last_type = b""       # fccType of the most recent strh

    def walk(data: bytes, in_movi: bool) -> None:
        nonlocal width, height, last_type
        i = 0
        while i + 8 <= len(data):
            cid = data[i:i + 4]
            ln = struct.unpack("<I", data[i + 4:i + 8])[0]
            body = data[i + 8:i + 8 + ln]
            if cid == b"LIST":
                kind = body[:4]
                walk(body[4:], in_movi or kind == b"movi")
            elif cid == b"strh":
                last_type = body[:4]
            elif cid == b"strf" and last_type == b"vids" and width is None:
                # only a VIDEO stream's strf is a BITMAPINFOHEADER —
                # an audio strf (WAVEFORMATEX) is shorter and must be
                # skipped, not parsed
                (_, w, h, _, _, comp) = struct.unpack("<IiiHH4s", body[:20])
                if comp not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"video codec {comp!r} unsupported")
                width, height = w, abs(h)
            elif in_movi and cid in (b"00dc", b"00db"):
                frames.append(bytes(body))
            i += 8 + ln + (ln & 1)

    walk(buf[12:], False)
    assert width is not None, "no video stream header"
    return width, height, frames
