"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns + typed metadata structs —
the engine moves and batches them (Arrow). Decode / feature-extract
stages are Arrow-batched `mapInPandas` UDFs. As of r5 every modality
has a REAL in-repo codec path: images (PNG kernels/png.py, baseline
JPEG kernels/jpeg.py), audio (RIFF/WAVE PCM kernels/wav.py), video
(AVI/MJPEG kernels/avi.py demux + JPEG frame decode) — each gated
against a closed-form oracle. Compressed-codec formats beyond these
(WebP, MP3/AAC, H.264) remain STUBBED behind `decode_stub` (no codec
libs in this container, probed every round), with a deterministic
fake so schema, batching and partitioning stay testable.

This mirrors how the reference treats raster payloads it cannot decode:
the driver layer moves opaque blocks; interpretation is pluggable
(GDALRasterBand IReadBlock per-driver, gcore/gdalrasterband.cpp).
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_ref string, n_bytes bigint, magic string, "
    "kind string, width int, height int, checksum bigint"
)


def attach_media(df: DataFrame, *, id_col: str = "doc_id",
                 text: str = "text") -> DataFrame:
    """Synthesize a deterministic media binary column from the text
    (stand-in for reading object-store blobs): payload = utf-8 bytes
    with a 4-byte kind tag. Real pipelines replace this with a
    binaryFile / Iceberg read — same schema seam."""
    kind = F.element_at(
        F.array(F.lit("IMG0"), F.lit("AUD0"), F.lit("VID0")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        kind.alias("media_kind"),
        F.concat(F.lit("m://"), F.col(id_col).cast("string")).alias("media_ref"),
        F.encode(F.concat(kind, F.col(text)), "UTF-8").alias("payload"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake of an image/audio decode.

    A real deployment swaps this for PIL/libav behind the same
    signature. Raises on unknown magic, like a real codec would.
    """
    magic = payload[:4].decode("ascii", errors="replace")
    if magic not in ("IMG0", "AUD0", "VID0"):
        raise NotImplementedError(f"no codec for magic {magic!r}")
    n = len(payload)
    # fake dimensions derived from content length — deterministic
    return {
        "magic": magic,
        "width": int(16 + n % 64),
        "height": int(16 + (n * 7) % 64),
        "checksum": int(np.frombuffer(payload, dtype=np.uint8).astype(np.int64).sum()),
    }


FRAME_SCHEMA = (
    "doc_id bigint, media_ref string, frame_idx int, frame_off bigint, "
    "frame_len int, frame_checksum bigint"
)


def frame_sample(df: DataFrame, *, every_k: int = 4,
                 frame_bytes: int = 16) -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as a sequence
    of fixed-size frames (the stub's stand-in for a real container
    demuxer) and emit every k-th frame's (offset, length, checksum) —
    one row per sampled frame, rows fan out inside the same Arrow
    batch. A real deployment swaps the slicing for libav keyframe
    extraction behind the identical row contract; the partitioning,
    batch shape and fan-out — the parts Spark owns — are real.

    Non-video payloads (magic != VID0) produce no rows, like a demuxer
    rejecting a non-container input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, refs, fidx, foff, flen, fsum = [], [], [], [], [], []
            for did, ref, payload in zip(pdf["doc_id"], pdf["media_ref"],
                                         pdf["payload"]):
                if payload[:4] != b"VID0":
                    continue
                body = payload[4:]
                n_frames = len(body) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    off = 4 + fi * frame_bytes
                    chunk = payload[off:off + frame_bytes]
                    ids.append(did)
                    refs.append(ref)
                    fidx.append(fi)
                    foff.append(off)
                    flen.append(len(chunk))
                    fsum.append(int(np.frombuffer(chunk, dtype=np.uint8)
                                    .astype(np.int64).sum()))
            yield pd.DataFrame({
                "doc_id": ids, "media_ref": refs,
                "frame_idx": pd.array(fidx, dtype="int32"),
                "frame_off": foff,
                "frame_len": pd.array(flen, dtype="int32"),
                "frame_checksum": fsum,
            })

    return df.mapInPandas(run, FRAME_SCHEMA)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: one Arrow batch in, one
    metadata row per media out. The batch loop is the real scale
    surface (vectorized transfer, per-partition codec init)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition "codec" initialization happens here, once
        for pdf in batches:
            metas = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "magic": [m["magic"] for m in metas],
                "kind": pdf["media_kind"],
                "width": pd.array([m["width"] for m in metas], dtype="int32"),
                "height": pd.array([m["height"] for m in metas], dtype="int32"),
                "checksum": [m["checksum"] for m in metas],
            })

    return df.mapInPandas(run, MEDIA_META_SCHEMA)


# ------------------------------- real PNG image path (r5, own codec)

def attach_png_media(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic grayscale PNG payloads — REAL encoded bytes from
    the engine's own stdlib-zlib codec (kernels/png.py), so the image
    branch of the multimodal surface runs an actual codec instead of
    the magic-tag stub: w = 8 + id % 9, h = 8 + (id * 3) % 7,
    pixel(k) = (id * 31 + k) % 256 row-major. The closed form is what
    lets the oracle grade the decode end-to-end."""
    from ..kernels import png as png_mod

    @F.pandas_udf("binary")
    def _enc(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w = 8 + i % 9
            h = 8 + (i * 3) % 7
            arr = ((i * 31 + np.arange(w * h, dtype=np.int64)) % 256) \
                .astype(np.uint8).reshape(h, w)
            out.append(png_mod.encode_gray(arr))
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        F.concat(F.lit("png://"), F.col(id_col).cast("string"))
        .alias("media_ref"),
        _enc(F.col(id_col)).alias("payload"),
    )


IMAGE_FEATURES_SCHEMA = ("doc_id bigint, width int, height int, "
                         "px_sum bigint, px_min int, px_max int")


def image_features(df: DataFrame, *, payload: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """REAL image decode + feature extraction: sniff the payload magic
    and decode with the in-repo codec — PNG (kernels/png.py), baseline
    JPEG (kernels/jpeg.py) or lossless WebP (kernels/webp.py) —
    per-batch loop over Arrow transfer, the mapInPandas shape a
    PIL/libvips deployment uses. Emits dimensions + integer pixel
    statistics; unknown magic raises, like a codec would."""
    from ..kernels import jpeg as jpeg_mod
    from ..kernels import png as png_mod
    from ..kernels import webp as webp_mod

    def _decode(b: bytes):
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return png_mod.decode(b)
        if b[:2] == b"\xff\xd8":
            return jpeg_mod.decode(b)
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            return webp_mod.decode(b)
        raise NotImplementedError(f"no codec for magic {b[:4]!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums, mins, maxs = [], [], [], [], [], []
            for did, payload_b in zip(pdf[id_col], pdf[payload]):
                arr = _decode(bytes(payload_b))
                if arr.ndim == 3:       # RGBA -> per-pixel sum basis
                    flat = arr.reshape(-1, arr.shape[2])[:, 0]
                else:
                    flat = arr.ravel()
                ids.append(did)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                sums.append(int(flat.astype(np.int64).sum()))
                mins.append(int(flat.min()))
                maxs.append(int(flat.max()))
            yield pd.DataFrame({
                "doc_id": ids,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "px_sum": sums,
                "px_min": pd.array(mins, dtype="int32"),
                "px_max": pd.array(maxs, dtype="int32"),
            })

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def image_resize(df: DataFrame, *, out_w: int, out_h: int,
                 method: str = "box", payload: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Decode -> resize -> re-encode, all with the engine's own
    codec/numpy (nearest or integer box-average); emits
    (doc_id, payload) with the resized PNG. The distributed shape —
    Arrow batches through mapInPandas, payload-in payload-out — is
    the one a real thumbnailing pipeline uses."""
    from ..kernels import png as png_mod

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for did, payload_b in zip(pdf[id_col], pdf[payload]):
                arr = png_mod.decode(bytes(payload_b))
                gray = arr if arr.ndim == 2 else arr[:, :, 0]
                h, w = gray.shape
                if method == "nearest":
                    yi = (np.arange(out_h) * h) // out_h
                    xi = (np.arange(out_w) * w) // out_w
                    res = gray[yi[:, None], xi[None, :]]
                else:  # integer box average over the source footprint
                    y0 = (np.arange(out_h) * h) // out_h
                    y1 = np.maximum(((np.arange(out_h) + 1) * h) // out_h,
                                    y0 + 1)
                    x0 = (np.arange(out_w) * w) // out_w
                    x1 = np.maximum(((np.arange(out_w) + 1) * w) // out_w,
                                    x0 + 1)
                    c = gray.astype(np.int64).cumsum(0).cumsum(1)
                    cp = np.zeros((h + 1, w + 1), dtype=np.int64)
                    cp[1:, 1:] = c
                    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :])
                    tot = (cp[y1[:, None], x1[None, :]]
                           - cp[y0[:, None], x1[None, :]]
                           - cp[y1[:, None], x0[None, :]]
                           + cp[y0[:, None], x0[None, :]])
                    res = (tot // area).astype(np.uint8)
                ids.append(did)
                outs.append(png_mod.encode_gray(res.astype(np.uint8)))
            yield pd.DataFrame({id_col: ids, "payload": outs})

    return df.mapInPandas(run, f"{id_col} bigint, payload binary")


# ------------------------------- real WAV audio path (r5, own codec)

WAV_N = 2048
WAV_RATE = 16000


def attach_wav_media(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic mono 16-bit WAV payloads — REAL RIFF/PCM bytes
    from kernels/wav.py: sample[k] = ((id*17 + 13*k) % 65536) - 32768
    over WAV_N samples at WAV_RATE. The closed form is what lets the
    oracle grade the decode end-to-end."""
    from ..kernels import wav as wav_mod

    @F.pandas_udf("binary")
    def _enc(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            x = (((i * 17 + 13 * np.arange(WAV_N, dtype=np.int64)) % 65536)
                 - 32768).astype(np.int16)
            out.append(wav_mod.write(x, sample_rate=WAV_RATE))
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        F.concat(F.lit("wav://"), F.col(id_col).cast("string"))
        .alias("media_ref"),
        _enc(F.col(id_col)).alias("payload"),
    )


AUDIO_FEATURES_SCHEMA = ("doc_id bigint, n_samples bigint, sample_rate int, "
                         "s_sum bigint, s_min int, s_max int, "
                         "zero_cross bigint")


def audio_features(df: DataFrame, *, payload: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode + feature extraction: parse the WAV payload
    with kernels.wav.read (RIFF chunk walk) and emit duration/integer
    sample statistics + zero-crossing count — the feature set a
    quality-filtering audio pipeline keys on."""
    from ..kernels import wav as wav_mod

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rs, ss, mn, mx, zc = [], [], [], [], [], [], []
            for did, payload_b in zip(pdf[id_col], pdf[payload]):
                a, rate = wav_mod.read(bytes(payload_b))
                x = a[:, 0].astype(np.int64)
                ids.append(did)
                ns.append(len(x))
                rs.append(rate)
                ss.append(int(x.sum()))
                mn.append(int(x.min()))
                mx.append(int(x.max()))
                sign = x >= 0
                zc.append(int((sign[1:] != sign[:-1]).sum()))
            yield pd.DataFrame({
                "doc_id": ids, "n_samples": ns,
                "sample_rate": pd.array(rs, dtype="int32"),
                "s_sum": ss,
                "s_min": pd.array(mn, dtype="int32"),
                "s_max": pd.array(mx, dtype="int32"),
                "zero_cross": zc,
            })

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# --------------------------- real AVI/MJPEG video path (r5, own codecs)

AVI_W = 16
AVI_H = 16


def attach_avi_media(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MJPEG AVI payloads — REAL container bytes
    (kernels/avi.py) around REAL JPEG frames (kernels/jpeg.py):
    n_frames = 3 + id % 4, frame f's 16x16 gray pixels
    (id*7 + f*11 + k) % 256."""
    from ..kernels import avi as avi_mod
    from ..kernels import jpeg as jpeg_mod

    @F.pandas_udf("binary")
    def _enc(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            frames = []
            for f in range(3 + i % 4):
                img = ((i * 7 + f * 11
                        + np.arange(AVI_W * AVI_H, dtype=np.int64)) % 256) \
                    .astype(np.uint8).reshape(AVI_H, AVI_W)
                frames.append(jpeg_mod.encode(img, quality=90))
            out.append(avi_mod.write_mjpeg(frames, width=AVI_W, height=AVI_H))
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        F.concat(F.lit("avi://"), F.col(id_col).cast("string"))
        .alias("media_ref"),
        _enc(F.col(id_col)).alias("payload"),
    )


VIDEO_FRAME_SCHEMA = ("doc_id bigint, frame_idx int, n_frames int, "
                      "width int, height int")


def video_frame_sample(df: DataFrame, *, every_k: int = 2,
                       payload: str = "payload",
                       id_col: str = "doc_id") -> DataFrame:
    """REAL video frame sampling: demux the AVI container
    (kernels/avi.py), take every k-th frame, decode it with the
    in-repo JPEG codec to verify it is a valid image, and emit one row
    per sampled frame — the demux-decode-fanout shape a libav
    deployment uses behind the same row contract."""
    from ..kernels import avi as avi_mod
    from ..kernels import jpeg as jpeg_mod

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, nfr, ws, hs = [], [], [], [], []
            for did, payload_b in zip(pdf[id_col], pdf[payload]):
                w, h, frames = avi_mod.read_frames(bytes(payload_b))
                for fi in range(0, len(frames), every_k):
                    arr = jpeg_mod.decode(frames[fi])
                    ids.append(did)
                    fidx.append(fi)
                    nfr.append(len(frames))
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
            yield pd.DataFrame({
                "doc_id": ids,
                "frame_idx": pd.array(fidx, dtype="int32"),
                "n_frames": pd.array(nfr, dtype="int32"),
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
            })

    return df.mapInPandas(run, VIDEO_FRAME_SCHEMA)
