"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns + typed metadata structs —
the engine moves and batches them (Arrow), it does not interpret them.
Decode / feature-extract stages are Arrow-batched `mapInPandas` UDFs;
in this container the actual codecs are STUBBED (no image/audio libs)
behind `decode_stub`, with a deterministic fake so schema, batching,
partitioning and tests are real.

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
