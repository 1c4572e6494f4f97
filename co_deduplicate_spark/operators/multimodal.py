"""Multimodal column handling (image/audio/video as opaque binary).

No reference counterpart — this is the training-data-pipeline extension:
media travels as ``binary`` columns with typed metadata structs; decode /
feature-extraction steps are Arrow-batched ``mapInPandas`` operators.

The actual codec calls are STUBBED in this environment (no image/audio
libraries in the container): ``decode_image_meta`` parses just enough of
the PNG/JPEG headers to be real (dimensions from the bytestream), and
``media_fingerprint`` hashes content — both deterministic. The Spark-side
plumbing — schema, batch iteration, partition sizing — is the production
shape; swap `_extract_features_stub` for a real model/codec worker.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "byte_len long, sha256 string, valid boolean"
)


def _png_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return w, h
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def decode_image_meta(media: DataFrame, id_col: str = "media_id",
                      blob_col: str = "blob") -> DataFrame:
    """binary → typed metadata via mapInPandas (per-partition Arrow batches,
    the pattern a real decoder plugs into)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                dims = _png_dims(b) or _jpeg_dims(b)
                kind = "png" if _png_dims(b) else ("jpeg" if _jpeg_dims(b) else "unknown")
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "width": dims[0] if dims else None,
                        "height": dims[1] if dims else None,
                        "byte_len": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "valid": dims is not None,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select(id_col, blob_col).mapInPandas(op, schema=MEDIA_SCHEMA)


FEATURE_DIM = 16
FEATURES_SCHEMA = "media_id long, features array<float>"


def extract_features(media: DataFrame, id_col: str = "media_id",
                     blob_col: str = "blob") -> DataFrame:
    """Feature extraction harness. STUB: deterministic pseudo-features from
    the content hash (stands in for a CNN/CLIP worker; the batching,
    schema, and shuffle shape are the real thing).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                seed = int.from_bytes(hashlib.sha256(b).digest()[:8], "little")
                rng = np.random.RandomState(seed % (2**32))
                feats.append(rng.standard_normal(FEATURE_DIM).astype(np.float32))
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select(id_col, blob_col).mapInPandas(op, schema=FEATURES_SCHEMA)


def exact_media_dedup(media: DataFrame, id_col: str = "media_id",
                      blob_col: str = "blob") -> DataFrame:
    """Exact media dedup: group by content hash — same hash-groupBy shape
    as text exact dedup (operators/exact.py), binary-safe."""
    return (
        media.select(F.col(id_col), F.sha2(F.col(blob_col), 256).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(F.collect_list(F.col(id_col))).alias("members"),
        )
    )
