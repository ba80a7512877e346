"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11 L11).

Media travel as opaque ``BinaryType`` payload columns plus a typed
metadata struct — the pattern that scales: payloads stay columnar
(parquet binary, never driver-collected), every transform is an
Arrow-batched ``mapInPandas`` whose batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are stubs: ``decode_*`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-level fake (byte-histogram features, length-based
"duration") exercises the full Spark plumbing — schema, partitioning,
UDF signature, batch shape — with real data movement.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Manufacture a media table from any string column (test harness:
    utf-8 bytes stand in for encoded media).  Real pipelines read the
    payload from object storage with a binary-file source."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: byte-value
    histogram folded to ``dim`` buckets, L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float64")
    total = hist.sum() or 1.0
    return hist / total


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + feature-extract each payload → (media_id, kind,
    n_bytes, features array<double>).

    ``fake=False`` raises NotImplementedError inside the workers (no
    codec libs in this container); ``fake=True`` runs the deterministic
    byte-histogram fake through the identical Arrow path.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic byte-level stand-in"
                )
            feats = [list(_fake_features(p, dim)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        batches, "media_id long, kind string, n_bytes long, features array<double>"
    )


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize kernel (stub).  fake=True truncates/pads payload to
    width*height bytes — shape-correct plumbing, no codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if not fake:
                raise NotImplementedError("image codec not available; pass fake=True")
            out = [bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]]
            res = pdf.copy()
            res["payload"] = out
            res["width"] = width
            res["height"] = height
            yield res

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, fake: bool = False) -> DataFrame:
    """Video frame-sampling kernel (stub): 1 'frame' per N payload
    bytes under fake=True — exercises the 1→N explode shape real frame
    samplers have."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("video codec not available; pass fake=True")
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(p), every_n_bytes)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(bytes(p[off : off + every_n_bytes]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        batches, "media_id long, frame_idx int, frame_payload binary"
    )
