"""Multimodal binary-column plumbing: images/audio/video as opaque
`binary` columns with typed metadata, processed through Arrow-batched
`mapInPandas`.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case it produces a deterministic hash-derived feature vector — so the
Spark-side contract (schema, batch shape, partitioning, UDF signature)
is real and tested while the pixel work is swappable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16

MEDIA_META_DDL = ("media_id bigint, kind string, n_bytes int, "
                  "magic string, sha256 string")
FEATURES_DDL = (f"media_id bigint, n_bytes int, "
                f"feature array<float>, decoder string")


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """Stub decoder. Real implementation would use PIL/libvips."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; run with fake=True for the deterministic stub")
    h = hashlib.sha256(blob).digest()
    return (np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16)
            .astype(np.float32) / 65535.0)


def media_metadata(df: DataFrame, id_col: str, blob_col: str,
                   kind: str = "image") -> DataFrame:
    """Typed metadata over an opaque binary column — pure expressions."""
    b = F.col(blob_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.octet_length(b).cast("int").alias("n_bytes"),
        F.hex(F.substring(b, 1, 4)).alias("magic"),
        F.sha2(b, 256).alias("sha256"))


RESIZED_DDL = "media_id bigint, width int, height int, thumb binary"
FRAMES_DDL = "media_id bigint, frame_idx int, frame binary"


def resize_image(df: DataFrame, id_col: str, blob_col: str,
                 width: int = 32, height: int = 32,
                 fake: bool = True) -> DataFrame:
    """Thumbnail stub over mapInPandas: real impl would decode+resample;
    the fake path emits a deterministic width*height byte grid derived
    from the blob hash, so schema/batching/partitioning are real."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for blob in pdf["blob"]:
                if blob is None:
                    thumbs.append(None)
                elif not fake:
                    raise NotImplementedError("no image library in container")
                else:
                    seed = hashlib.sha256(bytes(blob)).digest()
                    reps = (width * height) // len(seed) + 1
                    thumbs.append((seed * reps)[: width * height])
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "width": width, "height": height,
                                "thumb": thumbs})

    return src.mapInPandas(run, RESIZED_DDL)


def sample_frames(df: DataFrame, id_col: str, blob_col: str,
                  frame_bytes: int = 1024, every_k: int = 4) -> DataFrame:
    """Frame sampling over an opaque video blob: split the byte stream
    into fixed-size "frames" and keep every k-th — the Spark-side
    plumbing (explode fan-out, bounded batches) of a real frame sampler,
    with the codec-specific parsing left to a pluggable decoder."""
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                b = bytes(blob)
                n = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(idxs, dtype="int32"),
                                "frame": frames})

    return src.mapInPandas(run, FRAMES_DDL)


def extract_features(df: DataFrame, id_col: str, blob_col: str,
                     fake: bool = True, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs (mapInPandas).

    Partition-preserving (narrow), so it composes with the encoder's
    explicit placement; batch shape is bounded by maxRecordsPerBatch.
    """
    src = df.select(F.col(id_col).alias("media_id"),
                    F.col(blob_col).alias("blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for blob in pdf["blob"]:
                if blob is None:
                    feats.append(None)
                    sizes.append(0)
                else:
                    feats.append(decode_image(bytes(blob), fake=fake).tolist())
                    sizes.append(len(blob))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pd.array(sizes, dtype="int32"),
                "feature": feats,
                "decoder": "stub-sha256" if fake else "real",
            })

    return src.mapInPandas(extract, FEATURES_DDL)
