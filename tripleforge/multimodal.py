"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

The Spark side — schemas, partition-preserving narrow transforms, UDF
signatures, Arrow batch shapes — is real and tested. The actual codec
step is STUBBED (the image/audio libraries are not in this container):
``decode_stub`` raises NotImplementedError unless ``fake=True``, in
which case it produces a deterministic fake feature vector from the
bytes, so the end-to-end plumbing (including determinism across
partitionings) is testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: payload =
    utf-8 bytes of the text, metadata derived deterministically. Used by
    tests/benchmarks; a real pipeline reads parquet with a binary
    column of the same shape."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640).alias("width"),
        (F.col("n_chars") % 480).alias("height"),
        (F.col("n_chars") * 10).alias("duration_ms"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': digest-seeded feature vector.
    Stands in for image-decode/resize/frame-sample; the real codec
    plugs in here."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def decode_stub(payload: bytes, kind: str, dim: int = 16, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/torchaudio) are not available in this "
            "container; pass fake=True for the deterministic test decoder"
        )
    return _fake_decode(payload, dim)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    One mapInPandas pass; batch shape = pandas frame with a bytes
    column. Narrow (partition-preserving): no shuffle — at 100 TB the
    decode cost dominates and scales linearly with partitions.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, k, dim=dim, fake=fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(kernel, FEATURES)
