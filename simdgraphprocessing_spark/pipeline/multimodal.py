"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (this container has no image/audio libs):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (bytes →
seeded pixel/sample stats) stands in. The Spark-side plumbing —
schema, batch iteration, partition sizing — is real and tested:
swapping the fake for PIL/ffmpeg changes only the inner function.

Scale notes: media blobs dominate row size, so these operators
(a) never shuffle blobs — all transforms are mapInPandas (narrow),
(b) carry a ``content_sha`` invariant column for row identity,
(c) size Arrow batches by bytes not rows
(``spark.sql.execution.arrow.maxRecordsPerBatch`` stays small when
rows are MB-scale — set by the caller).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)


def make_fake_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload =
    seeded bytes; metadata consistent)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        data = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 * (i + 1) if kind != "image" else None,
                bytearray(data),
                hashlib.sha256(data).hexdigest(),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the ``documents`` table
    (driver-checkable: every column is a pure function of doc_id/text).
    The blob is the utf-8 text bytes; ``content_sha`` is its sha256 —
    the per-row identity invariant all derived outputs must carry."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mime"),
        F.when(kind != "audio", F.lit(64)).alias("width"),
        F.when(kind != "audio", F.lit(48)).alias("height"),
        F.when(kind != "image", (F.col("doc_id") % 7 + 1) * 750).alias("duration_ms"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        F.sha2(F.encode(F.col("text"), "utf-8"), 256).alias("content_sha"),
    )


def _fake_decode(data: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → 'pixels'."""
    arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape(-1)


def extract_features(
    media: DataFrame, fake: bool = True, feature_dim: int = 8
) -> DataFrame:
    """(media_id, kind, content_sha, features array<double>) — decode +
    feature-extract over mapInPandas batches. The real decoder is not
    available in this container; ``fake=False`` raises."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not installed here; "
            "use fake=True (deterministic stand-in) or swap _fake_decode"
        )

    out_schema = (
        "media_id long, kind string, content_sha string, features array<double>"
    )

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = []
            for data in pdf["data"]:
                px = _fake_decode(bytes(data)).astype(np.float64)
                chunks = np.array_split(px, feature_dim)
                feats.append([float(c.mean()) for c in chunks])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content_sha": pdf["content_sha"],
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, out_schema)


def extract_feature_sums(
    media: DataFrame, fake: bool = True, feature_dim: int = 8
) -> DataFrame:
    """(media_id, content_sha, f0..f{d-1} bigint) — like
    :func:`extract_features` but integer chunk SUMS instead of float
    means, so the output is exact and hash-portable across engines
    (the driver's correctness gate for the multimodal path). Chunking
    follows ``np.array_split``: first ``len % d`` chunks get one extra
    element. Same mapInPandas plumbing — blobs never shuffle."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not installed here; "
            "use fake=True (deterministic stand-in) or swap _fake_decode"
        )
    feat_cols = [f"f{i}" for i in range(feature_dim)]
    out_schema = "media_id long, content_sha string, " + ", ".join(
        f"{c} long" for c in feat_cols
    )

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            sums = np.zeros((len(pdf), feature_dim), dtype=np.int64)
            for r, data in enumerate(pdf["data"]):
                px = _fake_decode(bytes(data)).astype(np.int64)
                for c, chunk in enumerate(np.array_split(px, feature_dim)):
                    sums[r, c] = int(chunk.sum())
            out = {"media_id": pdf["media_id"], "content_sha": pdf["content_sha"]}
            for c, name in enumerate(feat_cols):
                out[name] = sums[:, c]
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """(media_id, frame_ts_ms) — frame-sampling plan for video rows:
    one output row per sampled timestamp. The sampling grid is pure
    column math (JVM-side); only decode would touch the blob."""
    if not fake:
        raise NotImplementedError("real frame extraction requires ffmpeg")
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
        "content_sha",
    )


def verify_media_sha(derived: DataFrame, source: DataFrame) -> int:
    """Row-invariant check: derived content_sha ⊆ source content_sha."""
    src = source.select("content_sha").distinct()
    return derived.select("content_sha").distinct().join(
        src, "content_sha", "left_anti"
    ).count()
