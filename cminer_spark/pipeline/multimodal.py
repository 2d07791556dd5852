"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` kernels. The decode step itself
is STUBBED (no image/audio libs in this container): with
``fake=True`` the kernel produces a deterministic feature vector from
the payload bytes; with ``fake=False`` it raises NotImplementedError
at the exact point a real decoder (PIL/libav) would plug in. The
Spark-side plumbing — schema, partitioning, Arrow batch shape — is
real and tested.

Scale notes: payload batches are size-bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; the kernel is
stateless per batch so partitions stream without memory growth, and
binary columns never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16
_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, feature array<double>"
)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(
            (seed * 131 + i * 7919 + j * 104729) % 256 for j in range(64 + i % 64)
        )
        meta = (
            64 + i % 512,
            48 + i % 256,
            None if kind == "image" else 1000 + i,
            {"image": "png", "audio": "pcm", "video": "h264"}[kind],
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/libav — not available in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    # deterministic "feature": per-bucket byte histogram, normalized —
    # computed for the WHOLE batch in one vectorized pass: payloads
    # concatenate into a single uint8 buffer (C-level join), a
    # row-id×bucket code array feeds ONE bincount, and the reshape
    # gives per-row histograms with no per-payload Python loop.
    payloads = pdf["payload"].fillna(b"")
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(pdf))
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    rows = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
    hist = (
        np.bincount(
            rows * FEATURE_DIM + (buf % FEATURE_DIM),
            minlength=len(pdf) * FEATURE_DIM,
        )
        .reshape(len(pdf), FEATURE_DIM)
        .astype(float)
    )
    sums = hist.sum(axis=1, keepdims=True)
    np.divide(hist, sums, out=hist, where=sums > 0)  # empty payload → zeros
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": pd.array(lens, dtype="int32"),
            "feature": list(hist.round(9)),
        }
    )


def extract_features(media: DataFrame, fake: bool = True, partitions: int | None = None) -> DataFrame:
    """media table → ``(media_id, kind, n_bytes, feature[16])`` via an
    Arrow-batched kernel (one vectorized pass per batch)."""
    parts = partitions or media.sparkSession.sparkContext.defaultParallelism

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf, fake)

    return (
        media.repartition(parts, "media_id")
        .select("media_id", "kind", "payload")
        .mapInPandas(kernel, schema=_FEATURES_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Relational frame-sampling plan for video rows: one output row
    per sampled timestamp (the decode of each frame would run in
    :func:`extract_features`'s kernel). Pure DataFrame: explode a
    generated timestamp sequence — no Python."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )
