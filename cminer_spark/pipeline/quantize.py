"""Scalar int8 quantization for embedding columns.

At 10^9+ vectors the embedding table's float32 payload dominates
storage and scan time; symmetric per-vector int8 quantization cuts it
4x with ~1e-2 cosine error — the standard first compression step in
front of ANN indexes (IVF/LSH both work on dequantized or quantized
vectors). Pure ``transform``/``aggregate`` array expressions — no
Python, no shuffle; quantize and dequantize are each one projection.

Scheme (symmetric, per-vector): ``scale = max(|x_i|)``;
``q_i = round(x_i / scale * 127)`` clamped to [-127, 127];
``x̂_i = q_i * scale / 127``. Zero vectors keep scale 0 and all-zero
codes. Arithmetic is forced to double on both engines and Spark's
HALF_UP round matches DuckDB's round-half-away-from-zero, so the
DuckDB oracle checks the codes EXACTLY, not approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_embeddings", "dequantize_embeddings"]


def quantize_embeddings(
    embs: DataFrame, col: str = "embedding"
) -> DataFrame:
    """Append ``q`` (array<tinyint>) and ``q_scale`` (double) for the
    float-array column ``col``."""
    x = F.col(col)
    scale = F.array_max(F.transform(x, lambda e: F.abs(e.cast("double"))))
    q = F.transform(
        x,
        lambda e: F.when(F.col("q_scale") == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.round(
                        e.cast("double") / F.col("q_scale") * F.lit(127.0)
                    ).cast("int"),
                ),
            )
        )
        .cast("byte"),
    )
    return embs.withColumn("q_scale", scale.cast("double")).withColumn(
        "q", q
    )


def dequantize_embeddings(
    qdf: DataFrame, out_col: str = "embedding_hat"
) -> DataFrame:
    """Reconstruct ``out_col`` (array<float>) from ``q``/``q_scale``."""
    xhat = F.transform(
        F.col("q"),
        lambda b: (
            b.cast("double") * F.col("q_scale") / F.lit(127.0)
        ).cast("float"),
    )
    return qdf.withColumn(out_col, xhat)
