"""Top principal component of an embedding column via distributed
power iteration — the PCA/whitening step of an embedding pipeline
(ABTT-style "remove the dominant direction", outlier axes, projection
features) without ever materializing the Gram matrix.

Spark-first shape:

* Each iteration is ONE combinable aggregate: the matrix-vector
  product ``u = Σ_rows x · (x·v)`` needs only per-row dot products
  against the current (broadcast-literal) direction and ``d`` partial
  sums — no shuffle of vectors, no d×d covariance, no driver data
  besides the ``d``-vector itself (the convergence-probe convention;
  ``d`` is bounded, rows are not).
* The per-row dot product and the component sums are unrolled into
  ``d`` codegen'd column expressions (`element_at` + multiply-add):
  whole-stage codegen, zero Python in the hot path.
* Normalization happens on the driver between iterations (``d``
  floats). Sign is pinned by the all-ones start vector: both engines
  iterate the same trajectory, so the gate's unrolled-SQL oracle
  needs no sign canonicalization.

At 100 TB: iterations scan the table k times — persist the (id, vec)
projection once upfront; each pass is a map + tree-reduce of ``d``
doubles per partition. Skew-free by construction (no keys).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim(embs: DataFrame, vec_col: str) -> int:
    """Embedding dimension, validated across ALL rows (ragged arrays
    would otherwise turn into silent NULL projections: `element_at`
    past the end is NULL and `sum` skips it)."""
    row = embs.agg(
        F.min(F.size(F.col(vec_col))).alias("lo"),
        F.max(F.size(F.col(vec_col))).alias("hi"),
    ).first()
    if row is None or row["lo"] is None or row["lo"] <= 0:
        raise ValueError("embedding column is empty or has no rows")
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"ragged embedding column: sizes range {row['lo']}..{row['hi']}"
        )
    return int(row["lo"])


def _dot(vec_col: str, v: list[float]):
    """x · v as an unrolled codegen expression (v is a literal)."""
    terms = [
        F.get(F.col(vec_col), j).cast("double") * float(v[j])
        for j in range(len(v))
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def power_iteration_top_pc(
    embs: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[float], DataFrame]:
    """Return ``(component, projections)``: the unit top principal
    direction (of the *uncentered* second-moment matrix — center
    upstream if you need classical PCA) after ``iters`` power steps
    from the all-ones start, and the per-row projections
    ``(vec_id, proj double)`` rounded to 6 dp.
    """
    d = _dim(embs, vec_col)
    v = [1.0 / math.sqrt(d)] * d
    embs = embs.select(id_col, vec_col)
    for _ in range(int(iters)):
        row = (
            embs.withColumn("_s", _dot(vec_col, v))
            .agg(
                *[
                    F.sum(
                        F.get(F.col(vec_col), j).cast("double") * F.col("_s")
                    ).alias(f"u{j}")
                    for j in range(d)
                ]
            )
            .first()
        )
        u = [float(row[f"u{j}"]) for j in range(d)]
        norm = math.sqrt(sum(x * x for x in u))
        if norm == 0.0:
            raise ValueError("power iteration collapsed to the zero vector")
        v = [x / norm for x in u]
    proj = embs.select(
        F.col(id_col).alias("vec_id"),
        F.round(_dot(vec_col, v), 6).alias("proj"),
    )
    return v, proj


def remove_top_pc(
    embs: DataFrame,
    component: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ABTT-style post-processing: subtract each row's projection onto
    ``component`` — ``x' = x - (x·v) v`` — returning
    ``(vec_id, embedding array<double>)``. Pure array expressions
    (`transform` over the literal direction), shuffle-free.
    """
    v_lit = F.array(*[F.lit(float(x)) for x in component])
    s = _dot(vec_col, component)
    return embs.select(
        F.col(id_col).alias("vec_id"),
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            v_lit,
            lambda x, vj: x - s * vj,
        ).alias("embedding"),
    )
