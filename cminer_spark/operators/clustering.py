"""Clustering coefficients — local, average, and global transitivity.

Built on the degree-ordered oriented triangle counter
(:func:`cminer_spark.operators.triangles.triangle_stats`), so the
per-vertex work is one oriented wedge join bounded by Σ d_out²
(d_out ≤ √(2m)); the coefficients themselves are pure column
arithmetic over the (v_id, degree, triangles) stats frame — no extra
shuffle beyond the triangle count.

Semantics match networkx on the simple undirected projection:

* ``clustering_coefficients`` — C(v) = 2·T(v) / (d(v)·(d(v)−1)),
  0 for degree < 2 (``networkx.clustering``);
* ``global_clustering`` — one row with
  ``transitivity`` = 3·triangles / wedges = Σ T(v) / Σ C(d(v),2)
  (``networkx.transitivity``; 0 when the graph has no wedge) and
  ``avg_clustering`` = mean of C(v) over ALL vertices, zeros included
  (``networkx.average_clustering(count_zeros=True)``).

The reference has no clustering operator; this extends the north-rule
triangle component (SURVEY §2.7) the way the reference's wedge joins
extend candidate enumeration (``/root/reference/src/CMiner/
CMiner.py:272-296``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.triangles import triangle_stats


def clustering_coefficients(
    edges: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """Per-vertex ``(v_id, degree, triangles, lcc)`` with
    ``lcc`` = local clustering coefficient (double)."""
    stats = triangle_stats(edges, vertices)
    d = F.col("degree").cast("double")
    return stats.select(
        "v_id",
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles").cast("double") / (d * (d - 1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def global_clustering(
    edges: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """One-row ``(transitivity, avg_clustering, n_vertices,
    n_triangles, n_wedges)`` summary (all computed in a single
    aggregation over the per-vertex stats)."""
    cc = clustering_coefficients(edges, vertices)
    # integer sums (exact, engine-order-independent); transitivity is
    # then ONE double division — bit-identical to any oracle that sums
    # the same integers
    d = F.col("degree")
    wedges = F.coalesce(
        F.sum(F.when(d >= 2, (d * (d - 1)) / 2).otherwise(F.lit(0)).cast("long")),
        F.lit(0),
    )
    tri_corners = F.coalesce(F.sum("triangles"), F.lit(0))
    return cc.agg(
        F.when(
            wedges > 0, tri_corners.cast("double") / wedges.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("transitivity"),
        F.coalesce(F.avg("lcc"), F.lit(0.0)).alias("avg_clustering"),
        F.count(F.lit(1)).alias("n_vertices"),
        (tri_corners / 3).cast("long").alias("n_triangles"),
        wedges.alias("n_wedges"),
    )
