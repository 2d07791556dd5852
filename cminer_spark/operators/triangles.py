"""Exact triangle counting via degree-ordered orientation.

Standard scalable formulation: orient each undirected edge from the
endpoint with smaller ``(degree, id)`` to the larger; every triangle
then has exactly one "pivot" vertex with two out-edges, so the wedge
self-join is bounded by Σ d_out² where d_out ≤ √(2m) — the
orientation is what keeps hub vertices from exploding the join at
scale (the same skew concern the north rule's salting addresses for
aggregation).

Per-vertex counts + a global count, exact, matching
``networkx.triangles`` on the simple undirected projection. The
reference has no triangle operator; this is a north-rule algorithm
(SURVEY §2.7) whose building blocks mirror the reference's
wedge-style joins (J6/J7 anti-join expansion,
``/root/reference/src/CMiner/CMiner.py:272-296``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected_simple(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )


def triangle_stats(
    edges: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """Per-vertex ``(v_id, degree, triangles)`` over the simple
    undirected projection of ``edges(src, dst)``. Materialized
    (lineage-truncated) before returning, so the persisted
    adjacency/orientation frames are computed exactly once no matter
    how often the result is consumed."""
    from cminer_spark.plans.checkpoint import truncate_lineage

    und = _undirected_simple(edges).persist()

    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # Orient: lo endpoint = smaller (deg, id).
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
        .persist()
    )

    # Wedges at the pivot (two out-edges of the same lo vertex), closed
    # by an oriented edge between the endpoints.
    e1 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("x"))
    e2 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("y"))
    wedges = e1.join(e2, "pivot").where(F.col("x") < F.col("y"))
    # closing edge between x and y in its canonical orientation — join
    # both possibilities since (deg,id) order between x and y is not
    # known here without re-joining degrees.
    closing = oriented.select(
        F.least("lo", "hi").alias("x"), F.greatest("lo", "hi").alias("y")
    )
    tris = wedges.select("pivot", "x", "y").join(closing, ["x", "y"], "inner")

    per_corner = (
        tris.select(F.col("pivot").alias("v_id"))
        .union(tris.select(F.col("x").alias("v_id")))
        .union(tris.select(F.col("y").alias("v_id")))
        .groupBy("v_id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    all_v = und.select(F.col("a").alias("v_id")).union(
        und.select(F.col("b").alias("v_id"))
    )
    if vertices is not None:
        all_v = all_v.union(vertices.select("v_id"))
    stats = (
        all_v.distinct()
        .join(per_corner, "v_id", "left")
        .join(deg.withColumnRenamed("v", "v_id"), "v_id", "left")
        .select(
            "v_id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        )
    )
    stats = truncate_lineage(stats)
    und.unpersist()
    oriented.unpersist()
    return stats


def triangle_counts(
    edges: DataFrame, vertices: DataFrame | None = None
) -> tuple[DataFrame, int]:
    """Returns ``(per_vertex(v_id, triangles), total)`` over the simple
    undirected projection of ``edges(src, dst)``. Total = Σ per-vertex
    counts / 3 (every triangle has three corners)."""
    stats = triangle_stats(edges, vertices)
    total = int(
        (stats.agg(F.sum("triangles").alias("s")).collect()[0]["s"] or 0) // 3
    )
    return stats.select("v_id", "triangles"), total
