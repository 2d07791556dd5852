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
    from cminer_spark.plans.loopconf import superstep_conf

    und = _undirected_simple(edges).persist()
    n_und = und.count()
    # Scale-adaptive execution config (plans/loopconf.py): the whole
    # orientation + wedge + closing chain is one fixed-shape plan;
    # shuffle partitions derive from the simple-edge count (wedge rows
    # can exceed |E|, so size generously at 16k rows/partition) and
    # AQE is off — the stats materialization is a single scheduler job
    # instead of ~10 query-stage jobs.
    with superstep_conf(edges.sparkSession, n_und, rows_per_partition=16_000):
        return _triangle_stats_run(edges, und, vertices, truncate_lineage)


def _triangle_stats_run(edges, und, vertices, truncate_lineage):
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


def incremental_triangles(
    prev_counts: DataFrame,
    prev_total: int,
    prev_edges: DataFrame,
    delta_edges: DataFrame,
) -> tuple[DataFrame, int]:
    """ADD-ONLY incremental triangle counting: given the previous
    per-vertex counts + total and the previous edge table, count only
    the triangles CREATED by ``delta_edges`` and compose — exact, equal
    to a full recount (tested), without re-enumerating old wedges.

    The per-ingest companion to ``extract_edges_delta`` /
    ``incremental_components`` / ``pagerank(init_ranks=...)``. Work
    scales with Σ min-degree over the new simple edges, not with |E|:

    * each NEW simple edge expands wedges from its LOWER-degree
      endpoint only (edge-iterator bound — a delta edge touching a hub
      expands from the other side);
    * a created triangle containing several new edges is counted
      exactly once, at its minimum new edge in canonical (a, b) tuple
      order (the tag joins run against the broadcast-small new-edge
      frame);
    * delta rows that are parallel duplicates of existing edges add no
      simple edge and correctly contribute nothing.
    """
    spark = prev_edges.sparkSession
    p = _undirected_simple(prev_edges).persist()
    new_e = (
        _undirected_simple(delta_edges)
        .join(p, ["a", "b"], "left_anti")
        .persist()
    )
    full = p.union(new_e).persist()

    deg = (
        full.select(F.col("a").alias("v"))
        .union(full.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ne = (
        new_e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            ).otherwise(F.col("b")).alias("pivot"),
        )
        .withColumn(
            "other",
            F.when(F.col("pivot") == F.col("a"), F.col("b")).otherwise(
                F.col("a")
            ),
        )
    )

    sym = full.select(F.col("a").alias("u"), F.col("b").alias("w")).union(
        full.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    # wedges from the low-degree endpoint of each new edge ...
    cand = (
        ne.join(sym, ne["pivot"] == sym["u"])
        .where(F.col("w") != F.col("other"))
        .select("a", "b", "other", "w")
    )
    # ... closed by any full edge between the wedge tips
    closing = full.select(F.col("a").alias("_cx"), F.col("b").alias("_cy"))
    tris = cand.join(
        closing,
        (F.least("other", "w") == F.col("_cx"))
        & (F.greatest("other", "w") == F.col("_cy")),
        "left_semi",
    )

    # count each created triangle once: at its minimum new edge in
    # canonical tuple order. The triangle found from new edge (a, b)
    # with third corner w survives iff neither (a,w) nor (b,w) is a
    # SMALLER new edge.
    ab = F.struct(F.col("a").alias("x"), F.col("b").alias("y"))
    aw = F.struct(
        F.least("a", "w").alias("x"), F.greatest("a", "w").alias("y")
    )
    bw = F.struct(
        F.least("b", "w").alias("x"), F.greatest("b", "w").alias("y")
    )
    tagged_new = F.broadcast(
        new_e.select(
            F.struct(F.col("a").alias("x"), F.col("b").alias("y")).alias("_ne")
        )
    )
    tris = (
        tris.withColumn("_ab", ab)
        .withColumn("_aw", aw)
        .withColumn("_bw", bw)
        .join(
            tagged_new.select(F.col("_ne").alias("_aw"), F.lit(True).alias("_naw")),
            "_aw",
            "left",
        )
        .join(
            tagged_new.select(F.col("_ne").alias("_bw"), F.lit(True).alias("_nbw")),
            "_bw",
            "left",
        )
        .where(
            ~(F.coalesce("_naw", F.lit(False)) & (F.col("_aw") < F.col("_ab")))
            & ~(F.coalesce("_nbw", F.lit(False)) & (F.col("_bw") < F.col("_ab")))
        )
        .select("a", "b", "w")
        .persist()
    )
    n_new_tris = tris.count()

    per_corner = (
        tris.select(F.col("a").alias("v_id"))
        .union(tris.select(F.col("b").alias("v_id")))
        .union(tris.select(F.col("w").alias("v_id")))
        .groupBy("v_id")
        .agg(F.count(F.lit(1)).alias("_add"))
    )
    all_v = full.select(F.col("a").alias("v_id")).union(
        full.select(F.col("b").alias("v_id"))
    ).distinct()
    out = (
        all_v.join(prev_counts.select("v_id", "triangles"), "v_id", "left")
        .join(per_corner, "v_id", "left")
        .select(
            "v_id",
            (
                F.coalesce("triangles", F.lit(0))
                + F.coalesce("_add", F.lit(0))
            ).cast("long").alias("triangles"),
        )
    )
    from cminer_spark.plans.checkpoint import truncate_lineage

    out = truncate_lineage(out)
    for df in (p, new_e, full, tris):
        df.unpersist()
    return out, prev_total + n_new_tris


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
