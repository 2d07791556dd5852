"""PageRank as pure DataFrame shuffle-aggregate supersteps.

Semantics match the standard power iteration with uniform
personalization, uniform dangling redistribution and L1 convergence
(the networkx oracle the tests compare against, mirroring the
reference's networkx-as-oracle strategy,
``/root/reference/test/checker.py:77-79``):

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)·w(u,v)/out_w(u)
                              + dangling_mass/N)
    converged ⇔ Σ_v |rank'(v) - rank(v)| < N·tol

Scale design (SURVEY §2.7, §4):

* adjacency is normalized once (parallel edges of the multigraph sum
  their weights) and persisted — each superstep only shuffles the
  rank vector, never rebuilds the graph;
* hot destination vertices (hub tools) are handled with explicit
  two-stage salted aggregation: pre-aggregate on ``(dst,
  salt=hash(src)%k)`` then finalize on ``dst`` — partial map-side
  aggregation plus salting keeps any single reducer key bounded even
  at 10^12 edges;
* exactly ONE executor→driver crossing per superstep: a single
  aggregate returning (L1 delta, dangling mass of the new vector);
* per-superstep state goes through
  :class:`~cminer_spark.plans.checkpoint.SuperstepCheckpoint` when a
  directory is given (durable lineage + exact resume), else
  ``localCheckpoint`` — either way the iterative plan is truncated
  every superstep (SURVEY §7.3 lineage blowup).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import SuperstepCheckpoint, truncate_lineage


@dataclass
class PageRankInfo:
    iterations: int = 0
    converged: bool = False
    deltas: list = field(default_factory=list)
    n_vertices: int = 0
    n_edges: int = 0
    resumed_from: int | None = None
    salted: bool = False


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    vertices: DataFrame | None = None,
    checkpoint: SuperstepCheckpoint | None = None,
    salt_partitions: int | None = None,
    weight_col: str = "weight",
) -> tuple[DataFrame, PageRankInfo]:
    """Run PageRank on ``edges(src, dst[, weight])``.

    ``vertices`` (optional, column ``v_id``) adds isolated vertices.
    ``salt_partitions``: None = auto-enable when a hub vertex is
    detected; 0/1 = off; k>1 = two-stage salted aggregation with k
    salts.
    Returns ``(ranks(v_id, rank), info)``.
    """
    spark = edges.sparkSession
    info = PageRankInfo()

    w = F.col(weight_col) if weight_col in edges.columns else F.lit(1.0)
    pairs = edges.select("src", "dst", w.alias("w"))

    # Normalized adjacency: parallel edges collapse by summed weight
    # (multigraph semantics — networkx builds the same stochastic
    # matrix for MultiDiGraph).
    adj_w = pairs.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    out_w = adj_w.groupBy("src").agg(F.sum("w").alias("out_w"))
    adj = (
        adj_w.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    info.n_edges = adj.count()

    verts = pairs.select(F.col("src").alias("v_id")).union(
        pairs.select(F.col("dst").alias("v_id"))
    )
    if vertices is not None:
        verts = verts.union(vertices.select("v_id"))
    # dangling flag: no out-edges
    verts = (
        verts.distinct()
        .join(
            out_w.select(F.col("src").alias("v_id"), F.lit(False).alias("dangling")),
            "v_id",
            "left",
        )
        .select("v_id", F.coalesce("dangling", F.lit(True)).alias("dangling"))
        .persist()
    )
    n = verts.count()
    info.n_vertices = n
    if n == 0:
        return spark.createDataFrame([], "v_id long, rank double"), info

    # Salting decision: a destination is "hot" when its in-degree
    # dwarfs the average per-shuffle-partition share.
    if salt_partitions is None:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        hot_bar = max(10 * info.n_edges // max(shuffle_parts, 1), 1000)
        max_in = adj.groupBy("dst").count().agg(F.max("count")).collect()[0][0]
        salt_partitions = 16 if (max_in or 0) > hot_bar else 1
    info.salted = salt_partitions > 1

    start_iter = 0
    dangling_mass = None
    ranks = verts.select("v_id", F.lit(1.0 / n).alias("rank"))
    if checkpoint is not None:
        resume = checkpoint.latest()
        if resume is not None:
            start_iter, ranks, meta = resume
            info.resumed_from = start_iter
            dangling_mass = meta["metrics"].get("dangling_mass")

    if dangling_mass is None:
        n_dangling = verts.where("dangling").count()
        dangling_mass = n_dangling / n

    ranks_src = ranks
    for it in range(start_iter + 1, max_iter + 1):
        contribs = adj.join(
            ranks_src.select(F.col("v_id").alias("src"), "rank"), "src"
        ).select(
            "dst",
            (F.col("p") * F.col("rank")).alias("c"),
            F.pmod(F.xxhash64("src"), F.lit(salt_partitions)).alias("salt"),
        )
        if salt_partitions > 1:
            sums = (
                contribs.groupBy("dst", "salt")
                .agg(F.sum("c").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
            )
        else:
            sums = contribs.groupBy("dst").agg(F.sum("c").alias("in_mass"))

        new_ranks = (
            verts.join(sums.withColumnRenamed("dst", "v_id"), "v_id", "left")
            .select(
                "v_id",
                "dangling",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_mass", F.lit(0.0))
                        + F.lit(dangling_mass / n)
                    )
                ).alias("rank"),
            )
        )

        # Single driver crossing: L1 delta + next iteration's dangling
        # mass in one aggregate.
        joined = new_ranks.join(
            ranks_src.select("v_id", F.col("rank").alias("rank_prev")), "v_id"
        )
        agg = joined.agg(
            F.sum(F.abs(F.col("rank") - F.col("rank_prev"))).alias("delta"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias(
                "dangling_mass"
            ),
        ).collect()[0]
        delta = float(agg["delta"])
        dangling_mass = float(agg["dangling_mass"])
        info.deltas.append(delta)
        info.iterations = it

        state = new_ranks.select("v_id", "rank")
        metrics = {
            "l1_delta": delta,
            "dangling_mass": dangling_mass,
            "tol": tol,
            "damping": damping,
        }
        if checkpoint is not None:
            ranks_src = checkpoint.save(it, state, metrics)
        else:
            ranks_src = truncate_lineage(state)

        if delta < n * tol:
            info.converged = True
            break

    adj.unpersist()
    verts.unpersist()
    return ranks_src.select("v_id", "rank"), info
