"""k-truss subgraph — the edge analog of k-core: iteratively peel
every edge supported by fewer than k−2 triangles until the surviving
subgraph is stable. The k-truss is the maximal subgraph where every
edge closes ≥ k−2 triangles WITHIN the subgraph — the standard dense
community core (cohesive beyond k-core, cheaper than clique mining).

Per round, edge support is computed with the same degree-ordered
orientation as :mod:`cminer_spark.operators.triangles` (pivot wedge
join bounded by Σ d_out², d_out ≤ √(2m) — hub-safe), each triangle
credited to its three edges, and under-supported edges dropped; the
surviving-edge count rides the state write via ``observe()`` (one job
per round). The edge set shrinks monotonically, so rounds are bounded
by the peeling depth (small on real graphs — each round removes a
whole "shell") and every round's input is the lineage-cut survivor
set, never the original graph.

Complements :mod:`cminer_spark.operators.kcore` (SURVEY §2.7
round-3 extensions); the reference has no truss operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import truncate_lineage
from cminer_spark.plans.loopconf import superstep_conf


@dataclass
class TrussInfo:
    rounds: int = 0
    converged: bool = False
    n_edges: int = 0


def _edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over the simple undirected edge set
    ``und(a, b)`` (a < b): ``(a, b, support)``, only edges in ≥1
    triangle appear."""
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
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
    )
    e1 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("x"))
    e2 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("y"))
    wedges = e1.join(e2, "pivot").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("lo", "hi").alias("x"), F.greatest("lo", "hi").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"])
    tri_edges = (
        tris.select(F.least("pivot", "x").alias("a"), F.greatest("pivot", "x").alias("b"))
        .union(
            tris.select(
                F.least("pivot", "y").alias("a"), F.greatest("pivot", "y").alias("b")
            )
        )
        .union(tris.select(F.col("x").alias("a"), F.col("y").alias("b")))
    )
    return tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))


def ktruss_edges(
    edges: DataFrame, k: int, max_rounds: int = 30
) -> tuple[DataFrame, TrussInfo]:
    """Edges of the k-truss of the simple undirected projection:
    ``(a, b)`` with a < b. ``info.converged`` is False if the peeling
    budget ran out (result is then an over-approximation — a superset
    whose next peel round would still remove edges)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    info = TrussInfo()
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    und = truncate_lineage(und)
    n_cur = und.count()
    if k == 2:
        # every edge is trivially a 2-truss
        info.converged = True
        info.n_edges = n_cur
        return und, info
    need = k - 2
    # loop-scoped config (plans/loopconf.py): peel rounds under
    # edge-sized shuffle partitions with AQE off
    with superstep_conf(edges.sparkSession, n_cur):
        for rnd in range(1, max_rounds + 1):
            if n_cur == 0:
                info.converged = True
                break
            sup = _edge_support(und)
            kept = (
                und.join(sup.hint("shuffle_hash"), ["a", "b"], "left")
                .where(F.coalesce("support", F.lit(0)) >= need)
                .select("a", "b")
            )
            obs = Observation(f"truss_{rnd}")
            kept = truncate_lineage(
                kept.observe(obs, F.count(F.lit(1)).alias("n"))
            )
            n_kept = int(obs.get["n"] or 0)
            info.rounds = rnd
            und = kept
            if n_kept == n_cur:
                info.converged = True
                n_cur = n_kept
                break
            n_cur = n_kept
    info.n_edges = n_cur
    return und, info
