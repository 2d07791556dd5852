"""Distributed greedy graph coloring — Jones-Plassmann supersteps.

The reference engine has no coloring surface; this extends the
superstep family (SURVEY §2.7) alongside MIS: distance-1 coloring is
the standard scheduling/conflict-partitioning primitive (color
classes are independent sets, so per-color batches can be processed
with no neighbor conflicts — e.g. parallel greedy updates over the
transcript link graph).

Algorithm (Jones & Plassmann 1993), determinism without RNG state:
per round, an uncolored vertex COLORS ITSELF iff its priority
``md5(cast(v_id as string))`` beats (strict ``<`` on the hex string,
exactly the MIS winner rule — smaller hex = higher priority) every
uncolored neighbor's; its color is the smallest non-negative integer
unused by its already-colored neighbors. Two adjacent vertices can
never win the same round, and winners exclude all earlier-colored
neighbors' colors, so the partial coloring is proper after every
round — fixed-round runs are safely resumable/gateable, uncolored
vertices carry ``color = -1``.

Scale design (same budget as one Luby MIS round, plus the used-color
gather):

* winner selection = two shuffle-hash joins of the uncolored state
  onto the persisted symmetric adjacency + one combinable
  ``groupBy(min)`` — hub-degree keys reduce map-side;
* color choice = one join of winners onto colored neighbors + a
  ``collect_set`` bounded by the round index (a round-``r`` winner's
  colored neighbors hold colors ``< r``), so the per-group state is
  O(max_rounds), never O(degree);
* the uncolored frontier shrinks geometrically (JP decides at least
  the local priority maxima each round); decided vertices leave the
  active joins on both sides;
* the uncolored-count convergence probe rides the state write via
  ``df.observe()`` — one job per round.

Semantics: undirected simple projection of ``edges(src, dst)``
(parallel edges collapse, self-loops ignored — the repo-wide
convention shared with MIS/k-core/LPA).

Gate: ``greedy_color`` (fixed-round variant vs the unrolled DuckDB
oracle recomputing the same md5 priorities and min-excluded colors).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.graph import _und_sym
from cminer_spark.plans.checkpoint import truncate_lineage

__all__ = ["greedy_coloring", "ColoringInfo"]

UNCOLORED = -1


@dataclass
class ColoringInfo:
    rounds: int = 0
    converged: bool = False
    uncolored: list = field(default_factory=list)


def _pri(col):
    return F.md5(F.col(col).cast("string"))


def greedy_coloring(
    edges: DataFrame,
    max_rounds: int = 20,
    vertices: DataFrame | None = None,
    stop_when_done: bool = True,
) -> tuple[DataFrame, ColoringInfo]:
    """Jones-Plassmann coloring over the undirected simple projection
    of ``edges(src, dst)``.

    Returns ``(df(v_id, color), info)``: ``color >= 0`` is a proper
    distance-1 coloring of the colored subgraph; ``color == -1`` marks
    vertices the round budget left undecided (none once
    ``info.converged``). ``stop_when_done=False`` runs exactly
    ``max_rounds`` rounds (the fixed-depth gate variant).
    """
    info = ColoringInfo()
    sym = _und_sym(edges).persist()

    all_v = edges.select(F.col("src").alias("v_id")).union(
        edges.select(F.col("dst").alias("v_id"))
    )
    if vertices is not None:
        all_v = all_v.union(vertices.select("v_id"))
    st = all_v.distinct().select(
        "v_id", F.lit(UNCOLORED).cast("long").alias("color")
    )
    st = truncate_lineage(st)

    for rnd in range(1, max_rounds + 1):
        unc = st.where(F.col("color") == UNCOLORED)
        act = sym.join(
            unc.select(
                F.col("v_id").alias("nbr"), _pri("v_id").alias("pu")
            ).hint("shuffle_hash"),
            "nbr",
        ).join(unc.select(F.col("v_id").alias("v")).hint("shuffle_hash"), "v")
        mn = act.groupBy(F.col("v").alias("v_id")).agg(
            F.min("pu").alias("mp")
        )
        scored = st.join(mn.hint("shuffle_hash"), "v_id", "left")
        is_winner = (F.col("color") == UNCOLORED) & (
            F.col("mp").isNull() | (_pri("v_id") < F.col("mp"))
        )
        winners = scored.where(is_winner).select("v_id")

        # colors already held by a winner's neighbors (all < rnd)
        used = (
            sym.join(
                winners.select(F.col("v_id").alias("v")).hint(
                    "shuffle_hash"
                ),
                "v",
            )
            .join(
                st.where(F.col("color") != UNCOLORED)
                .select(F.col("v_id").alias("nbr"), "color")
                .hint("shuffle_hash"),
                "nbr",
            )
            .groupBy(F.col("v").alias("v_id"))
            .agg(F.collect_set("color").alias("used"))
        )
        asg = winners.join(used.hint("shuffle_hash"), "v_id", "left").select(
            "v_id",
            F.array_min(
                F.array_except(
                    F.sequence(F.lit(0).cast("long"), F.lit(rnd - 1).cast("long")),
                    F.coalesce(F.col("used"), F.array().cast("array<long>")),
                )
            ).alias("new_color"),
        )
        new_st = st.join(asg.hint("shuffle_hash"), "v_id", "left").select(
            "v_id",
            F.coalesce(F.col("new_color"), F.col("color")).alias("color"),
        )

        obs = None
        to_save = new_st
        if stop_when_done:
            from pyspark.sql import Observation

            obs = Observation(f"color_unc_{rnd}")
            to_save = new_st.observe(
                obs,
                F.sum(
                    (F.col("color") == UNCOLORED).cast("long")
                ).alias("unc"),
            )
        st = truncate_lineage(to_save)
        uncolored = int(obs.get["unc"] or 0) if obs is not None else -1
        info.rounds = rnd
        info.uncolored.append(uncolored)
        if uncolored == 0:
            info.converged = True
            break

    sym.unpersist()
    return st, info
