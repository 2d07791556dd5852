"""Distributed greedy graph coloring — Jones-Plassmann supersteps.

The reference engine has no coloring surface; this extends the
superstep family (SURVEY §2.7) alongside MIS: distance-1 coloring is
the standard scheduling/conflict-partitioning primitive (color
classes are independent sets, so per-color batches can be processed
with no neighbor conflicts — e.g. parallel greedy updates over the
transcript link graph).

Algorithm (Jones & Plassmann 1993) with LARGEST-DEGREE-FIRST
priorities (the JP-LDF variant): per round, an uncolored vertex
COLORS ITSELF iff its priority beats (strict ``<``) every uncolored
neighbor's; its color is the smallest non-negative integer unused by
its already-colored neighbors. The priority is the composite string

    lpad(10^10 - degree, 11, '0') || md5(cast(v_id as string))

— higher degree sorts FIRST, md5 breaks ties — so hub vertices
decide early instead of waiting O(degree) rounds for every random
neighbor priority to clear (the pure-md5 variant left a third of a
skewed sf0.1 graph uncolored after 10 rounds; LDF converges in ~10).
Determinism still needs no RNG state: degree and md5 are both pure
functions of the input. Two adjacent vertices can never win the same
round, and winners exclude all earlier-colored neighbors' colors, so
the partial coloring is proper after every round — fixed-round runs
are safely resumable/gateable, uncolored vertices carry
``color = -1``.

Scale design (ONE adjacency-state join pass per round — the
used-color gather is FOLDED into the winner join instead of paying a
second sym join pair):

* the round joins the persisted symmetric adjacency once against the
  full state on the neighbor side and the uncolored frontier on the
  vertex side, then ONE combinable ``groupBy(v)`` computes BOTH the
  min uncolored-neighbor priority and the colored-neighbor used-color
  set;
* the used ``collect_set`` is bounded by the round index (a
  round-``r`` winner's colored neighbors hold colors ``< r``), so
  per-group state is O(max_rounds), never O(degree);
* static priorities ride IN the state (computed once at setup from
  one degree aggregate), so no per-round recompute;
* the uncolored-count convergence probe rides the state write via
  ``df.observe()`` — one job per round.

Semantics: undirected simple projection of ``edges(src, dst)``
(parallel edges collapse, self-loops ignored — the repo-wide
convention shared with MIS/k-core/LPA).

Gate: ``greedy_color`` (fixed-round variant vs the unrolled DuckDB
oracle recomputing the same degree+md5 priorities and min-excluded
colors).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.graph import _und_sym
from cminer_spark.plans.checkpoint import truncate_lineage
from cminer_spark.plans.loopconf import superstep_conf

__all__ = ["greedy_coloring", "ColoringInfo"]

UNCOLORED = -1

# priority prefix base: degrees are < 10^10 on any graph this engine
# targets (10^12 edges / sparse), so 10^10 - deg is always 10-11
# digits and the zero-padded prefix sorts degree-DESC lexicographically
_PRI_BASE = 10_000_000_000


@dataclass
class ColoringInfo:
    rounds: int = 0
    converged: bool = False
    uncolored: list = field(default_factory=list)


def _pri(v_col, deg_col):
    """Composite JP-LDF priority string: degree-desc, md5-asc."""
    return F.concat(
        F.lpad(
            (F.lit(_PRI_BASE) - F.coalesce(deg_col, F.lit(0)))
            .cast("string"),
            11,
            "0",
        ),
        F.md5(v_col.cast("string")),
    )


def greedy_coloring(
    edges: DataFrame,
    max_rounds: int = 20,
    vertices: DataFrame | None = None,
    stop_when_done: bool = True,
) -> tuple[DataFrame, ColoringInfo]:
    """Jones-Plassmann (largest-degree-first) coloring over the
    undirected simple projection of ``edges(src, dst)``.

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
    deg = sym.groupBy(F.col("v").alias("v_id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    st = (
        all_v.distinct()
        .join(deg.hint("shuffle_hash"), "v_id", "left")
        .select(
            "v_id",
            F.lit(UNCOLORED).cast("long").alias("color"),
            _pri(F.col("v_id"), F.col("deg")).alias("pri"),
        )
    )
    st = truncate_lineage(st)
    n_sym = sym.count()

    # Loop-scoped config (plans/loopconf.py): shuffle partitions sized
    # to the symmetric adjacency, AQE off — one scheduler job per round.
    with superstep_conf(edges.sparkSession, n_sym):
        for rnd in range(1, max_rounds + 1):
            # one pass: adjacency x full state (neighbor side) x uncolored
            # frontier (vertex side), then a single combinable aggregate
            # yields both the winner test input (min uncolored-neighbor
            # priority) and the used-color set of colored neighbors.
            nbr_st = st.select(
                F.col("v_id").alias("nbr"),
                F.col("pri").alias("np"),
                F.col("color").alias("nc"),
            )
            unc_v = st.where(F.col("color") == UNCOLORED).select(
                F.col("v_id").alias("v")
            )
            g = (
                sym.join(nbr_st.hint("shuffle_hash"), "nbr")
                .join(unc_v.hint("shuffle_hash"), "v")
                .groupBy(F.col("v").alias("v_id"))
                .agg(
                    F.min(
                        F.when(F.col("nc") == UNCOLORED, F.col("np"))
                    ).alias("mp"),
                    F.collect_set(
                        F.when(F.col("nc") != UNCOLORED, F.col("nc"))
                    ).alias("used"),
                )
            )
            is_winner = (F.col("color") == UNCOLORED) & (
                F.col("mp").isNull() | (F.col("pri") < F.col("mp"))
            )
            new_st = st.join(g.hint("shuffle_hash"), "v_id", "left").select(
                "v_id",
                F.when(
                    is_winner,
                    F.array_min(
                        F.array_except(
                            F.sequence(
                                F.lit(0).cast("long"),
                                F.lit(rnd - 1).cast("long"),
                            ),
                            F.coalesce(
                                F.col("used"), F.array().cast("array<long>")
                            ),
                        )
                    ),
                )
                .otherwise(F.col("color"))
                .alias("color"),
                "pri",
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
    return st.select("v_id", "color"), info
