"""Minimum spanning forest — distributed Borůvka supersteps.

The reference engine has no MSF surface; this extends the superstep
family (SURVEY §2.7) with the classic contraction algorithm: per
round, every component selects its cheapest outgoing edge, the
selected edges join the forest, and the touched components merge.
MSF is the backbone-extraction primitive over the transcript link
graph (cheapest connectivity skeleton, single-linkage clustering cut).

Correctness without unique weights: edges are totally ordered by
``(weight, lo, hi)`` — Borůvka under ANY total order on edges yields
the unique MSF of that order (the lexicographic tie-break plays the
role of distinct weights), so the output is deterministic for every
input and every partitioning.

Scale design:

* one round = two label joins onto the (persisted, canonicalized)
  edge table + one combinable ``min(struct)`` per component — a
  10^7-degree component reduces map-side, no skewed sort anywhere;
* component merging contracts the SELECTED-edge graph (≤ 1 edge per
  component, so |contraction input| ≤ #components) with the
  large/small-star :func:`connected_components` — O(log) inner
  rounds even when the selected edges chain into long paths (the
  worst case that sinks plain hash-min);
* components at least HALVE each round ⇒ ≤ log2(|V|) outer rounds;
  the active edge set shrinks as components close over their edges
  (intra-component edges drop out of the ca != cb filter);
* forest accumulation and the label state are lineage-truncated per
  round; the remaining-components probe rides the selection count.

Gate: ``boruvka_msf`` on a planted weighted ring-of-cliques whose
MSF has a closed form (per-clique star around the min member + all
ring bridges except the heaviest — gate.msf_oracle_sql), the same
planted-certificate pattern as the Louvain gate. General-input
correctness is pytest-checked against networkx
``minimum_spanning_edges``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.components import connected_components
from cminer_spark.plans.checkpoint import truncate_lineage

__all__ = ["boruvka_msf", "MSFInfo"]


@dataclass
class MSFInfo:
    rounds: int = 0
    converged: bool = False
    selected: list = field(default_factory=list)


def boruvka_msf(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 25,
) -> tuple[DataFrame, MSFInfo]:
    """Minimum spanning forest of the undirected projection of
    ``edges(src, dst, <weight_col>)``.

    Returns ``(forest(src, dst, weight), info)`` with canonical
    ``src < dst`` rows, one per forest edge (|V| - #components rows
    total); parallel edges keep their (weight, lo, hi)-minimal copy,
    self-loops are ignored. ``info.converged`` is True when no
    component had an outgoing edge left (always, once rounds reach
    log2 of the largest component's vertex count).
    """
    lo, hi = F.least("src", "dst"), F.greatest("src", "dst")
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            lo.alias("a"),
            hi.alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min(F.struct("w", "a", "b")).alias("m"))
        .select(F.col("m.a").alias("a"), F.col("m.b").alias("b"), F.col("m.w").alias("w"))
        .persist()
    )
    info = MSFInfo()
    lab = (
        e.select(F.col("a").alias("v_id"))
        .union(e.select(F.col("b").alias("v_id")))
        .distinct()
        .select("v_id", F.col("v_id").alias("c"))
    )
    lab = truncate_lineage(lab)
    forest: DataFrame | None = None

    for rnd in range(1, max_rounds + 1):
        # shuffle_hash on the label side: the state comes off a
        # lineage-truncation scan with unknown stats, which otherwise
        # degrades to a SortMergeJoin re-sorting the edge table every
        # round (the repo-wide superstep convention)
        le = (
            e.join(
                lab.select(
                    F.col("v_id").alias("a"), F.col("c").alias("ca")
                ).hint("shuffle_hash"),
                "a",
            )
            .join(
                lab.select(
                    F.col("v_id").alias("b"), F.col("c").alias("cb")
                ).hint("shuffle_hash"),
                "b",
            )
            .where(F.col("ca") != F.col("cb"))
        )
        # cheapest outgoing edge per component, both orientations;
        # (w, a, b) is a total order, so min() is the tie-broken pick
        pick = F.struct("w", "a", "b", "ca", "cb")
        cand = le.select(F.col("ca").alias("cc"), pick.alias("p")).unionByName(
            le.select(F.col("cb").alias("cc"), pick.alias("p"))
        )
        sel = (
            cand.groupBy("cc")
            .agg(F.min("p").alias("p"))
            .select("p.a", "p.b", "p.w", "p.ca", "p.cb")
            .distinct()
            .persist()
        )
        n_sel = sel.count()
        info.rounds = rnd
        info.selected.append(n_sel)
        if n_sel == 0:
            info.converged = True
            sel.unpersist()
            break
        picked = sel.select("a", "b", "w")
        forest = picked if forest is None else forest.unionByName(picked)
        forest = truncate_lineage(forest)
        # contract: merge components along the selected edges (<= 1
        # per component -> input bounded by #components)
        merge_labels, _cc = connected_components(
            sel.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        )
        lab = (
            lab.join(
                merge_labels.select(
                    F.col("v_id").alias("c"), F.col("component").alias("cn")
                ).hint("shuffle_hash"),
                "c",
                "left",
            )
            .select("v_id", F.coalesce("cn", F.col("c")).alias("c"))
        )
        lab = truncate_lineage(lab)
        sel.unpersist()

    e.unpersist()
    spark = edges.sparkSession
    if forest is None:
        forest = spark.createDataFrame(
            [], "src long, dst long, weight double"
        )
    else:
        forest = forest.select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.col("w").alias("weight"),
        )
    return forest, info
