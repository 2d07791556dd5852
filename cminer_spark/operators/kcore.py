"""k-core decomposition — distributed h-index iteration, exact.

Implements the locality-based coreness algorithm of Montresor,
De Pellegrini & Miorandi, "Distributed k-Core Decomposition"
(IEEE TPDS 2013): every vertex starts at its degree and repeatedly
replaces its estimate with the H-index of its neighbors' estimates;
the (monotone, non-increasing) fixpoint is exactly the core number.
Convergence needs as many rounds as the longest chain along which a
lower estimate must propagate — O(graph diameter) worst case, e.g. a
path of n vertices takes ~n/2 rounds (the core-1 boundary moves one
vertex inward per round from each end). On transcript graphs this is
bounded by the longest conversation chain, not |V|; dense regions
(cliques, hubs) settle in a handful of rounds. Pass ``max_rounds``
accordingly, or use a :class:`SuperstepCheckpoint` to resume.

Scale design:

* the per-vertex H-index is NOT a sort of the neighbor list (a hub
  with 10^7 neighbors would sort 10^7 rows in one window partition).
  H({x}) = max_c min(c, |{x ≥ c}|), so we aggregate neighbor
  estimates to ``(vertex, estimate, count)`` first — map-side combine
  bounds mapper output — and run the window over the DISTINCT
  estimate values per vertex (≤ max-degree values, typically tiny,
  and strictly shrinking as estimates converge);
* the symmetrized adjacency is built once, hash-partitioned on the
  gather key and persisted; each round shuffles only the |V|-sized
  estimate vector;
* the changed-vertex count rides the state write via ``df.observe()``
  (one job per round); state goes through
  :class:`SuperstepCheckpoint` or the parquet double-buffer.

Semantics: undirected simple projection of ``edges(src, dst)`` —
parallel edges collapse, self-loops are ignored (the networkx
``core_number`` convention the tests compare against). Isolated
vertices get core 0.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import (
    EphemeralStateStore,
    SuperstepCheckpoint,
    truncate_lineage,
)
from cminer_spark.plans.loopconf import superstep_conf


@dataclass
class CoreInfo:
    rounds: int = 0
    converged: bool = False
    changed: list = field(default_factory=list)
    n_vertices: int = 0
    resumed_from: int | None = None


def core_numbers(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 100,
    checkpoint: SuperstepCheckpoint | None = None,
) -> tuple[DataFrame, CoreInfo]:
    """Exact core number per vertex. Returns
    ``(cores(v_id, core), info)``. ``max_rounds`` with
    ``checkpoint=None`` and no convergence wanted: pass a small
    fixed value (the estimate after k rounds is a valid UPPER bound
    that the unrolled SQL gate mirrors)."""
    spark = edges.sparkSession
    info = CoreInfo()
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    n_sym = sym.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_sym // 250_000)))
    sym = sym.repartition(iter_parts, "v").persist()

    verts = sym.select(F.col("u").alias("v_id"))
    if vertices is not None:
        verts = verts.union(vertices.select("v_id"))
    verts = verts.distinct().persist()
    n = verts.count()
    info.n_vertices = n
    if n == 0:
        sym.unpersist()
        verts.unpersist()
        info.converged = True
        return spark.createDataFrame([], "v_id long, core long"), info

    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    start_round = 0
    state = (
        verts.join(deg.withColumnRenamed("u", "v_id"), "v_id", "left")
        .select("v_id", F.coalesce("d", F.lit(0)).cast("long").alias("core"))
    )
    if checkpoint is not None:
        resume = checkpoint.latest()
        if resume is not None:
            start_round, state, _meta = resume
            state = state.select("v_id", "core")
            info.resumed_from = start_round
            if (_meta.get("metrics") or {}).get("changed") == 0:
                info.rounds = start_round
                info.converged = True
                sym.unpersist()
                verts.unpersist()
                return state, info
    state = truncate_lineage(state)
    store = EphemeralStateStore(spark, "kcore") if checkpoint is None else None

    from pyspark.sql import Observation

    # loop-scoped config (plans/loopconf.py): graph-sized shuffle
    # partitions, AQE off — one scheduler job per round
    with superstep_conf(spark, n_sym):
        for rnd in range(start_round + 1, max_rounds + 1):
            # neighbor estimates, pre-aggregated to (vertex, estimate,
            # multiplicity) — the window below runs over DISTINCT estimate
            # values per vertex, never the raw neighbor list
            nb = sym.join(
                state.select(F.col("v_id").alias("v"), F.col("core").alias("c")).hint(
                    "shuffle_hash"
                ),
                "v",
            ).select(F.col("u"), F.col("c"))
            cnt = nb.groupBy("u", "c").agg(F.count(F.lit(1)).alias("k"))
            w = (
                Window.partitionBy("u")
                .orderBy(F.desc("c"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            h = (
                cnt.withColumn("ge", F.sum("k").over(w))
                .select("u", F.least(F.col("c"), F.col("ge")).alias("m"))
                .groupBy("u")
                .agg(F.max("m").alias("h"))
            )
            new_state = (
                state.join(h.withColumnRenamed("u", "v_id").hint("shuffle_hash"),
                           "v_id", "left")
                .select(
                    "v_id",
                    F.least(
                        F.col("core"), F.coalesce("h", F.lit(0))
                    ).cast("long").alias("core"),
                    F.col("core").alias("core_prev"),
                )
            )
            obs = Observation(f"kcore_chg_{rnd}")
            to_save = new_state.observe(
                obs,
                F.sum((F.col("core") != F.col("core_prev")).cast("long")).alias(
                    "chg"
                ),
            ).select("v_id", "core")
            if checkpoint is not None:
                saved = checkpoint.save(rnd, to_save, {})
            else:
                saved = store.save(to_save, rnd)
            changed = int(obs.get["chg"] or 0)
            info.rounds = rnd
            info.changed.append(changed)
            if checkpoint is not None:
                checkpoint.update_metrics(rnd, {"changed": changed})
            state = saved.select("v_id", "core")
            if changed == 0:
                info.converged = True
                break

    sym.unpersist()
    verts.unpersist()
    result = state.select("v_id", "core")
    if store is not None and info.rounds > start_round:
        result = truncate_lineage(result)
        store.close()
    return result, info


def k_core(
    edges: DataFrame,
    k: int,
    vertices: DataFrame | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """Vertices of the k-core (the maximal subgraph with min degree
    ≥ k): exactly those with ``core_number ≥ k``."""
    cores, info = core_numbers(edges, vertices=vertices, max_rounds=max_rounds)
    if not info.converged:
        raise RuntimeError(
            f"core_numbers did not converge in {max_rounds} rounds"
        )
    return cores.where(F.col("core") >= k).select("v_id", "core")
