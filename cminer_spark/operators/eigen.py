"""Eigenvector centrality — power iteration ``x ← Aᵀx / ‖Aᵀx‖₂``.

Completes the centrality family (PageRank = random walk with
teleport, Katz = damped walk counts, HITS = bipartite mutual
reinforcement): eigenvector centrality is the principal left
eigenvector of the weighted adjacency — influence proportional to
the influence of in-neighbors, no damping, no teleport.

Scale design (same skeleton as :mod:`cminer_spark.operators.katz` —
one shuffle-aggregate superstep, hub in-degree absorbed by the
map-side partial aggregate):

* the L2 norm is NOT a separate job: each superstep saves the raw
  ``Aᵀx`` vector with ``Σx²`` folded into the state write via
  ``observe``, and the NEXT superstep multiplies by the scalar
  ``1/‖·‖`` driver-side literal — normalization is algebraically
  associative over the linear map, so normalizing one step late (and
  once at the end) yields the identical unit vector while keeping
  intermediate magnitudes O(λ_max) instead of λ_maxᵏ;
* convergence (``tol > 0``) is the standard power-iteration
  eigenvalue test: ``‖Aᵀx̂‖₂`` of a unit ``x̂`` estimates λ_max, and
  iteration stops when successive estimates differ by < tol;
* state rides the :class:`EphemeralStateStore` parquet double-buffer
  (lineage-flat across any iteration count).

Vertices with no in-edges score exactly 0 from the first superstep
on. A graph whose reachable mass dies out (norm → 0) raises — the
principal eigenvector is not defined by power iteration there.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import EphemeralStateStore, truncate_lineage
from cminer_spark.plans.loopconf import superstep_conf

__all__ = ["eigenvector_centrality", "EigenInfo"]


@dataclass
class EigenInfo:
    iterations: int = 0
    n_vertices: int = 0
    eigenvalue_estimates: list = field(default_factory=list)
    converged: bool = False


def eigenvector_centrality(
    edges: DataFrame,
    max_iter: int = 20,
    tol: float = 0.0,
    weight_col: str | None = None,
) -> tuple[DataFrame, EigenInfo]:
    """Returns ``((v_id, score), info)`` with ``‖score‖₂ = 1``.

    ``tol == 0`` runs exactly ``max_iter`` supersteps (the
    oracle-checkable mode); ``tol > 0`` stops early when the λ_max
    estimate stabilizes. ``weight_col=None`` uses multigraph edge
    multiplicity as the weight (parallel edges reinforce).
    """
    weighted = weight_col is not None and weight_col in edges.columns
    cols = [F.col("src").cast("long"), F.col("dst").cast("long")]
    if weighted:
        cols.append(F.col(weight_col).cast("double").alias("_w"))
    adj = (
        edges.select(*cols)
        .groupBy("src", "dst")
        .agg(
            (F.sum("_w") if weighted else F.count(F.lit(1)).cast("double")).alias(
                "w"
            )
        )
        .persist()
    )
    verts = (
        adj.select(F.col("src").alias("v_id"))
        .union(adj.select(F.col("dst").alias("v_id")))
        .distinct()
        .persist()
    )
    info = EigenInfo(n_vertices=verts.count())
    store = EphemeralStateStore(edges.sparkSession, "eigen")

    # x̂0 = uniform unit vector; cur_norm carries the pending 1/‖·‖
    # scalar of the vector currently in the store
    x = verts.withColumn("x", F.lit(1.0))
    cur_norm = math.sqrt(float(info.n_vertices)) if info.n_vertices else 1.0
    prev_eig = None
    n_adj = adj.count()
    # loop-scoped config (plans/loopconf.py): graph-sized shuffle
    # partitions, AQE off — one scheduler job per superstep
    with superstep_conf(edges.sparkSession, n_adj):
        for i in range(max_iter):
            xh = x.select("v_id", (F.col("x") / F.lit(cur_norm)).alias("x"))
            msgs = (
                adj.join(xh.hint("shuffle_hash"), adj["src"] == xh["v_id"])
                .groupBy("dst")
                .agg(F.sum(F.col("w") * F.col("x")).alias("m"))
            )
            nxt = verts.join(
                msgs.hint("shuffle_hash"), verts["v_id"] == msgs["dst"], "left"
            ).select("v_id", F.coalesce("m", F.lit(0.0)).alias("x"))
            obs = Observation(f"eigen_{i}")
            to_save = nxt.observe(obs, F.sum(F.col("x") * F.col("x")).alias("ss"))
            x = store.save(to_save, i)
            cur_norm = math.sqrt(float(obs.get["ss"] or 0.0))
            info.iterations = i + 1
            if cur_norm <= 0.0:
                adj.unpersist()
                verts.unpersist()
                store.close()
                raise ValueError(
                    "power iteration collapsed to the zero vector "
                    f"(superstep {i}) — eigenvector centrality undefined "
                    "for this graph (e.g. a DAG whose walk mass dies out)"
                )
            # x̂_{i-1} was unit, so ‖Aᵀx̂‖₂ estimates λ_max
            info.eigenvalue_estimates.append(cur_norm)
            if tol > 0 and prev_eig is not None and abs(cur_norm - prev_eig) < tol:
                info.converged = True
                break
            prev_eig = cur_norm
        result = x.select("v_id", (F.col("x") / F.lit(cur_norm)).alias("score"))
        result = truncate_lineage(result)
    adj.unpersist()
    verts.unpersist()
    store.close()
    return result, info
