"""Multi-source shortest paths — frontier-based distributed Bellman-Ford.

Unweighted it is multi-source BFS (hop distances, ``bigint``); with a
weight column it is the classic label-correcting relaxation
(``double`` distances, non-negative weights assumed for the
convergence bound to be the longest shortest path).

Scale design (the same superstep discipline as
:mod:`cminer_spark.operators.pagerank`):

* the adjacency collapses parallel edges to their min weight once,
  is hash-partitioned on the relax key and persisted; every round
  shuffles only the FRONTIER (vertices whose distance improved last
  round), not the full state — frontier relaxation provably yields
  the same state as whole-graph relaxation for monotone min-plus, so
  the k-round prefix is still "min over ≤k-edge paths" (which is what
  the unrolled SQL gate mirrors);
* the improved-vertex count rides the state write via
  ``df.observe()`` — one Spark job per round;
* state holds REACHED vertices only (sparse): on a 100 TB graph with
  a small seed set the early rounds touch a tiny fraction of |V|;
* lineage per round is cut by :class:`SuperstepCheckpoint` (durable,
  resumable) or the parquet double-buffer.

The reference has no distance operator; its BFS neighborhood
(``/root/reference/src/Graph/Graph.py:184-210``) is the reachability
special case (see :func:`cminer_spark.operators.graph.
k_hop_neighborhood`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import (
    EphemeralStateStore,
    SuperstepCheckpoint,
    truncate_lineage,
)
from cminer_spark.plans.loopconf import superstep_conf


@dataclass
class PathInfo:
    rounds: int = 0
    converged: bool = False
    improved: list = field(default_factory=list)
    weighted: bool = False
    resumed_from: int | None = None


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str | None = None,
    directed: bool = True,
    max_rounds: int = 50,
    checkpoint: SuperstepCheckpoint | None = None,
) -> tuple[DataFrame, PathInfo]:
    """Distances from the nearest source. Returns
    ``(dists(v_id, dist), info)`` — reached vertices only; ``dist``
    is ``bigint`` hops when ``weight_col`` is None, else ``double``.

    ``sources`` is a ``(v_id)`` frame. With ``max_rounds=k`` and no
    convergence, the result is exact over paths of ≤k edges (a valid
    lower-bound-complete prefix the unrolled SQL gate mirrors;
    converged early stops are idempotent under extra rounds).
    """
    spark = edges.sparkSession
    info = PathInfo(weighted=weight_col is not None)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    if weight_col is None:
        e = edges.select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.lit(1).cast("long").alias("w"),
        )
    else:
        e = edges.select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    # parallel edges: only the cheapest matters
    adj = e.groupBy("u", "v").agg(F.min("w").alias("w"))
    n_adj = adj.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_adj // 250_000)))
    adj = adj.repartition(iter_parts, "u").persist()

    zero = F.lit(0).cast("long" if weight_col is None else "double")
    start_round = 0
    state = sources.select("v_id").distinct().select("v_id", zero.alias("dist"))
    frontier = state
    if checkpoint is not None:
        resume = checkpoint.latest()
        if resume is not None:
            start_round, state, _meta = resume
            state = state.select("v_id", "dist")
            info.resumed_from = start_round
            if (_meta.get("metrics") or {}).get("improved") == 0:
                info.rounds = start_round
                info.converged = True
                adj.unpersist()
                return state, info
            # resumed frontier = full state (a superset of the true
            # frontier; one extra round of no-op relaxations, then the
            # improved-count discipline takes over)
            frontier = state
    state = truncate_lineage(state)
    frontier = truncate_lineage(frontier)
    store = EphemeralStateStore(spark, "sssp") if checkpoint is None else None

    # loop-scoped config (plans/loopconf.py): graph-sized shuffle
    # partitions, AQE off — one scheduler job per relaxation round
    with superstep_conf(spark, n_adj):
        for rnd in range(start_round + 1, max_rounds + 1):
            cand = (
                adj.join(
                    frontier.select(
                        F.col("v_id").alias("u"), F.col("dist").alias("du")
                    ).hint("shuffle_hash"),
                    "u",
                )
                .select(F.col("v").alias("v_id"), (F.col("du") + F.col("w")).alias("nd"))
                .groupBy("v_id")
                .agg(F.min("nd").alias("nd"))
            )
            merged = (
                state.join(cand.hint("shuffle_hash"), "v_id", "full_outer")
                .select(
                    "v_id",
                    F.least(
                        F.coalesce("dist", F.col("nd")), F.coalesce("nd", F.col("dist"))
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.col("nd").isNotNull() & (F.col("nd") < F.col("dist")))
                    ).alias("_imp"),
                )
            )
            obs = Observation(f"sssp_imp_{rnd}")
            to_save = merged.observe(
                obs, F.sum(F.col("_imp").cast("long")).alias("imp")
            ).select("v_id", "dist", "_imp")
            if checkpoint is not None:
                saved = checkpoint.save(rnd, to_save, {})
            else:
                saved = store.save(to_save, rnd)
            improved = int(obs.get["imp"] or 0)
            info.rounds = rnd
            info.improved.append(improved)
            if checkpoint is not None:
                checkpoint.update_metrics(rnd, {"improved": improved})
            state = saved.select("v_id", "dist")
            frontier = saved.where(F.col("_imp")).select("v_id", "dist")
            if improved == 0:
                info.converged = True
                break

    adj.unpersist()
    result = state.select("v_id", "dist")
    if store is not None and info.rounds > start_round:
        result = truncate_lineage(result)
        store.close()
    return result, info


def landmark_distances(
    edges: DataFrame,
    landmarks: DataFrame,
    directed: bool = False,
    max_rounds: int = 50,
) -> tuple[DataFrame, PathInfo]:
    """Hop distances from EACH landmark: ``(lm, v_id, dist)`` for every
    reached (landmark, vertex) pair — the tagged multi-source BFS
    underneath landmark centrality estimates.

    Same superstep discipline as :func:`shortest_paths`, with the
    state keyed on the composite ``(lm, v_id)``: the adjacency is
    partitioned once on the relax key and persisted; each round
    shuffles only the frontier; the improved count rides the state
    write via ``observe()`` (one job per round). State size is
    |landmarks| × |reached| — the landmark set is meant to be small
    (tens to hundreds), which is exactly the landmark-centrality
    trade-off: full closeness is |V| BFS runs, landmarks make it
    |L| tagged copies of one BFS.

    With ``max_rounds=k`` and no convergence the result is exact over
    ≤k-edge paths (the unrolled SQL gate mirrors that prefix).
    """
    spark = edges.sparkSession
    info = PathInfo(weighted=False)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.distinct()
    n_adj = adj.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_adj // 250_000)))
    adj = adj.repartition(iter_parts, "u").persist()

    state = (
        landmarks.select("v_id")
        .distinct()
        .select(
            F.col("v_id").alias("lm"),
            "v_id",
            F.lit(0).cast("long").alias("dist"),
        )
    )
    frontier = truncate_lineage(state)
    state = frontier
    store = EphemeralStateStore(spark, "landmark_bfs")

    for rnd in range(1, max_rounds + 1):
        cand = (
            adj.join(
                frontier.select(
                    "lm", F.col("v_id").alias("u"), F.col("dist").alias("du")
                ).hint("shuffle_hash"),
                "u",
            )
            .select("lm", F.col("v").alias("v_id"), (F.col("du") + 1).alias("nd"))
            .groupBy("lm", "v_id")
            .agg(F.min("nd").alias("nd"))
        )
        merged = state.join(cand.hint("shuffle_hash"), ["lm", "v_id"], "full_outer").select(
            "lm",
            "v_id",
            F.least(
                F.coalesce("dist", F.col("nd")), F.coalesce("nd", F.col("dist"))
            ).alias("dist"),
            (
                F.col("dist").isNull()
                | (F.col("nd").isNotNull() & (F.col("nd") < F.col("dist")))
            ).alias("_imp"),
        )
        obs = Observation(f"lmbfs_imp_{rnd}")
        to_save = merged.observe(
            obs, F.sum(F.col("_imp").cast("long")).alias("imp")
        ).select("lm", "v_id", "dist", "_imp")
        saved = store.save(to_save, rnd)
        improved = int(obs.get["imp"] or 0)
        info.rounds = rnd
        info.improved.append(improved)
        state = saved.select("lm", "v_id", "dist")
        frontier = saved.where(F.col("_imp")).select("lm", "v_id", "dist")
        if improved == 0:
            info.converged = True
            break

    adj.unpersist()
    result = state
    if info.rounds > 0:
        result = truncate_lineage(result)
        store.close()
    return result, info


def diameter_estimate(
    edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 50,
) -> tuple[DataFrame, PathInfo]:
    """Double-sweep diameter lower bound (the standard 2-BFS
    heuristic, exact on trees): BFS from the minimum vertex id, take
    the farthest vertex (max dist, ties → min id), BFS again from it;
    the second eccentricity is the bound.

    Returns ``(df(start_v, peripheral_v, diameter_lb), info)`` — one
    row; ``info`` is the second sweep's :class:`PathInfo`. With
    ``max_rounds=k`` and no convergence the bound is over ≤k-hop
    distances (truncation the SQL gate mirrors). Cost: exactly two
    multi-source BFS runs — nothing new to scale beyond
    :func:`shortest_paths`.
    """
    spark = edges.sparkSession
    verts = edges.select(F.col("src").alias("v_id")).union(
        edges.select(F.col("dst").alias("v_id"))
    )
    row = verts.agg(F.min("v_id").alias("v0")).collect()[0]
    if row.v0 is None:
        empty = spark.createDataFrame(
            [], "start_v long, peripheral_v long, diameter_lb long"
        )
        return empty, PathInfo(converged=True)
    v0 = int(row.v0)
    d1, _ = shortest_paths(
        edges,
        spark.createDataFrame([(v0,)], "v_id long"),
        directed=directed,
        max_rounds=max_rounds,
    )
    far = d1.orderBy(F.desc("dist"), F.asc("v_id")).limit(1).collect()[0]
    d2, info = shortest_paths(
        edges,
        spark.createDataFrame([(int(far.v_id),)], "v_id long"),
        directed=directed,
        max_rounds=max_rounds,
    )
    lb = int(d2.agg(F.max("dist")).collect()[0][0] or 0)
    out = spark.createDataFrame(
        [(v0, int(far.v_id), lb)],
        "start_v long, peripheral_v long, diameter_lb long",
    )
    return out, info


def landmark_betweenness(
    edges: DataFrame,
    landmarks: DataFrame,
    directed: bool = False,
    max_rounds: int = 50,
) -> tuple[DataFrame, PathInfo]:
    """Landmark-approximated betweenness centrality (Brandes with a
    restricted source set): ``(v_id, betweenness)`` where
    ``betweenness(v) = Σ_{lm} δ_lm(v)`` and ``δ`` is Brandes'
    dependency of landmark ``lm`` on ``v``. With landmarks = ALL
    vertices this is exact betweenness (un-normalized, each direction
    counted once on undirected graphs); a small landmark set is the
    standard |L|/|V|-cost approximation.

    Two phases, both supersteps over the hash-partitioned adjacency:

    1. **Forward** level-synchronous BFS with path counting — the
       frontier carries ``σ`` (number of shortest paths from the
       landmark); a vertex discovered at level r sums σ over ALL its
       level-(r-1) predecessors in one aggregation, which is exactly
       Brandes' σ recurrence because every shortest-path predecessor
       sits in the previous frontier.
    2. **Backward** dependency sweep, one superstep per level from
       the deepest up: δ(u) = Σ_{v ∈ succ(u)} σ(u)/σ(v)·(1 + δ(v)).
       All successors of a level-(L-1) vertex live at level L, so
       each level's δ is finalized in a single join against the
       shortest-path DAG (materialized once, |L|·|E| worst case —
       the landmark trade-off, same as :func:`landmark_distances`).

    Unweighted hop distances; ``max_rounds`` truncates the BFS (the
    result is then betweenness restricted to ≤max_rounds-hop shortest
    paths — the unrolled SQL gate mirrors the same truncation).
    """
    spark = edges.sparkSession
    info = PathInfo(weighted=False)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.where(F.col("src") != F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.distinct()
    n_adj = adj.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_adj // 250_000)))
    adj = adj.repartition(iter_parts, "u").persist()

    visited = (
        landmarks.select("v_id")
        .distinct()
        .select(
            F.col("v_id").alias("lm"),
            "v_id",
            F.lit(0).cast("long").alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
    )
    visited = truncate_lineage(visited)
    frontier = visited
    maxdist = 0
    for rnd in range(1, max_rounds + 1):
        cand = (
            adj.join(
                frontier.select(
                    "lm", F.col("v_id").alias("u"), "sigma"
                ).hint("shuffle_hash"),
                "u",
            )
            .groupBy("lm", F.col("v").alias("v_id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = cand.join(
            visited.select("lm", "v_id").hint("shuffle_hash"),
            ["lm", "v_id"],
            "left_anti",
        ).select("lm", "v_id", F.lit(rnd).cast("long").alias("dist"), "sigma")
        obs = Observation(f"betw_fwd_{rnd}")
        new = truncate_lineage(
            new.observe(obs, F.count(F.lit(1)).alias("n"))
        )
        n_new = int(obs.get["n"] or 0)
        info.rounds = rnd
        info.improved.append(n_new)
        if n_new == 0:
            info.converged = True
            break
        visited = truncate_lineage(visited.union(new))
        frontier = new
        maxdist = rnd

    s_df = visited.persist()
    u_side = s_df.select(
        "lm",
        F.col("v_id").alias("u"),
        F.col("dist").alias("du"),
        F.col("sigma").alias("sig_u"),
    )
    v_side = s_df.select(
        "lm",
        F.col("v_id").alias("v"),
        F.col("dist").alias("dv"),
        F.col("sigma").alias("sig_v"),
    )
    dag = (
        adj.join(u_side.hint("shuffle_hash"), "u")
        .join(v_side.hint("shuffle_hash"), ["lm", "v"])
        .where(F.col("dv") == F.col("du") + 1)
        .select("lm", "u", "v", "sig_u", "sig_v", "dv")
        .persist()
    )
    dag.count()

    delta = s_df.where(F.col("dist") == maxdist).select(
        "lm", "v_id", F.lit(0.0).alias("delta")
    )
    delta = truncate_lineage(delta)
    acc = [delta]
    for lvl in range(maxdist, 0, -1):
        contrib = (
            dag.where(F.col("dv") == lvl)
            .join(
                delta.select("lm", F.col("v_id").alias("v"), "delta").hint(
                    "shuffle_hash"
                ),
                ["lm", "v"],
            )
            .groupBy("lm", F.col("u").alias("v_id"))
            .agg(
                F.sum(
                    F.col("sig_u").cast("double")
                    / F.col("sig_v")
                    * (F.lit(1.0) + F.col("delta"))
                ).alias("c")
            )
        )
        base = s_df.where(F.col("dist") == lvl - 1).select("lm", "v_id")
        delta = truncate_lineage(
            base.join(contrib.hint("shuffle_hash"), ["lm", "v_id"], "left").select(
                "lm", "v_id", F.coalesce("c", F.lit(0.0)).alias("delta")
            )
        )
        acc.append(delta)

    from functools import reduce

    all_delta = reduce(lambda a, b: a.unionByName(b), acc)
    bet = (
        all_delta.where(F.col("v_id") != F.col("lm"))
        .groupBy("v_id")
        .agg(F.sum("delta").alias("betweenness"))
    )
    bet = truncate_lineage(bet)
    dag.unpersist()
    s_df.unpersist()
    adj.unpersist()
    return bet, info


def harmonic_closeness(
    edges: DataFrame,
    landmarks: DataFrame,
    directed: bool = False,
    max_rounds: int = 50,
) -> tuple[DataFrame, PathInfo]:
    """Landmark harmonic centrality: for each vertex,
    ``closeness = Σ_{lm reached, lm≠v} 1/dist(lm, v)`` and
    ``n_reached`` the number of contributing landmarks.

    With the landmark set = ALL vertices this is exact harmonic
    centrality (Boldi–Vigna); with a small deterministic landmark set
    it is the standard scale approximation — |L| tagged BFS copies
    instead of |V| runs. Harmonic (not classic 1/Σd) so disconnected
    vertices are well-defined without special-casing.

    Returns ``(df(v_id, n_reached, closeness), info)`` over reached
    vertices only.
    """
    dists, info = landmark_distances(
        edges, landmarks, directed=directed, max_rounds=max_rounds
    )
    out = dists.groupBy("v_id").agg(
        F.sum((F.col("dist") > 0).cast("long")).alias("n_reached"),
        F.coalesce(
            F.sum(F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist"))),
            F.lit(0.0),
        ).alias("closeness"),
    )
    return out, info
