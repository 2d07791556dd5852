"""Louvain community detection — distributed, deterministic.

Modularity-optimizing communities (Blondel et al. 2008), the quality
standard for link-graph community structure next to the cheaper LPA.
Structure per level: synchronous LOCAL-MOVING sweeps until no vertex
moves, then CONTRACTION of communities into super-vertices; repeat on
the contracted graph and compose the level mappings.

Determinism + scale design:

* every sweep is joins/groupBys over ``(u, v, w)`` + the assignment
  ``(v_id, c)`` — no per-row Python; per-sweep state rides eager plan
  truncation, per-level graphs are re-materialized frames;
* synchronous all-vertex moves can oscillate (two vertices swapping
  communities forever), so sweep ``s`` only allows vertices with
  ``pmod(xxhash64(v_id), 2) == s % 2`` to move — a deterministic
  red/black alternation (standard fix for parallel Louvain);
* ties in the gain argmax break toward the SMALLEST community id, so
  results are bit-stable across partitionings;
* gains use the standard formulation: moving v to community c'
  improves modularity iff ``k_in(v,c') - k(v)·tot'(c')/2m`` exceeds
  the same quantity for its current community, where ``tot'``
  excludes v's own degree (computed once per sweep, joined in);
* community labels are canonicalized to the minimum member vertex id
  at the end, like CC/SCC.

Not SQL-expressible in a fixed-depth oracle (data-dependent sweep
count and argmax) — verified by property tests: planted partitions
recovered, modularity ≥ LPA's on the same graph, determinism, and
monotone level modularity (the gate records a rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import truncate_lineage

__all__ = ["louvain", "LouvainInfo"]


@dataclass
class LouvainInfo:
    levels: int = 0
    sweeps: list = field(default_factory=list)
    modularity: float = 0.0
    n_communities: int = 0


def _sym_weighted(edges: DataFrame, weight_col: str | None) -> DataFrame:
    w = (
        F.col(weight_col)
        if weight_col and weight_col in edges.columns
        else F.lit(1.0)
    )
    e = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), w.alias("w")
    )
    # undirected: keep one canonical row per (lo, hi) pair with summed
    # multi-edge weight; self-loops kept (they contribute to degree)
    return (
        e.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"), "w"
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )


def _local_moving(
    g: DataFrame, max_sweeps: int, m2: float
) -> tuple[DataFrame, int]:
    """One level: returns (assignment(v_id, c), sweeps_run). ``g`` is
    the canonical weighted pair frame (u <= v)."""
    sym = (
        g.where(F.col("u") != F.col("v"))
        .select("u", "v", "w")
        .union(
            g.where(F.col("u") != F.col("v")).select(
                F.col("v").alias("u"), F.col("u").alias("v"), "w"
            )
        )
        .persist()
    )
    # weighted degree: neighbors + 2x self-loop weight
    self_w = g.where(F.col("u") == F.col("v")).select(
        F.col("u").alias("v_id"), (F.lit(2.0) * F.col("w")).alias("kw")
    )
    k = (
        sym.select(F.col("u").alias("v_id"), F.col("w").alias("kw"))
        .union(self_w)
        .groupBy("v_id")
        .agg(F.sum("kw").alias("k"))
        .persist()
    )
    assign = k.select("v_id", F.col("v_id").alias("c"))
    sweeps = 0
    prev_moves = -1  # moves in the previous (opposite-color) sweep
    for s in range(max_sweeps):
        assign = truncate_lineage(assign)
        tot = (
            assign.join(k, "v_id")
            .groupBy("c")
            .agg(F.sum("k").alias("tot"), F.count("*").alias("csz"))
        )
        # weight from each vertex into each neighboring community
        cu = assign.select(F.col("v_id").alias("u"), F.col("c").alias("cu"))
        k_in = (
            sym.join(cu.hint("shuffle_hash"), "u")
            .groupBy(F.col("v").alias("v_id"), F.col("cu").alias("cand"))
            .agg(F.sum("w").alias("k_in"))
        )
        # candidate score: k_in - k(v) * tot'(cand) / 2m, tot' excludes
        # v itself when cand == current community
        scored = (
            k_in.join(assign, "v_id")
            .join(k, "v_id")
            .join(tot.withColumnRenamed("c", "cand"), "cand")
            .select(
                "v_id",
                "c",
                "cand",
                "csz",
                (
                    F.col("k_in")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("cand") == F.col("c"), F.col("k")
                        ).otherwise(F.lit(0.0))
                    )
                    / F.lit(m2)
                ).alias("score"),
            )
        )
        # current-community score for comparison (vertices whose own
        # community does not appear among neighbor communities score
        # their stay option as 0 - k*tot'/2m with k_in = 0)
        stay = (
            assign.join(k, "v_id")
            .join(tot, "c")
            .select(
                "v_id",
                F.col("csz").alias("cur_csz"),
                (
                    -F.col("k") * (F.col("tot") - F.col("k")) / F.lit(m2)
                ).alias("stay_floor"),
            )
        )
        best = (
            scored.groupBy("v_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("score"),
                        (-F.col("cand")).alias("neg"),
                        F.col("cand"),
                        F.col("csz"),
                    )
                ).alias("b"),
                F.max(
                    F.when(
                        F.col("cand") == F.col("c"), F.col("score")
                    )
                ).alias("cur_score"),
            )
            .join(stay, "v_id")
            .select(
                "v_id",
                F.col("b.cand").alias("best_c"),
                F.col("b.score").alias("best_score"),
                F.col("b.csz").alias("best_csz"),
                "cur_csz",
                F.coalesce("cur_score", "stay_floor").alias("cur"),
            )
        )
        # red/black alternation: only half the vertices may move per
        # sweep (deterministic), preventing synchronous oscillation
        movable = F.pmod(F.xxhash64("v_id"), F.lit(2)) == F.lit(s % 2)
        # singleton-swap guard (Grappolo heuristic, Halappanavar et
        # al.): two SAME-colored adjacent singletons can swap
        # communities within one sweep (3->c4 while 4->c3) and
        # oscillate forever — when both source and destination
        # communities are singletons, only the move toward the
        # smaller community id is allowed
        no_swap = ~(
            (F.col("cur_csz") == 1)
            & (F.col("best_csz") == 1)
            & (F.col("best_c") > F.col("c"))
        )
        moved_flag = (
            (F.col("best_score") > F.col("cur") + F.lit(1e-12))
            & movable
            & no_swap
        )
        from pyspark.sql import Observation

        obs = Observation(f"louvain_moves_{s}")
        new_assign = (
            assign.join(best, "v_id", "left")
            .select(
                "v_id",
                F.when(
                    F.coalesce(moved_flag, F.lit(False)), F.col("best_c")
                )
                .otherwise(F.col("c"))
                .alias("c"),
                F.coalesce(moved_flag, F.lit(False)).alias("_mv"),
            )
            .observe(obs, F.sum(F.col("_mv").cast("long")).alias("n"))
            .select("v_id", "c")
        )
        new_assign = truncate_lineage(new_assign)
        moves = int(obs.get["n"] or 0)
        assign = new_assign
        sweeps = s + 1
        # converged once a full red+black cycle produces no move: both
        # the current sweep AND the previous opposite-color sweep must
        # be move-free (a move-free black sweep right after a moving
        # red sweep is NOT a fixpoint — red vertices may have gained
        # new improving moves from their own synchronous round)
        if moves == 0 and prev_moves == 0:
            break
        prev_moves = moves
    sym.unpersist()
    k.unpersist()
    return assign, sweeps


def _weighted_modularity(g0: DataFrame, labels: DataFrame, m2: float) -> float:
    """Modularity under the SAME convention the local-moving sweeps
    optimize: weighted multigraph, self-loops kept (A_ii = 2w), so the
    reported quality metric is the objective actually maximized.
    ``g0`` is the level-0 canonical weighted pair frame (u <= v)."""
    lu = labels.select(F.col("v_id").alias("u"), F.col("community").alias("cu"))
    lv = labels.select(F.col("v_id").alias("v"), F.col("community").alias("cv"))
    in_c = float(
        g0.join(lu, "u")
        .join(lv, "v")
        .where(F.col("cu") == F.col("cv"))
        .agg(F.sum(2.0 * F.col("w")).alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    k0 = (
        g0.select(
            F.col("u").alias("v_id"),
            F.when(F.col("u") == F.col("v"), 2.0 * F.col("w"))
            .otherwise(F.col("w"))
            .alias("kw"),
        )
        .union(
            g0.where(F.col("u") != F.col("v")).select(
                F.col("v").alias("v_id"), F.col("w").alias("kw")
            )
        )
        .groupBy("v_id")
        .agg(F.sum("kw").alias("k"))
    )
    sq = float(
        k0.join(labels, "v_id")
        .groupBy("community")
        .agg(F.sum("k").alias("tot"))
        .agg(F.sum(F.col("tot") * F.col("tot")).alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    return in_c / m2 - sq / (m2 * m2)


def louvain(
    edges: DataFrame,
    max_levels: int = 4,
    max_sweeps: int = 10,
    weight_col: str = "weight",
) -> tuple[DataFrame, LouvainInfo]:
    """Returns ``(labels(v_id, community), info)`` — community =
    minimum member vertex id; deterministic for a given input.

    ``info.modularity`` is the weighted multigraph modularity (self-
    loops kept) — the same objective the sweeps optimize — NOT the
    unweighted simple projection ``stats.modularity`` reports."""
    info = LouvainInfo()
    g = _sym_weighted(edges, weight_col).persist()
    g0 = g  # level-0 frame, kept for the reported modularity
    m2 = float(
        (g.agg(F.sum(F.when(F.col("u") == F.col("v"), 2.0 * F.col("w"))
                     .otherwise(2.0 * F.col("w"))).alias("s"))
         .collect()[0]["s"]) or 0.0
    )
    if m2 == 0.0:
        spark = edges.sparkSession
        return (
            spark.createDataFrame([], "v_id long, community long"),
            info,
        )

    # labels(v_id -> community at the CURRENT level), composed down
    labels = None
    for lvl in range(max_levels):
        assign, sweeps = _local_moving(g, max_sweeps, m2)
        info.sweeps.append(sweeps)
        info.levels = lvl + 1
        if labels is None:
            labels = assign
        else:
            labels = (
                labels.join(
                    assign.withColumnRenamed("c", "c2").withColumnRenamed(
                        "v_id", "c"
                    ),
                    "c",
                )
                .select("v_id", F.col("c2").alias("c"))
            )
        labels = truncate_lineage(labels)
        n_comms = assign.select("c").distinct().count()
        n_verts = assign.count()
        if n_comms == n_verts:
            break
        # contract: communities become super-vertices
        cu = assign.select(F.col("v_id").alias("u"), F.col("c").alias("cu"))
        cv = assign.select(F.col("v_id").alias("v"), F.col("c").alias("cv"))
        g_next = (
            g.join(cu, "u")
            .join(cv, "v")
            .select(
                F.least("cu", "cv").alias("u"),
                F.greatest("cu", "cv").alias("v"),
                "w",
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
        )
        g_next = truncate_lineage(g_next)
        if g is not g0:
            g.unpersist()
        g = g_next.persist()

    # canonical labels: min member id per community
    canon = labels.groupBy("c").agg(F.min("v_id").alias("community"))
    out = labels.join(canon, "c").select("v_id", "community")
    out = truncate_lineage(out)
    info.n_communities = out.select("community").distinct().count()
    info.modularity = _weighted_modularity(g0, out, m2)
    if g is not g0:
        g.unpersist()
    g0.unpersist()
    return out, info
