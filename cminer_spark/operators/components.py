"""Connected components — alternating large-star/small-star, exact.

Implements the two-phase alternating algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC'14) — the
O(log² n)-round formulation SURVEY §2.7 prescribes — entirely as
DataFrame group-by/join supersteps. Component ids are canonical:
the minimum vertex id of the component (FIXTURES.md §4).

Also provides :func:`hashmin_components`, the simple O(diameter)
hash-min iteration, which is both a differential oracle for the
star algorithm and the fixed-round variant used by the SQL-unrolled
correctness gate.

The reference's closest operator is BFS connected-subgraph expansion
(``/root/reference/src/Graph/Graph.py:184-210``, SURVEY §2.7 G2);
this engine replaces the per-node BFS with whole-graph supersteps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import SuperstepCheckpoint, truncate_lineage
from cminer_spark.plans.loopconf import superstep_conf


@dataclass
class CCInfo:
    rounds: int = 0
    converged: bool = False
    n_components: int = 0
    resumed_from: int | None = None


def _sym(e: DataFrame) -> DataFrame:
    return e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u})."""
    sym = _sym(e)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins.hint("shuffle_hash"), "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high→low; for each u: connect all small neighbors
    (and u itself) to the minimum."""
    dirE = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = dirE.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        dirE.join(mins.hint("shuffle_hash"), "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return moved


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 50,
    checkpoint: SuperstepCheckpoint | None = None,
) -> tuple[DataFrame, CCInfo]:
    """Exact connected components of the undirected projection of
    ``edges(src, dst)``. Returns ``(labels(v_id, component), info)``;
    ``component`` = min vertex id in the component."""
    spark = edges.sparkSession
    info = CCInfo()

    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )

    start_round = 0
    if checkpoint is not None:
        resume = checkpoint.latest()
        if resume is not None:
            # resuming AT the fixpoint costs one redundant round whose
            # star-contraction is idempotent — the labeling is exactly
            # the uninterrupted run's (no PageRank-style drift, so no
            # saved-metric convergence check is needed here)
            start_round, e, _meta = resume
            info.resumed_from = start_round
    e = truncate_lineage(e)
    prev_fp = _fingerprint(e)

    from pyspark.sql import Observation

    # Loop-scoped config (plans/loopconf.py): shuffle partitions sized
    # to the (shrinking) star state, AQE off — each round's star
    # contraction is ONE scheduler job instead of ~9 query-stage jobs.
    with superstep_conf(spark, prev_fp[0]):
        for rnd in range(start_round + 1, max_rounds + 1):
            e2 = _small_star(_large_star(e))
            # The convergence fingerprint rides the state
            # materialization via df.observe() — one job per round.
            obs = Observation(f"cc_fp_{rnd}")
            e2 = e2.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            )
            e2 = (
                checkpoint.save(rnd, e2, {"round": rnd})
                if checkpoint is not None
                else truncate_lineage(e2)
            )
            got = obs.get
            fp = (int(got["n"]), int(got["h"] or 0))
            e = e2
            info.rounds = rnd
            if fp == prev_fp:
                info.converged = True
                break
            prev_fp = fp

        # Converged state is a set of stars (child → root=min).
        # Components: every child maps to its root, roots map to
        # themselves, isolated vertices map to themselves.
        labels = e.select(
            F.col("u").alias("v_id"), F.col("v").alias("component")
        ).union(
            e.select(F.col("v").alias("v_id"), F.col("v").alias("component"))
        )
        labels = labels.groupBy("v_id").agg(
            F.min("component").alias("component")
        )

        all_v = edges.select(F.col("src").alias("v_id")).union(
            edges.select(F.col("dst").alias("v_id"))
        )
        if vertices is not None:
            all_v = all_v.union(vertices.select("v_id"))
        all_v = all_v.distinct()
        labels = all_v.join(labels, "v_id", "left").select(
            "v_id", F.coalesce("component", "v_id").alias("component")
        )
        # materialize once: the n_components probe and every caller
        # action (bench .count(), downstream joins) reuse the
        # checkpointed rows instead of re-running the label chain
        labels = truncate_lineage(labels)
        info.n_components = labels.select("component").distinct().count()
    return labels, info


def incremental_components(
    prev_labels: DataFrame,
    delta_edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 50,
) -> tuple[DataFrame, CCInfo]:
    """ADD-ONLY incremental connected components: given the previous
    labeling ``prev_labels(v_id, component)`` and a batch of NEW edges,
    produce the labeling of the grown graph without touching the old
    edge set.

    The daily-ingest companion to
    :func:`~cminer_spark.operators.edges.extract_edges_delta`: contract
    each delta edge by the previous labels (an old component is already
    connected, so its label stands in for all its members), solve CC on
    the contracted graph — O(|delta|) edges, regardless of graph size —
    and compose. Because the previous label IS the component's minimum
    member id, the composed labels are bit-identical to a full
    recompute (tested), not merely consistent.

    Scale shape: the only joins against full-graph-sized frames are
    (a) delta endpoints looking up their previous label and (b) the
    old labeling re-mapped through the merge mapping — both with a
    BROADCAST delta-derived side, so the |V|-sized frame never
    shuffles. Edge DELETIONS invalidate the contraction (a removed
    edge can split a component) — recompute with
    :func:`connected_components` for those.
    """
    l_ = prev_labels.select("v_id", "component")
    d = delta_edges.select("src", "dst")
    # contract: endpoint -> previous label (new vertices keep their id)
    contracted = (
        d.join(
            l_.select(
                F.col("v_id").alias("src"), F.col("component").alias("_cu")
            ),
            "src",
            "left",
        )
        .join(
            l_.select(
                F.col("v_id").alias("dst"), F.col("component").alias("_cv")
            ),
            "dst",
            "left",
        )
        .select(
            F.coalesce("_cu", F.col("src")).alias("src"),
            F.coalesce("_cv", F.col("dst")).alias("dst"),
        )
    )
    sub_labels, info = connected_components(
        contracted, vertices=vertices, max_rounds=max_rounds
    )
    sub_labels = F.broadcast(sub_labels)
    # old vertices: re-map through the merge mapping (old label -> new)
    old_final = (
        l_.join(
            sub_labels.select(
                F.col("v_id").alias("component"), F.col("component").alias("_c2")
            ),
            "component",
            "left",
        )
        .select("v_id", F.coalesce("_c2", "component").alias("component"))
    )
    # vertices first seen in the delta (their id is not a previous
    # vertex): labeled directly by the contracted solve
    new_final = sub_labels.join(
        l_.select("v_id"), "v_id", "left_anti"
    ).select("v_id", "component")
    labels = old_final.unionByName(new_final)
    # materialize once (same rationale as connected_components): the
    # n_components probe and the caller's actions reuse the
    # checkpointed rows instead of re-running the compose joins
    labels = truncate_lineage(labels)
    info.n_components = labels.select("component").distinct().count()
    return labels, info


def hashmin_components(
    edges: DataFrame,
    rounds: int,
    vertices: DataFrame | None = None,
    verify_converged: bool = False,
) -> DataFrame:
    """Fixed-``rounds`` hash-min label propagation:
    label'(v) = min(label(v), min_{u~v} label(u)); exact CC when
    ``rounds`` ≥ graph diameter. Deterministic integer logic — used as
    a second implementation for differential tests and as the
    SQL-unrollable gate variant.

    ``verify_converged=True`` runs ONE extra round after ``rounds``
    and raises ``ValueError`` if any label still changes — callers who
    treat the fixed-round output as exact CC (``dedup_clusters``) get
    a loud failure instead of silently split components when the
    graph diameter exceeds ``rounds``. The returned labels are still
    the ``rounds``-round result (the probe round is discarded), so
    fixed-round oracles keep matching."""
    sym = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    all_v = edges.select(F.col("src").alias("v_id")).union(
        edges.select(F.col("dst").alias("v_id"))
    )
    if vertices is not None:
        all_v = all_v.union(vertices.select("v_id"))
    labels = all_v.distinct().select("v_id", F.col("v_id").alias("component"))
    sym = sym.persist()
    n_sym = sym.count()
    with superstep_conf(edges.sparkSession, n_sym):
        for _ in range(rounds):
            nbr_min = (
                sym.join(
                    labels.select(F.col("v_id").alias("u"), "component").hint(
                        "shuffle_hash"
                    ),
                    "u",
                )
                .groupBy(F.col("v").alias("v_id"))
                .agg(F.min("component").alias("nbr_min"))
            )
            labels = truncate_lineage(
                labels.join(
                    nbr_min.hint("shuffle_hash"), "v_id", "left"
                ).select(
                    "v_id",
                    F.least(
                        "component", F.coalesce("nbr_min", "component")
                    ).alias("component"),
                )
            )
        if verify_converged:
            probe = (
                sym.join(
                    labels.select(F.col("v_id").alias("u"), "component").hint(
                        "shuffle_hash"
                    ),
                    "u",
                )
                .groupBy(F.col("v").alias("v_id"))
                .agg(F.min("component").alias("nbr_min"))
                .join(labels, "v_id")
                .where(F.col("nbr_min") < F.col("component"))
            )
            n_changed = probe.count()
            if n_changed:
                sym.unpersist()
                raise ValueError(
                    f"hashmin_components: {n_changed} labels still changing "
                    f"after {rounds} rounds — graph diameter exceeds the "
                    "fixed round count; raise `rounds`"
                )
    sym.unpersist()
    return labels
