"""Synchronous label propagation with deterministic tie-breaking.

Each round every vertex adopts the most frequent label among its
(undirected) neighbors; ties break to the smallest label, so runs are
bit-reproducible at any partition count (SURVEY §7.3 — LPA ties MUST
be deterministic). Pure DataFrame: neighbor-label frequency is a
``groupBy(v, label).count()`` and the argmax is a window
``row_number`` — no per-row Python.

SURVEY §2.7 mapping table entry: "Label propagation".
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import SuperstepCheckpoint, truncate_lineage


@dataclass
class LPAInfo:
    rounds: int = 0
    converged: bool = False
    resumed_from: int | None = None


def label_propagation(
    edges: DataFrame,
    max_rounds: int = 10,
    vertices: DataFrame | None = None,
    initial_labels: DataFrame | None = None,
    checkpoint: SuperstepCheckpoint | None = None,
    stop_when_stable: bool = True,
) -> tuple[DataFrame, LPAInfo]:
    """Run synchronous LPA on the undirected projection of
    ``edges(src, dst)``.

    ``initial_labels(v_id, label)`` defaults to ``label = v_id``.
    Returns ``(labels(v_id, label), info)``.
    """
    info = LPAInfo()

    sym = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()

    all_v = edges.select(F.col("src").alias("v_id")).union(
        edges.select(F.col("dst").alias("v_id"))
    )
    if vertices is not None:
        all_v = all_v.union(vertices.select("v_id"))
    all_v = all_v.distinct().persist()

    if initial_labels is not None:
        labels = all_v.join(initial_labels, "v_id", "left").select(
            "v_id", F.coalesce("label", F.col("v_id")).alias("label")
        )
    else:
        labels = all_v.select("v_id", F.col("v_id").alias("label"))

    start_round = 0
    if checkpoint is not None:
        resume = checkpoint.latest()
        if resume is not None:
            start_round, labels, _ = resume
            info.resumed_from = start_round
    labels = truncate_lineage(labels)

    for rnd in range(start_round + 1, max_rounds + 1):
        # neighbor label frequencies: one shuffle (groupBy), then the
        # per-vertex argmax window (second shuffle on v_id).
        freq = (
            sym.join(
                labels.select(F.col("v_id").alias("u"), "label").hint("shuffle_hash"),
                "u",
            )
            .groupBy(F.col("v").alias("v_id"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("v_id").orderBy(F.desc("cnt"), F.asc("label"))
        winner = (
            freq.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("v_id", F.col("label").alias("new_label"))
        )
        new_labels = labels.join(winner.hint("shuffle_hash"), "v_id", "left").select(
            "v_id", F.coalesce("new_label", "label").alias("label")
        )

        if stop_when_stable:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v_id")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
        else:
            changed = -1

        labels = (
            checkpoint.save(rnd, new_labels, {"round": rnd, "changed": changed})
            if checkpoint is not None
            else truncate_lineage(new_labels)
        )
        info.rounds = rnd
        if changed == 0:
            info.converged = True
            break

    sym.unpersist()
    all_v.unpersist()
    return labels, info
