"""Graph sparsification — deterministic per-vertex top-k edge capping.

The reference engine mines small pattern databases and never has to
bound degree; a 10^12-turn link graph does: hub vertices (shared tool
nodes, boilerplate-reply sinks) can carry 10^8+ edges, and every
downstream superstep pays their skew. The standard preprocessing cap
keeps, per source vertex, only the ``k`` heaviest out-edges — the
"top-k neighbors" sparsifier used before similarity joins, GNN
sampling, and visualization.

Semantics: over multigraph rows ``(src, dst[, weight])``, parallel
edges first collapse to ``(src, dst, w = sum(weight))`` (count when no
weight column), then each ``src`` keeps its ``k`` highest-``w`` edges;
ties break deterministically by ``dst`` ascending, so the output is
reproducible across runs/engines.

Scale shape: one combinable ``groupBy(src, dst)`` collapse, then ONE
hash-partitioned window ``row_number() over (partition by src order by
w desc, dst)`` — no self-join, no global sort. The window's per-key
sort is O(out_deg · log out_deg) per vertex; for post-cap pipelines
that is exactly the cost being amortized away. AQE handles residual
src skew (the collapse already combined map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk_out_edges"]


def topk_out_edges(
    edges: DataFrame,
    k: int,
    weight_col: str | None = "weight",
) -> DataFrame:
    """Keep each vertex's ``k`` heaviest out-edges.

    Returns ``(src, dst, w, rk)`` with ``w`` the collapsed edge weight
    and ``rk`` in ``1..k`` (heaviest first, ties by ``dst`` asc).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    wcol = (
        F.sum(F.col(weight_col))
        if weight_col is not None and weight_col in edges.columns
        else F.count(F.lit(1)).cast("double")
    )
    collapsed = edges.groupBy("src", "dst").agg(wcol.alias("w"))
    win = Window.partitionBy("src").orderBy(
        F.col("w").desc(), F.col("dst").asc()
    )
    return collapsed.select(
        "src", "dst", "w", F.row_number().over(win).alias("rk")
    ).where(F.col("rk") <= k)
