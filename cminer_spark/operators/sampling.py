"""Fixed-fanout neighborhood sampling — the GraphSAGE/minibatch
front-end: for each seed vertex, sample at most ``fanouts[h-1]``
neighbors per frontier vertex at hop h, producing the sampled edge
lists a GNN trainer consumes.

Determinism: per (seed, frontier-vertex) the kept neighbors are the
``fanout`` smallest by ``md5(seed:seed_id:hop:src:dst)`` — a uniform
hash ranking, so the sample is uniform-without-replacement in
distribution yet bit-reproducible across engines and partitionings
(the SQL gate replays it row-for-row). Already-visited vertices of
the same seed are excluded, so the sampled neighborhood expands
outward like a BFS tree with bounded branching.

Scale design: the frontier is O(Σ seeds · Π fanouts) — independent of
|V|; each hop is one adjacency join + one anti-join against that
seed's visited set + a bounded-window rank. The rank window
partitions on (seed_id, src) whose group size is deg(src) — for hub
frontier vertices this is the same skew as any per-vertex top-k; the
window is preceded by the (seed, dst) anti-join, so hub groups carry
only unvisited candidates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import truncate_lineage


def sample_neighborhoods(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int],
    seed: int = 0,
    directed: bool = False,
) -> DataFrame:
    """Sample bounded neighborhoods around ``seeds(seed_id, v_id)``.

    Returns the sampled edge list ``(seed_id, hop, src, dst)`` —
    hop h rows connect a hop-(h-1) frontier vertex ``src`` to a
    sampled fresh neighbor ``dst``; at most ``fanouts[h-1]`` rows per
    (seed, src).
    """
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("fanouts must be non-empty positive ints")
    e = edges.where(F.col("src") != F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.distinct()
    spark = edges.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_adj = adj.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_adj // 250_000)))
    adj = adj.repartition(iter_parts, "u").persist()

    frontier = seeds.select("seed_id", "v_id").distinct()
    frontier = truncate_lineage(frontier)
    visited = frontier
    out = []
    for hop, fanout in enumerate(fanouts, start=1):
        cand = (
            adj.join(
                frontier.select(F.col("v_id").alias("u"), "seed_id").hint(
                    "shuffle_hash"
                ),
                "u",
            )
            .select("seed_id", F.col("u").alias("src"), F.col("v").alias("dst"))
            .join(
                visited.select(
                    "seed_id", F.col("v_id").alias("dst")
                ).hint("shuffle_hash"),
                ["seed_id", "dst"],
                "left_anti",
            )
        )
        rank_hash = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col("seed_id").cast("string"),
                F.lit(str(hop)),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        )
        w = Window.partitionBy("seed_id", "src").orderBy(rank_hash, F.col("dst"))
        samp = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= fanout)
            .select("seed_id", F.lit(hop).alias("hop"), "src", "dst")
        )
        samp = truncate_lineage(samp)
        out.append(samp)
        frontier = truncate_lineage(
            samp.select("seed_id", F.col("dst").alias("v_id")).distinct()
        )
        visited = truncate_lineage(visited.union(frontier).distinct())

    adj.unpersist()
    return reduce(lambda a, b: a.unionByName(b), out)
