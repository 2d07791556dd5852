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


def negative_edge_samples(
    edges: DataFrame,
    k: int = 5,
    buckets: int = 1024,
    include_positives: bool = True,
    seed: int = 0,
) -> DataFrame:
    """Link-prediction training pairs: the input edges labeled 1 plus
    ``<= k`` deterministic non-edge negatives per source vertex
    labeled 0 — ``(src, dst, label)``.

    Negative scheme (scalable AND engine-replayable): every vertex
    hashes into one of ``buckets`` md5 buckets; each bucket is
    represented by its min-md5 member (one combinable aggregate →
    a ``buckets``-row broadcast table). Source ``s``'s j-th candidate
    is the representative of bucket ``md5(s:j:seed) mod buckets``;
    candidates that collide with a real edge, a self-pair, or each
    other are dropped (hence "<= k"). With ``buckets`` on the order
    of |V| the representatives cover most vertices and the draw is
    near-uniform; the trade-off versus true uniform sampling (only
    representatives ever appear as negatives) is the price of
    determinism + one broadcast join instead of a global index —
    document-sized corpora crank ``buckets`` up, it only costs the
    one per-vertex aggregate.

    Plan: one groupBy(bucket) min-struct + one broadcast equi-join +
    one anti-join against the (deduped) edge set. No windows, no
    global sort, no RNG state.
    """
    if k < 1 or buckets < 1:
        raise ValueError(f"k and buckets must be >= 1, got {k}, {buckets}")
    pos = edges.select("src", "dst").distinct()
    verts = (
        pos.select(F.col("src").alias("v"))
        .union(pos.select(F.col("dst").alias("v")))
        .distinct()
    )
    bkt = F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 8), 16, 10) \
        .cast("long") % buckets
    reps = (
        verts.select(bkt.alias("bucket"), "v")
        .groupBy("bucket")
        .agg(F.min(F.struct(F.md5(F.col("v").cast("string")).alias("h"),
                            F.col("v").alias("v"))).alias("m"))
        .select("bucket", F.col("m.v").alias("dst"))
    )
    cand = (
        verts.select(F.col("v").alias("src"))
        .select(
            "src",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(int(k))),
                    lambda j: F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("src").cast("string"),
                                    j.cast("string"),
                                    F.lit(str(int(seed))),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % buckets,
                )
            ).alias("bucket"),
        )
        .distinct()  # collapse same-bucket draws for one src
    )
    neg = (
        cand.join(F.broadcast(reps), "bucket")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .join(pos, ["src", "dst"], "left_anti")
        .select("src", "dst", F.lit(0).cast("long").alias("label"))
    )
    if not include_positives:
        return neg
    return pos.select(
        "src", "dst", F.lit(1).cast("long").alias("label")
    ).unionByName(neg)
