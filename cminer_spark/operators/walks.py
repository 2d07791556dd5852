"""Deterministic random-walk generation — the graph-embedding /
sampling front-end (DeepWalk / node2vec-style corpus generation).

Each walk takes ``walk_length`` steps; at every step the next vertex
is the out-neighbor minimizing ``md5(seed:walk_id:step:dst)`` — a
hash-ranked choice that is (a) uniform over neighbors in
distribution, (b) independent across walks and steps, and (c) BIT
DETERMINISTIC across engines and partitionings (md5 of an identical
string), which is what lets a SQL oracle replay the exact walks and
what makes regenerated corpora reproducible. Walks stop early at
sinks (no out-neighbors).

Scale design: per step one frontier join (frontier is O(#walks),
independent of |V|) against the hash-partitioned persisted adjacency
+ one per-walk ``min(struct(hash, dst))`` aggregation —
partial-aggregatable map-side, so a walk sitting on a 10⁷-out-degree
hub combines its candidate ranking before the shuffle. State carried
across steps is one row per live walk; emitted rows stream into the
result union (walk_length ≤ a few dozen → bounded plan).

The reference has no walk operator; this serves SURVEY §2.7 G8
(generators) for embedding-training corpora.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import truncate_lineage


def _choice_hash(walk_id, step: int, dst, seed: int):
    return F.md5(
        F.concat_ws(
            ":",
            F.lit(str(seed)),
            walk_id.cast("string"),
            F.lit(str(step)),
            dst.cast("string"),
        )
    )


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_length: int,
    seed: int = 0,
    directed: bool = True,
) -> DataFrame:
    """Generate one walk per ``starts(walk_id, v_id)`` row; returns
    ``(walk_id, step, v_id)`` with ``step`` 0 at the start vertex.
    Walks ending on a sink emit no further steps (ragged lengths)."""
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.distinct()
    spark = edges.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_adj = adj.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_adj // 250_000)))
    adj = adj.repartition(iter_parts, "u").persist()

    cur = starts.select("walk_id", "v_id").dropDuplicates(["walk_id"])
    cur = truncate_lineage(cur)
    out = [cur.select("walk_id", F.lit(0).alias("step"), "v_id")]
    for step in range(1, walk_length + 1):
        cand = adj.join(
            cur.select(F.col("v_id").alias("u"), "walk_id").hint("shuffle_hash"),
            "u",
        ).select(
            "walk_id",
            F.struct(
                _choice_hash(F.col("walk_id"), step, F.col("v"), seed).alias("h"),
                F.col("v").alias("dst"),
            ).alias("pick"),
        )
        nxt = cand.groupBy("walk_id").agg(F.min("pick").alias("pick")).select(
            "walk_id", F.col("pick.dst").alias("v_id")
        )
        cur = truncate_lineage(nxt)
        out.append(cur.select("walk_id", F.lit(step).alias("step"), "v_id"))

    adj.unpersist()
    return reduce(lambda a, b: a.unionByName(b), out)
