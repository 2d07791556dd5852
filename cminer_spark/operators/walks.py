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


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_length: int,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    seed: int = 0,
    directed: bool = True,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks:
    ``(walk_id, step, v_id)``. Candidate next-vertices are weighted by
    their relation to the PREVIOUS vertex — ``w_return`` for going
    back (node2vec 1/p), ``w_common`` for a shared neighbor of the
    previous vertex (node2vec 1), ``w_far`` otherwise (node2vec 1/q)
    — as INTEGER weights (scale 1/p : 1 : 1/q by a common factor).

    Exact deterministic weighted sampling via replica-argmin: a
    candidate with weight w enters w replicas ``(dst, j≤w)`` and the
    walk takes the replica minimizing ``md5(seed:walk:step:dst:j)``
    — P(dst) = w_dst/Σw exactly (min of w iid uniform hashes), yet
    bit-reproducible across engines and partitionings, so the SQL
    oracle replays the walks row-for-row. A weight of 0 disables the
    class (e.g. ``w_return=0`` forbids backtracking). The first step
    has no previous vertex: every candidate lands in the ``w_far``
    class, i.e. uniform.

    Scale: per step, the candidate join (frontier × out-neighbors)
    plus ONE extra equi-join against the adjacency on
    ``(prev, dst)`` to mark common neighbors, then a map-side
    partial-aggregated argmin; replica explosion multiplies candidate
    rows by ≤ max(weights) — keep weights small integers.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    for w in (w_return, w_common, w_far):
        if w < 0:
            raise ValueError("weights must be >= 0")
    max_w = max(w_return, w_common, w_far)
    if max_w == 0:
        raise ValueError("at least one weight must be positive")
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.distinct()
    spark = edges.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_adj = adj.count()
    iter_parts = min(shuffle_parts, max(1, -(-n_adj // 250_000)))
    adj = adj.repartition(iter_parts, "u").persist()
    common = adj.select(
        F.col("u").alias("prev"), F.col("v").alias("dst"), F.lit(1).alias("is_nb")
    )

    cur = starts.select("walk_id", "v_id").dropDuplicates(["walk_id"]).select(
        "walk_id", F.lit(None).cast("long").alias("prev"), "v_id"
    )
    cur = truncate_lineage(cur)
    out = [cur.select("walk_id", F.lit(0).alias("step"), "v_id")]
    for step in range(1, walk_length + 1):
        cand = adj.join(
            cur.select(F.col("v_id").alias("u"), "walk_id", "prev").hint(
                "shuffle_hash"
            ),
            "u",
        ).select("walk_id", "prev", F.col("v").alias("dst"))
        weight = (
            F.when(F.col("dst") == F.col("prev"), F.lit(w_return))
            .when(F.col("is_nb").isNotNull(), F.lit(w_common))
            .otherwise(F.lit(w_far))
        )
        weighted = cand.join(common, ["prev", "dst"], "left").select(
            "walk_id",
            F.col("dst"),
            weight.alias("w"),
            F.explode(F.sequence(F.lit(1), F.lit(max_w))).alias("j"),
        ).where(F.col("j") <= F.col("w"))
        pick_hash = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col("walk_id").cast("string"),
                F.lit(str(step)),
                F.col("dst").cast("string"),
                F.col("j").cast("string"),
            )
        )
        nxt = (
            weighted.select(
                "walk_id",
                F.struct(
                    pick_hash.alias("h"), F.col("dst"), F.col("j")
                ).alias("pick"),
            )
            .groupBy("walk_id")
            .agg(F.min("pick").alias("pick"))
            .select("walk_id", F.col("pick.dst").alias("dst"))
        )
        cur = truncate_lineage(
            cur.select("walk_id", F.col("v_id").alias("pv"))
            .join(nxt, "walk_id")
            .select(
                "walk_id", F.col("pv").alias("prev"), F.col("dst").alias("v_id")
            )
        )
        out.append(cur.select("walk_id", F.lit(step).alias("step"), "v_id"))

    adj.unpersist()
    return reduce(lambda a, b: a.unionByName(b), out)
