"""Frequent subgraph mining over a transactional graph DB.

A Spark-first re-expression of the reference miner's growth loop
(``/root/reference/src/CMiner/CMiner.py:492-583``): patterns grow one
edge at a time and **embeddings are carried incrementally as
DataFrames** — an extension is a JOIN of the embeddings-so-far with
the edge table (SURVEY §2.3 J6/J7), never a re-match, exactly like
the reference's mapping extension (``CMiner.py:329-416``). Support is
the A1 aggregate: ``countDistinct(graph_id) >= min_support`` with
anti-monotone pruning (``CMiner.py:174-227``).

Differences from the reference (by design, SURVEY §7.3 "no port
temptation"): growth is level-wise (BFS) instead of stack-DFS — the
frontier is small and driver-held either way, but BFS lets every
candidate extension of a level be counted in ONE distributed
aggregation per pattern; duplicate isomorphic patterns are removed by
an exact canonical code (brute-force over ≤8 pattern nodes, the
driver-side analog of ``Graph.py:578-605``).

Node-label semantics mirror the reference: seed patterns group
vertices by their FULL sorted label set (``CMiner.py:585-607``), and
extensions key on the new node's full label set
(``CMiner.py:174-203``).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.matching import Pattern, PatternEdge


@dataclass
class MinedPattern:
    pattern: Pattern
    support: int
    frequency: int
    code: str


def canonical_code(pattern: Pattern) -> str:
    """Exact canonical form by minimizing over node orderings —
    patterns are tiny (≤8 nodes), so brute force is exact where the
    reference's invariant code (Graph.py:578-605) is only a strong
    heuristic."""
    nodes = list(pattern.nodes)
    best = None
    for perm in itertools.permutations(range(len(nodes))):
        pos = {nodes[i]: perm[i] for i in range(len(nodes))}
        node_part = tuple(
            lbl for _, lbl in sorted((pos[n], "|".join(pattern.nodes[n])) for n in nodes)
        )
        edge_part = tuple(
            sorted((pos[e.src], pos[e.dst], e.type) for e in pattern.edges)
        )
        cand = (node_part, edge_part)
        if best is None or cand < best:
            best = cand
    return repr(best)


def _labels_code() -> F.Column:
    return F.array_join(F.sort_array(F.col("labels")), "|")


def mine_frequent_patterns(
    vertices: DataFrame,
    edges: DataFrame,
    min_support: int | float,
    max_edges: int = 2,
    min_nodes: int = 1,
    max_nodes: int = 4,
    graph_col: str = "graph_id",
) -> list[MinedPattern]:
    """Mine frequent patterns from a transactional DB.

    vertices: (graph_id, v_id, labels); edges: (graph_id, src, dst,
    key, type). Relative ``min_support`` ≤ 1 is a fraction of |DB|
    (reference ``CMiner.py:616-628``). Returns patterns with
    ``min_nodes ≤ |V| ≤ max_nodes`` and ≤ ``max_edges`` edges.
    """
    spark = edges.sparkSession
    n_graphs = vertices.select(graph_col).distinct().count()
    if min_support <= 1 and isinstance(min_support, float):
        min_support = max(1, int(min_support * n_graphs))
    min_support = int(min_support)

    v = vertices.select(
        F.col(graph_col).alias("_g"), "v_id", _labels_code().alias("lcode")
    ).persist()
    e = edges.select(
        F.col(graph_col).alias("_g"),
        "src",
        "dst",
        F.coalesce(F.col("key"), F.lit(0)).alias("key"),
        "type",
    ).persist()

    results: list[MinedPattern] = []
    seen_codes: set[str] = set()

    # --- seed: 1-node patterns by full label set (A2) -----------------
    seeds = (
        v.groupBy("lcode")
        .agg(
            F.countDistinct("_g").alias("sup"),
            F.count(F.lit(1)).alias("freq"),
        )
        .where(F.col("sup") >= min_support)
        .collect()
    )

    # frontier entries: (pattern, embeddings df with columns _g, n_<id>, e_<i>)
    frontier: list[tuple[Pattern, DataFrame, int, int]] = []
    for row in seeds:
        labels = row["lcode"].split("|") if row["lcode"] else []
        p = Pattern().add_node("q0", labels)
        emb = v.where(F.col("lcode") == row["lcode"]).select(
            "_g", F.col("v_id").alias("n_q0")
        )
        code = canonical_code(p)
        seen_codes.add(code)
        if min_nodes <= 1:
            results.append(MinedPattern(p, int(row["sup"]), int(row["freq"]), code))
        frontier.append((p, emb.persist(), int(row["sup"]), 0))

    level = 0
    while frontier and level < max_edges:
        level += 1
        next_frontier: list[tuple[Pattern, DataFrame, int, int]] = []
        for pattern, emb, _sup, n_edges_so_far in frontier:
            node_ids = list(pattern.nodes)
            can_add_node = len(node_ids) < max_nodes
            edge_cols = [c for c in emb.columns if c.startswith("e_")]

            for qi in node_ids:
                for direction in ("out", "in"):
                    # J6 node extension: join embeddings with edges
                    # incident to the binding of qi, new endpoint not
                    # yet bound.
                    me, other = ("src", "dst") if direction == "out" else ("dst", "src")
                    cand = emb.join(
                        e.withColumnRenamed("_g", "_ge"),
                        (F.col(f"n_{qi}") == F.col(me)) & (F.col("_g") == F.col("_ge")),
                    )
                    for b in node_ids:
                        cand = cand.where(F.col(other) != F.col(f"n_{b}"))
                    for ec in edge_cols:
                        cand = cand.where(
                            F.struct("src", "dst", "key") != F.col(ec)
                        )
                    if not can_add_node:
                        continue
                    cand = cand.join(
                        v.select(
                            F.col("_g").alias("_gv"),
                            F.col("v_id").alias("_vnew"),
                            F.col("lcode").alias("_lnew"),
                        ),
                        (F.col(other) == F.col("_vnew"))
                        & (F.col("_g") == F.col("_gv")),
                    )
                    stats = (
                        cand.groupBy("type", "_lnew")
                        .agg(F.countDistinct("_g").alias("sup"))
                        .where(F.col("sup") >= min_support)
                        .collect()
                    )
                    for srow in stats:
                        new_id = f"q{len(pattern.nodes)}"
                        labels = srow["_lnew"].split("|") if srow["_lnew"] else []
                        p2 = Pattern(dict(pattern.nodes), list(pattern.edges))
                        p2.add_node(new_id, labels)
                        if direction == "out":
                            p2.add_edge(qi, new_id, srow["type"])
                        else:
                            p2.add_edge(new_id, qi, srow["type"])
                        code = canonical_code(p2)
                        if code in seen_codes:
                            continue
                        seen_codes.add(code)
                        emb2 = (
                            cand.where(
                                (F.col("type") == srow["type"])
                                & (F.col("_lnew") == srow["_lnew"])
                            )
                            .select(
                                "_g",
                                *[F.col(f"n_{n}") for n in pattern.nodes],
                                *[F.col(ec) for ec in edge_cols],
                                F.col(other).alias(f"n_{new_id}"),
                                F.struct("src", "dst", "key").alias(
                                    f"e_{len(edge_cols)}"
                                ),
                            )
                            .persist()
                        )
                        agg = emb2.agg(
                            F.countDistinct("_g").alias("sup"),
                            F.count(F.lit(1)).alias("freq"),
                        ).collect()[0]
                        mp = MinedPattern(
                            p2, int(agg["sup"]), int(agg["freq"]), code
                        )
                        if len(p2.nodes) >= min_nodes:
                            results.append(mp)
                        next_frontier.append(
                            (p2, emb2, mp.support, n_edges_so_far + 1)
                        )

            # J7 edge extension (cycle closure) between bound nodes
            for qi in node_ids:
                for qj in node_ids:
                    if qi == qj:
                        continue
                    cand = emb.join(
                        e.withColumnRenamed("_g", "_ge"),
                        (F.col(f"n_{qi}") == F.col("src"))
                        & (F.col(f"n_{qj}") == F.col("dst"))
                        & (F.col("_g") == F.col("_ge")),
                    )
                    for ec in edge_cols:
                        cand = cand.where(
                            F.struct("src", "dst", "key") != F.col(ec)
                        )
                    stats = (
                        cand.groupBy("type")
                        .agg(F.countDistinct("_g").alias("sup"))
                        .where(F.col("sup") >= min_support)
                        .collect()
                    )
                    for srow in stats:
                        p2 = Pattern(dict(pattern.nodes), list(pattern.edges))
                        p2.add_edge(qi, qj, srow["type"])
                        code = canonical_code(p2)
                        if code in seen_codes:
                            continue
                        seen_codes.add(code)
                        emb2 = (
                            cand.where(F.col("type") == srow["type"])
                            .select(
                                "_g",
                                *[F.col(f"n_{n}") for n in pattern.nodes],
                                *[F.col(ec) for ec in edge_cols],
                                F.struct("src", "dst", "key").alias(
                                    f"e_{len(edge_cols)}"
                                ),
                            )
                            .persist()
                        )
                        agg = emb2.agg(
                            F.countDistinct("_g").alias("sup"),
                            F.count(F.lit(1)).alias("freq"),
                        ).collect()[0]
                        mp = MinedPattern(p2, int(agg["sup"]), int(agg["freq"]), code)
                        if len(p2.nodes) >= min_nodes:
                            results.append(mp)
                        next_frontier.append((p2, emb2, mp.support, n_edges_so_far + 1))

            emb.unpersist()
        frontier = next_frontier

    for _p, emb, _s, _n in frontier:
        emb.unpersist()
    v.unpersist()
    e.unpersist()
    return results


def patterns_to_df(spark, mined: list[MinedPattern]) -> DataFrame:
    """Mined patterns → the result-sink schema of
    :func:`cminer_spark.sources.data_format.write_patterns_text`."""
    rows = []
    for i, mp in enumerate(mined):
        node_ids = {n: j for j, n in enumerate(mp.pattern.nodes)}
        rows.append(
            (
                i,
                [(node_ids[n], mp.pattern.nodes[n]) for n in mp.pattern.nodes],
                [
                    (node_ids[e.src], node_ids[e.dst], e.type)
                    for e in mp.pattern.edges
                ],
                mp.support,
                mp.frequency,
            )
        )
    return spark.createDataFrame(
        rows,
        "pattern_id long, vertices array<struct<v_id:long,labels:array<string>>>, "
        "edges array<struct<src:long,dst:long,type:string>>, support long, frequency long",
    )
