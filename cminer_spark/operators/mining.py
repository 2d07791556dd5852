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
temptation"): growth is level-wise (BFS) instead of stack-DFS, and —
critically for the driver-job budget — the loop is LEVEL-SYNCHRONOUS:
every candidate extension of EVERY frontier pattern (attach node ×
direction × cycle-closing pair) lands in one packed-schema union
(bindings as ``_emb``/``_edges`` arrays, discriminators
``_pid/_kind/_qi/_qj/_dir``), materialized once and aggregated once
(A1+A5 extension-coverage grouping in a single ``groupBy``); each
surviving child's embedding frame is a lazy FILTER of that cached
frame — no per-child count jobs, no per-child persists. Spark jobs
per level are O(1), not O(#patterns · #nodes · 2).

Duplicate isomorphic patterns are removed by an exact canonical code
(brute force over ≤8 pattern nodes, the driver-side analog of
``Graph.py:578-605``).

Node-label semantics mirror the reference: seed patterns group
vertices by their FULL sorted label set (``CMiner.py:585-607``), and
extensions key on the new node's full label set
(``CMiner.py:174-203``). User start patterns are localized with the
matcher and grown from their embeddings (``CMiner.py:469-490``).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.matching import Pattern, match


@dataclass
class MinedPattern:
    pattern: Pattern
    support: int
    frequency: int
    code: str
    # per-graph embedding counts (reference ``x <graph> <count>`` info
    # lines, CMiner.py:429-446); filled when with_graph_counts=True
    graph_counts: dict = field(default_factory=dict)
    # lazy embeddings frame (_g + n_<node> [+ e_<i>]); kept when
    # keep_embeddings=True for show_mappings output
    embeddings: DataFrame | None = None


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


def _fresh_node_id(pattern: Pattern) -> str:
    i = len(pattern.nodes)
    while f"q{i}" in pattern.nodes:
        i += 1
    return f"q{i}"


_EDGES_ARR_T = "array<struct<src:long,dst:long,key:int>>"


def _packed_embeddings(pattern: Pattern, emb: DataFrame, pid: int) -> DataFrame:
    """One pattern's embeddings in the level-wide PACKED schema
    ``(_g, _pid, _emb array, _edges array)`` — bindings as arrays so
    every frontier pattern's frame is union-compatible."""
    node_ids = list(pattern.nodes)
    edge_cols = [c for c in emb.columns if c.startswith("e_")]
    return emb.select(
        "_g",
        F.lit(pid).alias("_pid"),
        F.array(*[F.col(f"n_{n}") for n in node_ids]).alias("_emb"),
        (
            F.array(*edge_cols)
            if edge_cols
            else F.array().cast(_EDGES_ARR_T)
        ).alias("_edges"),
    )


def _level_branches(
    packed: DataFrame,
    v: DataFrame,
    e: DataFrame,
    node_ok_pids: list[int],
) -> list[DataFrame]:
    """The candidate branches for a WHOLE level: every node extension
    (J6) and edge extension (J7, incl. self-loops), tagged by
    (_pid, _kind, _qi, _qj, _dir), where ``_qi``/``_qj`` are POSITIONS
    in the owning pattern's node order.

    ``packed`` is the UNION of every frontier pattern's embeddings in
    the packed schema, so the level needs THREE joins TOTAL — one per
    (edge direction × extension family) — independent of frontier
    size: the bound nodes are ``posexplode``d and joined against the
    edge table once per branch; the attach point (``_qi``), extension
    kind (new node vs cycle-close vs self-loop) and cycle partner
    (``_qj``) are classified by ``array_position`` against the packed
    embedding. (Round-2 shipped 3 join branches PER PATTERN; at B
    patterns/level that was 3B Catalyst-analyzed joins and 3B edge
    scans per level — the union-first shape makes both O(1) per
    level.) ``node_ok_pids``: patterns still allowed to add a node
    (|V| < max_nodes) — enforced as a data filter on ``_pid``."""
    packed = packed.select("*", F.posexplode("_emb").alias("_qi", "_nval"))

    ev = e.withColumnRenamed("_g", "_ge")
    new_edge = F.struct("src", "dst", "key")
    vv = v.select(
        F.col("_g").alias("_gv"),
        F.col("v_id").alias("_vid"),
        F.col("lcode").alias("_vlcode"),
    )

    def shape(df: DataFrame, kind: str, direction: str | None,
              qj: F.Column | None, vnew: F.Column | None,
              lnew: F.Column | None) -> DataFrame:
        return df.select(
            "_g", "_pid", "_emb", "_edges", "src", "dst", "key", "type",
            F.lit(kind).alias("_kind"),
            F.col("_qi").cast("int").alias("_qi"),
            (qj if qj is not None else F.lit(None)).cast("int").alias("_qj"),
            F.lit(direction).cast("string").alias("_dir"),
            (vnew if vnew is not None else F.lit(None)).cast("long").alias("_vnew"),
            (lnew if lnew is not None else F.lit(None)).cast("string").alias("_lnew"),
        )

    # outgoing edges from a bound node: the dst is either unbound (node
    # extension), a DIFFERENT bound node (cycle-closing edge ext) or
    # the attach node itself (_po == _qi + 1 → SELF-LOOP edge ext; the
    # reference draws edge-extension candidates from the induced
    # subgraph over mapped vertices, CMiner.py:285-296 via
    # Graph.py:607-623, which includes self-loops). Classified here
    # only, so each closing edge is emitted once — embeddings are
    # injective, so exactly one bound position holds dst.
    out = packed.join(
        ev, (F.col("_g") == F.col("_ge")) & (F.col("_nval") == F.col("src"))
    ).where(~F.array_contains("_edges", new_edge)).withColumn(
        "_po", F.array_position("_emb", F.col("dst"))
    )
    branches = [
        shape(
            out.where(F.col("_po") > 0),
            "edge", None, F.col("_po") - 1, None, None,
        )
    ]
    if node_ok_pids:
        node_ok = F.col("_pid").isin(node_ok_pids)
        out_node = (
            out.where(node_ok & (F.col("_po") == 0))
            .join(vv, (F.col("_g") == F.col("_gv")) & (F.col("dst") == F.col("_vid")))
        )
        branches.append(
            shape(out_node, "node", "out", None, F.col("dst"), F.col("_vlcode"))
        )
        # incoming edges whose src is unbound: node extension in the
        # 'in' direction (bound-src cases are covered by the out join)
        in_node = (
            packed.where(node_ok)
            .join(
                ev,
                (F.col("_g") == F.col("_ge")) & (F.col("_nval") == F.col("dst")),
            )
            .where(~F.array_contains("_edges", new_edge))
            .where(F.array_position("_emb", F.col("src")) == 0)
            .join(vv, (F.col("_g") == F.col("_gv")) & (F.col("src") == F.col("_vid")))
        )
        branches.append(
            shape(in_node, "node", "in", None, F.col("src"), F.col("_vlcode"))
        )
    return branches


def mine_frequent_patterns(
    vertices: DataFrame,
    edges: DataFrame,
    min_support: int | float,
    max_edges: int = 2,
    min_nodes: int = 1,
    max_nodes: int = 4,
    graph_col: str = "graph_id",
    start_patterns: list[Pattern] | None = None,
    with_graph_counts: bool = False,
    keep_embeddings: bool = False,
    on_pattern=None,
) -> list[MinedPattern]:
    """Mine frequent patterns from a transactional DB.

    vertices: (graph_id, v_id, labels); edges: (graph_id, src, dst,
    key, type). Relative ``min_support`` ≤ 1 is a fraction of |DB|
    (reference ``CMiner.py:616-628``). Returns patterns with
    ``min_nodes ≤ |V| ≤ max_nodes`` and ≤ ``max_edges`` edges.

    ``start_patterns``: grow from user patterns localized via the
    matcher instead of 1-node seeds (reference CMiner.py:469-490).
    ``with_graph_counts``: aggregate at (extension, graph) grain and
    fill ``MinedPattern.graph_counts`` (the reference's per-graph
    ``x`` lines) — collect size grows with |DB|, so off by default.
    ``keep_embeddings``: retain each pattern's lazy embeddings frame
    (and the caches it reads) for show_mappings output; the caller
    owns cache cleanup (``spark.catalog.clearCache()``).
    ``on_pattern``: callback invoked with each qualifying
    :class:`MinedPattern` AS IT IS EMITTED — streamed result output,
    like the reference's per-pattern file append (``CMiner.py:503-516``;
    see :func:`pattern_block_text`). The full list is still returned.
    """
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
    n_edge_rows = e.count()

    # Level-synchronous mining is a superstep loop over a fixed-shape
    # union+aggregate plan: run it under the loop config
    # (plans/loopconf.py) — shuffle partitions derived from the DB
    # edge count, AQE off — so a level is one scheduler job and the
    # (#branches × partitions)-task union wave shrinks with the DB.
    from cminer_spark.plans.loopconf import superstep_conf

    with superstep_conf(vertices.sparkSession, n_edge_rows):
        return _mine_frequent_run(
            vertices, edges, v, e, n_graphs, min_support, max_edges,
            min_nodes, max_nodes, graph_col, start_patterns,
            with_graph_counts, keep_embeddings, on_pattern,
        )


def _mine_frequent_run(
    vertices, edges, v, e, n_graphs, min_support, max_edges,
    min_nodes, max_nodes, graph_col, start_patterns,
    with_graph_counts, keep_embeddings, on_pattern,
):

    results: list[MinedPattern] = []
    seen_codes: set[str] = set()
    # frontier entries: (pattern, lazy embeddings frame, n_edges)
    frontier: list[tuple[Pattern, DataFrame, int]] = []

    def _record(p: Pattern, emb: DataFrame, sup: int, freq: int,
                gcounts: dict) -> MinedPattern:
        mp = MinedPattern(
            p, sup, freq, canonical_code(p),
            graph_counts=gcounts if with_graph_counts else {},
            embeddings=emb if keep_embeddings else None,
        )
        if min_nodes <= len(p.nodes) <= max_nodes:
            results.append(mp)
            if on_pattern is not None:
                on_pattern(mp)
        return mp

    if start_patterns is None:
        # --- seed: 1-node patterns by full label set (A2) --------------
        # support + HAVING filter IN Spark: the driver receives one row
        # per FREQUENT label-set code, never the (codes × graphs) grain
        # — at 10^7-10^8 transactions that grain is a driver-side
        # collect bomb. Per-graph counts (the reference's `x` lines)
        # are fetched in a second aggregate restricted to the frequent
        # codes, and only when with_graph_counts is requested.
        seed_rows = (
            v.groupBy("lcode")
            .agg(
                F.countDistinct("_g").alias("sup"),
                F.count(F.lit(1)).alias("freq"),
            )
            .where(F.col("sup") >= min_support)
            .collect()
        )
        per_graph: dict[str, dict] = {}
        if with_graph_counts and seed_rows:
            codes = sorted(r["lcode"] for r in seed_rows)
            for row in (
                v.where(F.col("lcode").isin(codes))
                .groupBy("lcode", "_g")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            ):
                per_graph.setdefault(row["lcode"], {})[row["_g"]] = int(row["cnt"])
        for r in sorted(seed_rows, key=lambda r: r["lcode"]):
            lcode = r["lcode"]
            labels = lcode.split("|") if lcode else []
            p = Pattern().add_node("q0", labels)
            emb = v.where(F.col("lcode") == lcode).select(
                "_g", F.col("v_id").alias("n_q0")
            )
            seen_codes.add(canonical_code(p))
            _record(
                p, emb, int(r["sup"]), int(r["freq"]), per_graph.get(lcode, {})
            )
            frontier.append((p, emb, 0))
    else:
        # --- seed: user patterns localized via the matcher -------------
        for p in start_patterns:
            emb = (
                match(p, edges, vertices, graph_col=graph_col, include_edges=True)
                .withColumnRenamed(graph_col, "_g")
                .persist()
            )
            stats_row = emb.agg(
                F.countDistinct("_g").alias("sup"), F.count(F.lit(1)).alias("freq")
            ).collect()[0]
            sup, freq = int(stats_row["sup"]), int(stats_row["freq"])
            if sup < min_support:
                emb.unpersist()
                continue
            code = canonical_code(p)
            if code in seen_codes:
                emb.unpersist()
                continue
            gcounts: dict = {}
            if with_graph_counts:
                gcounts = {
                    r["_g"]: int(r["cnt"])
                    for r in emb.groupBy("_g")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .collect()
                }
            seen_codes.add(code)
            _record(p, emb, sup, freq, gcounts)
            frontier.append((p, emb, len(p.edges)))

    group_keys = ["_pid", "_kind", "_qi", "_qj", "_dir", "type", "_lnew"]
    while frontier:
        next_frontier: list[tuple[Pattern, DataFrame, int]] = []

        # --- level-synchronous candidate frame: every frontier
        # pattern's embeddings share one packed schema (_emb/_edges
        # arrays) and union FIRST; the three extension joins then run
        # over the union — Spark jobs AND analyzed join plans per
        # LEVEL are O(1), independent of frontier size (round-1 job
        # storm fix, stage 3: round 2 still built 3 joins per pattern)
        by_pid: dict[int, tuple[Pattern, DataFrame, int]] = {}
        packed_parts: list[DataFrame] = []
        node_ok_pids: list[int] = []
        for pid, (pattern, emb, n_edges_so_far) in enumerate(frontier):
            if n_edges_so_far >= max_edges:
                continue
            by_pid[pid] = (pattern, emb, n_edges_so_far)
            packed_parts.append(_packed_embeddings(pattern, emb, pid))
            if len(pattern.nodes) < max_nodes:
                node_ok_pids.append(pid)
        if not packed_parts:
            break

        # balanced tree unions: Dataset creation analyzes its plan
        # eagerly, so a linear unionByName chain costs O(B²) analyzer
        # node-visits over B frames; pairing halves that to O(B log B)
        def _tree_union(frames: list[DataFrame]) -> DataFrame:
            tier = frames
            while len(tier) > 1:
                tier = [
                    tier[i].unionByName(tier[i + 1])
                    if i + 1 < len(tier)
                    else tier[i]
                    for i in range(0, len(tier), 2)
                ]
            return tier[0]

        packed = _tree_union(packed_parts)
        cand = _tree_union(_level_branches(packed, v, e, node_ok_pids))
        # the union has (#branches × shuffle.partitions) partitions —
        # coalesce (narrow, no shuffle) back to one wave of tasks
        # before materializing, or per-task overhead dominates
        n_part = int(
            cand.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        cand = cand.coalesce(n_part)
        # lineage TRUNCATION, not just caching: children are lazy
        # filters of cand, so with plain persist() the logical plan
        # tree grows ~(branches)^level and Catalyst analysis OOMs
        # by level 4-5. localCheckpoint(eager=False) materializes
        # cand inside the aggregation job below and re-roots every
        # child at a LogicalRDD — plans stay O(branches) per level.
        cand = cand.localCheckpoint(eager=False)

        # THE one job per level: every (pattern, extension key)'s
        # support + frequency, HAVING-filtered in Spark — the driver
        # receives O(frequent extension keys) rows
        rows = (
            cand.groupBy(*group_keys)
            .agg(
                F.countDistinct("_g").alias("sup"),
                F.count(F.lit(1)).alias("freq"),
            )
            .where(F.col("sup") >= min_support)
            .collect()
        )
        stats = {
            tuple(r[c] for c in group_keys): (int(r["sup"]), int(r["freq"]))
            for r in rows
        }
        gmap: dict[tuple, dict] = {}
        if with_graph_counts and rows:
            # per-graph counts for the FREQUENT extension keys only: a
            # broadcast semi-join against the tiny frequent-key list
            # keeps the collect at O(frequent keys × graphs-with-hit),
            # never the raw (keys × graphs) grain
            spark = cand.sparkSession
            keys_df = spark.createDataFrame(
                [tuple(r[c] for c in group_keys) for r in rows],
                "_pid long, _kind string, _qi int, _qj int, _dir string, "
                "type string, _lnew string",
            )
            cond = None
            for k in group_keys:
                p = cand[k].eqNullSafe(keys_df[k])
                cond = p if cond is None else cond & p
            for r in (
                cand.join(F.broadcast(keys_df), cond, "left_semi")
                .groupBy(*group_keys, "_g")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            ):
                gmap.setdefault(tuple(r[c] for c in group_keys), {})[
                    r["_g"]
                ] = int(r["cnt"])
        for key_tuple in sorted(
            stats, key=lambda k: tuple("" if x is None else str(x) for x in k)
        ):
            pid, kind, qi_pos, qj_pos, direction, etype, lnew = key_tuple
            pattern, emb, n_edges_so_far = by_pid[pid]
            pat_nodes = list(pattern.nodes)
            qi = pat_nodes[qi_pos]
            qj = pat_nodes[qj_pos] if qj_pos is not None else None
            sup, freq = stats[key_tuple]
            gcounts = gmap.get(key_tuple, {})

            p2 = Pattern(dict(pattern.nodes), list(pattern.edges),
                         dict(pattern.node_props))
            cond = (
                (F.col("_pid") == pid)
                & (F.col("_kind") == kind)
                & (F.col("_qi") == qi_pos)
                & (F.col("type") == etype)
            )
            # unpack the parent's bindings back to named columns from
            # the packed arrays (parent node order is known here)
            node_ids = list(pattern.nodes)
            n_edges_bound = len(pattern.edges)
            base_cols = ["_g"] + [
                F.get("_emb", i).alias(f"n_{n}") for i, n in enumerate(node_ids)
            ] + [
                F.get("_edges", j).alias(f"e_{j}") for j in range(n_edges_bound)
            ]
            if kind == "node":
                new_id = _fresh_node_id(pattern)
                p2.add_node(new_id, lnew.split("|") if lnew else [])
                if direction == "out":
                    p2.add_edge(qi, new_id, etype)
                else:
                    p2.add_edge(new_id, qi, etype)
                cond = cond & (F.col("_dir") == direction) & (
                    F.col("_lnew") == lnew
                )
                extra = [
                    F.col("_vnew").alias(f"n_{new_id}"),
                    F.struct("src", "dst", "key").alias(f"e_{n_edges_bound}"),
                ]
            else:
                p2.add_edge(qi, qj, etype)
                cond = cond & (F.col("_qj") == qj_pos)
                extra = [
                    F.struct("src", "dst", "key").alias(f"e_{n_edges_bound}")
                ]
            code = canonical_code(p2)
            if code in seen_codes:
                continue
            seen_codes.add(code)
            emb2 = cand.where(cond).select(*base_cols, *extra)
            _record(p2, emb2, sup, freq, gcounts)
            next_frontier.append((p2, emb2, n_edges_so_far + 1))
        # this level's aggregation has materialized every child's
        # inputs — the previous level's checkpoint blocks are only
        # referenced by DataFrames we drop here, so the ContextCleaner
        # reclaims them on GC (localCheckpoint blocks have no
        # cacheManager entry to unpersist explicitly; the current
        # level's cand is kept alive by next_frontier's child frames)
        frontier = next_frontier

    if not keep_embeddings:
        v.unpersist()
        e.unpersist()
    return results


def pattern_block_text(mp: MinedPattern, pattern_id: int) -> str:
    """Driver-side render of ONE mined pattern as the reference's
    ``t/v/e/s/f[/x]`` block — byte-identical to
    :func:`cminer_spark.sources.data_format.write_patterns_text` output
    for the same row (parity-tested). Used for STREAMED result
    emission: the reference appends each pattern to the output file as
    it is emitted (``CMiner.py:503-516``) instead of buffering the full
    result set."""
    node_ids = {n: j for j, n in enumerate(mp.pattern.nodes)}
    # one part per sink concat_ws element — including the quirks: the
    # sink's concat_ws skips NULLs but keeps EMPTY strings, so empty
    # label lists leave a trailing space and an edge-less pattern keeps
    # an empty e-block line
    v_block = "\n".join(
        " ".join(["v", str(node_ids[n]), " ".join(mp.pattern.nodes[n])])
        for n in mp.pattern.nodes
    )
    e_block = "\n".join(
        " ".join(["e", str(node_ids[e.src]), str(node_ids[e.dst]), e.type])
        for e in mp.pattern.edges
    )
    parts = [
        f"t # {pattern_id}",
        v_block,
        e_block,
        f"s {mp.support}",
        f"f {mp.frequency}",
    ]
    if mp.graph_counts:
        parts.append(
            "x "
            + " ".join(
                f"({g}, {int(c)})"
                for g, c in sorted(
                    mp.graph_counts.items(), key=lambda kv: str(kv[0])
                )
            )
        )
    return "\n".join(parts)


def patterns_to_df(spark, mined: list[MinedPattern]) -> DataFrame:
    """Mined patterns → the result-sink schema of
    :func:`cminer_spark.sources.data_format.write_patterns_text`
    (incl. per-graph ``x``-line counts when mined with
    ``with_graph_counts=True``)."""
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
                [
                    (str(g), int(c))
                    for g, c in sorted(mp.graph_counts.items(), key=lambda kv: str(kv[0]))
                ],
            )
        )
    return spark.createDataFrame(
        rows,
        "pattern_id long, vertices array<struct<v_id:long,labels:array<string>>>, "
        "edges array<struct<src:long,dst:long,type:string>>, support long, "
        "frequency long, graph_counts array<struct<graph_id:string,cnt:long>>",
    )
