"""Subgraph matcher vs a brute-force oracle (the reference verifies
its matcher the same way — independent recomputation,
/root/reference/test/checker.py:75-89)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from cminer_spark.operators.matching import Pattern, match, support


# -- brute-force oracle -------------------------------------------------

def brute_force_embeddings(pattern: Pattern, nodes, edges, node_props=None,
                           edge_props=None):
    """All injective node mappings such that every pattern edge maps to
    a DISTINCT target edge with matching type ('' = wildcard) and
    required (k, v) attrs present by item-subset (F4).

    nodes: {node_id: labels}; edges: [(src, dst, key, type)];
    node_props: {node_id: dict}; edge_props: {(src, dst, key): dict}.
    Returns set of tuples of target ids in pattern-node order.
    """
    node_props = node_props or {}
    edge_props = edge_props or {}
    pat_nodes = list(pattern.nodes)
    out = set()
    for perm in itertools.permutations(nodes, len(pat_nodes)):
        mapping = dict(zip(pat_nodes, perm))
        if any(
            not set(pattern.nodes[q]) <= set(nodes[mapping[q]]) for q in pat_nodes
        ):
            continue
        if any(
            node_props.get(mapping[q], {}).get(k) != v
            for q in pat_nodes
            for k, v in pattern.node_props.get(q, ())
        ):
            continue

        def assign(i, used):
            if i == len(pattern.edges):
                return True
            qe = pattern.edges[i]
            for e in edges:
                if e in used:
                    continue
                s, d, k_, t = e
                if s != mapping[qe.src] or d != mapping[qe.dst]:
                    continue
                if qe.type not in ("", t):
                    continue
                if any(
                    edge_props.get((s, d, k_), {}).get(pk) != pv
                    for pk, pv in qe.props
                ):
                    continue
                if assign(i + 1, used | {e}):
                    return True
            return False

        if assign(0, frozenset()):
            out.add(tuple(mapping[q] for q in pat_nodes))
    return out


def spark_embeddings(spark, pattern, nodes, edges, with_vertices=True,
                     node_props=None, edge_props=None):
    edf = spark.createDataFrame(
        [
            (s, d, k, t, (edge_props or {}).get((s, d, k), {}))
            for s, d, k, t in edges
        ],
        "src long, dst long, key int, type string, props map<string,string>",
    )
    vdf = (
        spark.createDataFrame(
            [(v, sorted(ls), (node_props or {}).get(v, {})) for v, ls in nodes.items()],
            "v_id long, labels array<string>, props map<string,string>",
        )
        if with_vertices
        else None
    )
    got = match(pattern, edf, vdf)
    cols = [f"n_{q}" for q in pattern.nodes]
    return {tuple(r[c] for c in cols) for r in got.collect()}


def _check(spark, pattern, nodes, edges):
    got = spark_embeddings(spark, pattern, nodes, edges)
    want = brute_force_embeddings(pattern, nodes, edges)
    assert got == want, f"got {got}\nwant {want}"
    return got


def test_single_typed_edge(spark):
    nodes = {1: ["a"], 2: ["b"], 3: ["a"]}
    edges = [(1, 2, 0, "x"), (2, 3, 0, "y"), (3, 1, 0, "x")]
    p = Pattern().add_node("u", ["a"]).add_node("v", []).add_edge("u", "v", "x")
    got = _check(spark, p, nodes, edges)
    assert got == {(1, 2), (3, 1)}


def test_wildcard_edge_matches_any_type(spark):
    nodes = {1: [], 2: [], 3: []}
    edges = [(1, 2, 0, "x"), (2, 3, 0, "y")]
    p = Pattern().add_edge("a", "b", "")
    got = _check(spark, p, nodes, edges)
    assert len(got) == 2


def test_multilabel_containment(spark):
    # target must carry ALL query labels (Graph.py:87-88 semantics)
    nodes = {1: ["a", "b"], 2: ["a"], 3: ["a", "b", "c"]}
    edges = [(1, 2, 0, "x"), (3, 2, 0, "x")]
    p = Pattern().add_node("u", ["a", "b"]).add_node("v", []).add_edge("u", "v", "x")
    got = _check(spark, p, nodes, edges)
    assert got == {(1, 2), (3, 2)}


def test_triangle_pattern(spark):
    nodes = {i: [] for i in range(1, 6)}
    edges = [
        (1, 2, 0, "t"), (2, 3, 0, "t"), (3, 1, 0, "t"),
        (3, 4, 0, "t"), (4, 5, 0, "t"),
    ]
    p = (
        Pattern()
        .add_edge("a", "b", "t")
        .add_edge("b", "c", "t")
        .add_edge("c", "a", "t")
    )
    got = _check(spark, p, nodes, edges)
    assert got == {(1, 2, 3), (2, 3, 1), (3, 1, 2)}


def test_parallel_edges_need_distinct_targets(spark):
    # pattern with two parallel u→v edges requires two distinct target
    # edges (edge injectivity, MultiGraphMatch.py:289-301)
    nodes = {1: [], 2: [], 3: [], 4: []}
    edges = [(1, 2, 0, "x"), (1, 2, 1, "x"), (3, 4, 0, "x")]
    p = Pattern().add_edge("u", "v", "x").add_edge("u", "v", "x")
    got = _check(spark, p, nodes, edges)
    assert got == {(1, 2)}  # (3,4) has only one edge


def test_injectivity_of_nodes(spark):
    nodes = {1: [], 2: []}
    edges = [(1, 2, 0, "x"), (2, 1, 0, "x")]
    p = Pattern().add_edge("a", "b", "x").add_edge("b", "c", "x")
    # c must differ from a: no valid embedding in a 2-cycle
    got = _check(spark, p, nodes, edges)
    assert got == set()


def test_self_loop_pattern(spark):
    nodes = {1: [], 2: []}
    edges = [(1, 1, 0, "s"), (1, 2, 0, "x")]
    p = Pattern().add_edge("a", "a", "s")
    got = _check(spark, p, nodes, edges)
    assert got == {(1,)}


def test_data_self_loop_not_bound_to_two_query_nodes(spark):
    """Regression (ADVICE r1): a target self-loop must NOT bind both
    endpoints of the first ordered pattern edge to one vertex — the
    reference's mapping check rejects it (MultiGraphMatch.py:289-301).
    Node 1 also has a second out-edge so edge injectivity can't mask
    the bug."""
    nodes = {1: [], 2: []}
    edges = [(1, 1, 0, "x"), (1, 2, 0, "x")]
    p = Pattern().add_edge("a", "b", "x")
    got = _check(spark, p, nodes, edges)
    assert got == {(1, 2)}
    # and the bare self-loop-only graph yields nothing
    got2 = spark_embeddings(spark, p, {1: []}, [(1, 1, 0, "x")])
    assert got2 == set()


def test_node_attr_containment(spark):
    """F4: node attr item-subset (reference Graph.py:390-402)."""
    nodes = {1: ["a"], 2: ["a"], 3: []}
    node_props = {1: {"color": "red", "size": "3"}, 2: {"color": "blue"}}
    edges = [(1, 3, 0, "x"), (2, 3, 0, "x")]
    p = (
        Pattern()
        .add_node("u", ["a"], props={"color": "red"})
        .add_edge("u", "v", "x")
    )
    got = spark_embeddings(spark, p, nodes, edges, node_props=node_props)
    want = brute_force_embeddings(p, nodes, edges, node_props=node_props)
    assert got == want == {(1, 3)}
    # requiring a key that exists nowhere matches nothing (missing key
    # must filter, not error, under ANSI map access)
    p2 = Pattern().add_node("u", [], props={"nope": "1"}).add_edge("u", "v", "x")
    assert spark_embeddings(spark, p2, nodes, edges, node_props=node_props) == set()


def test_edge_attr_containment(spark):
    """F4: edge attr item-subset (reference Graph.py:404-419,
    applied MultiGraphMatch.py:341-348)."""
    nodes = {1: [], 2: [], 3: []}
    edges = [(1, 2, 0, "x"), (1, 2, 1, "x"), (2, 3, 0, "x")]
    edge_props = {
        (1, 2, 0): {"w": "5", "kind": "hot"},
        (1, 2, 1): {"w": "7"},
        (2, 3, 0): {"w": "5"},
    }
    p = Pattern().add_edge("u", "v", "x", props={"w": "5"})
    got = spark_embeddings(spark, p, nodes, edges, edge_props=edge_props)
    want = brute_force_embeddings(p, nodes, edges, edge_props=edge_props)
    assert got == want == {(1, 2), (2, 3)}
    # two required attrs: conjunction
    p2 = Pattern().add_edge("u", "v", "x", props={"w": "5", "kind": "hot"})
    assert spark_embeddings(spark, p2, nodes, edges, edge_props=edge_props) == {(1, 2)}


def test_random_graphs_with_attrs_vs_oracle(spark):
    import random

    rng = random.Random(17)
    for _ in range(2):
        n = 7
        nodes = {i: rng.sample(["a", "b"], rng.randint(0, 1)) for i in range(n)}
        node_props = {
            i: {"c": rng.choice(["r", "g"])} for i in range(n) if rng.random() < 0.7
        }
        raw = [
            (rng.randrange(n), rng.randrange(n), rng.choice(["x", "y"]))
            for _ in range(12)
        ]
        keyed, edges, edge_props = {}, [], {}
        for s, d, t in raw:
            k = keyed.get((s, d), 0)
            keyed[(s, d)] = k + 1
            edges.append((s, d, k, t))
            if rng.random() < 0.6:
                edge_props[(s, d, k)] = {"w": rng.choice(["1", "2"])}
        p = (
            Pattern()
            .add_node("u", [], props={"c": "r"})
            .add_edge("u", "v", "x", props={"w": "1"})
            .add_edge("v", "w", "")
        )
        got = spark_embeddings(
            spark, p, nodes, edges, node_props=node_props, edge_props=edge_props
        )
        want = brute_force_embeddings(
            p, nodes, edges, node_props=node_props, edge_props=edge_props
        )
        assert got == want


def test_node_only_pattern(spark):
    nodes = {1: ["a"], 2: ["a"], 3: ["b"]}
    p = Pattern().add_node("u", ["a"])
    got = spark_embeddings(spark, p, nodes, [])
    assert got == {(1,), (2,)}


def test_random_graphs_vs_oracle(spark):
    import random

    rng = random.Random(99)
    for trial in range(3):
        n = 8
        nodes = {
            i: rng.sample(["a", "b", "c"], rng.randint(0, 2)) for i in range(n)
        }
        raw = [
            (rng.randrange(n), rng.randrange(n), rng.choice(["x", "y"]))
            for _ in range(14)
        ]
        keyed = {}
        edges = []
        for s, d, t in raw:
            k = keyed.get((s, d), 0)
            keyed[(s, d)] = k + 1
            edges.append((s, d, k, t))
        p = (
            Pattern()
            .add_node("u", ["a"])
            .add_edge("u", "v", "x")
            .add_edge("v", "w", "")
        )
        _check(spark, p, nodes, edges)


def test_transactional_support(spark):
    # 3 graphs, pattern present in 2 (A1 support semantics)
    rows = []
    for g, has in (("g1", True), ("g2", True), ("g3", False)):
        rows.append((g, 1, 2, 0, "x"))
        if has:
            rows.append((g, 2, 3, 0, "y"))
    edf = spark.createDataFrame(
        rows, "graph_id string, src long, dst long, key int, type string"
    )
    p = Pattern().add_edge("a", "b", "x").add_edge("b", "c", "y")
    emb = match(p, edf)
    assert emb.select("graph_id").distinct().count() == 2
    assert support(emb).collect()[0]["support"] == 2
    assert support(emb, min_support=3).count() == 0


def test_prefilter_catalog_early_abort(spark):
    """F1 early-abort (reference MultiGraphMatch.py:233-240): a pattern
    requiring an edge type or node label the target has nowhere
    returns the empty frame with the normal match schema; when every
    required type/label exists, results are identical to the lazy
    path."""
    edf = spark.createDataFrame(
        [(1, 2, 0, "x"), (2, 3, 0, "y")],
        "src long, dst long, key int, type string",
    )
    vdf = spark.createDataFrame(
        [(1, ["a"]), (2, ["b"]), (3, ["a"])],
        "v_id long, labels array<string>",
    )
    # missing edge type → abort-empty, schema preserved
    p_bad_t = Pattern().add_edge("u", "v", "zzz")
    out = match(p_bad_t, edf, vdf, prefilter_catalog=True)
    assert out.count() == 0
    assert out.columns == match(p_bad_t, edf, vdf).columns
    assert out.schema == match(p_bad_t, edf, vdf).schema
    # missing node label → abort-empty
    p_bad_l = Pattern().add_node("u", ["nope"]).add_edge("u", "v", "x")
    assert match(p_bad_l, edf, vdf, prefilter_catalog=True).count() == 0
    # all catalogs present → identical embeddings to the lazy path
    p_ok = Pattern().add_node("u", ["a"]).add_edge("u", "v", "x")
    got = {
        (r["n_u"], r["n_v"])
        for r in match(p_ok, edf, vdf, prefilter_catalog=True).collect()
    }
    want = {
        (r["n_u"], r["n_v"]) for r in match(p_ok, edf, vdf).collect()
    }
    assert got == want == {(1, 2)}


def test_order_stats_selective_edge_leads(spark):
    """O1 (reference Ordering.py:13-47 score shape): with catalog
    statistics the RARE-typed edge leads the join order on a skewed
    graph, and the embeddings are identical to the default ordering."""
    from cminer_spark.operators.matching import (
        _order_edges,
        edge_domain_estimates,
    )

    rows = [(i, i + 1000, 0, "common") for i in range(500)]
    rows += [(1, 2000, 0, "rare"), (7, 2000, 0, "rare")]
    edf = spark.createDataFrame(rows, "src long, dst long, key int, type string")
    p = (
        Pattern()
        .add_node("a")
        .add_node("b")
        .add_node("c")
        .add_edge("a", "b", "common")
        .add_edge("a", "c", "rare")
    )
    dom = edge_domain_estimates(p, edf)
    assert dom[0] > dom[1]  # 500 common vs 2 rare
    order = _order_edges(p, dom)
    assert order[0].type == "rare"
    # the stat-less heuristic ties on constraint count → input order
    assert _order_edges(p)[0].type == "common"
    base = {(r.n_a, r.n_b, r.n_c) for r in match(p, edf).collect()}
    stat = {
        (r.n_a, r.n_b, r.n_c)
        for r in match(p, edf, order_stats=True).collect()
    }
    assert base == stat and (1, 1001, 2000) in base and len(base) == 2


def test_parallel_edge_symmetry_breaking(spark):
    """G4 edge-key conditions (reference BreakingConditions.py:98-119):
    a pattern whose two parallel edges are interchangeable keeps
    exactly ONE representative per automorphism class, with ascending
    target-edge keys."""
    edf = spark.createDataFrame(
        [(1, 2, 0, "w"), (1, 2, 1, "w"), (3, 4, 0, "w")],
        "src long, dst long, key int, type string",
    )
    p = Pattern().add_edge("u", "v", "w").add_edge("u", "v", "w")
    plain = match(p, edf, include_edges=True).collect()
    assert len(plain) == 2  # both key assignments
    broken = match(p, edf, include_edges=True, break_symmetry=True).collect()
    assert len(broken) == 1
    r = broken[0]
    assert (r.n_u, r.n_v) == (1, 2)
    assert r.e_0.key < r.e_1.key
    # differently-typed parallel edges are NOT interchangeable
    edf2 = spark.createDataFrame(
        [(1, 2, 0, "w"), (1, 2, 1, "x")],
        "src long, dst long, key int, type string",
    )
    p2 = Pattern().add_edge("u", "v", "w").add_edge("u", "v", "x")
    assert match(p2, edf2, break_symmetry=True).count() == 1
    assert match(p2, edf2).count() == 1


def test_edge_domain_estimates_wildcard_vs_empty_type(spark):
    """WILDCARD ('') matches every edge, so its domain estimate must be
    total_edges even when ''-TYPED edges exist in the data (JSON loads
    encode untyped edges as '') — not the count of ''-typed rows."""
    from cminer_spark.operators.matching import edge_domain_estimates

    rows = [(i, i + 100, 0, "") for i in range(5)]
    rows += [(i, i + 200, 0, "x") for i in range(50)]
    edf = spark.createDataFrame(rows, "src long, dst long, key int, type string")
    p = Pattern().add_edge("a", "b", "").add_edge("b", "c", "x")
    dom = edge_domain_estimates(p, edf)
    assert dom[0] == 55.0 and dom[1] == 50.0
