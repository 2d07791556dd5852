"""link_prediction_scores vs networkx's reference implementations."""

from __future__ import annotations

import math
import random

import networkx as nx
import pytest

from cminer_spark.operators import link_prediction_scores


def _random_graph(seed: int, n: int = 40, p: float = 0.12) -> nx.Graph:
    rng = random.Random(seed)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < p:
                g.add_edge(a, b)
    return g


def _spark_edges(spark, g: nx.Graph):
    rows = [(int(a), int(b)) for a, b in g.edges()]
    return spark.createDataFrame(rows, "src long, dst long")


def _nx_scores(g: nx.Graph):
    """Expected (a, b) -> scores over non-adjacent pairs sharing ≥1
    neighbor (networkx scores all given pairs; we enumerate the
    wedge-candidates exactly as the operator defines them)."""
    out = {}
    for a in g.nodes:
        for b in g.nodes:
            if a >= b or g.has_edge(a, b):
                continue
            shared = sorted(nx.common_neighbors(g, a, b))
            if not shared:
                continue
            out[(a, b)] = {
                "common_neighbors": len(shared),
                "adamic_adar": sum(1.0 / math.log(g.degree(z)) for z in shared),
                "resource_allocation": sum(1.0 / g.degree(z) for z in shared),
                "pref_attachment": g.degree(a) * g.degree(b),
            }
    return out


@pytest.mark.parametrize("seed", [7, 23])
def test_matches_networkx(spark, seed):
    g = _random_graph(seed)
    got = {
        (r["a"], r["b"]): r.asDict()
        for r in link_prediction_scores(_spark_edges(spark, g)).collect()
    }
    want = _nx_scores(g)
    assert set(got) == set(want)
    for k, w in want.items():
        r = got[k]
        assert r["common_neighbors"] == w["common_neighbors"], k
        assert r["pref_attachment"] == w["pref_attachment"], k
        assert abs(r["adamic_adar"] - w["adamic_adar"]) < 1e-9, k
        assert abs(r["resource_allocation"] - w["resource_allocation"]) < 1e-9, k


def test_pivot_cap_excludes_hub(spark):
    # star: hub 0 with leaves 1..6, plus a wedge 1-7-2
    edges = [(0, i) for i in range(1, 7)] + [(1, 7), (7, 2)]
    df = spark.createDataFrame([(a, b) for a, b in edges], "src long, dst long")
    full = {
        (r["a"], r["b"]): r["common_neighbors"]
        for r in link_prediction_scores(df).collect()
    }
    # through the hub every leaf pair is a candidate; (1,2) shares hub AND 7
    assert full[(1, 2)] == 2
    capped = {
        (r["a"], r["b"]): r["common_neighbors"]
        for r in link_prediction_scores(df, max_pivot_degree=3).collect()
    }
    # hub (degree 6) excluded as pivot: leaf pairs through the hub are
    # gone; (1,2) keeps only its 7-pivot wedge, and (0,7) survives via
    # the degree-2 pivots 1 and 2 (the cap excludes hub PIVOTS, not
    # pairs involving hubs)
    assert set(capped) == {(0, 7), (1, 2)}
    assert capped[(1, 2)] == 1
    assert capped[(0, 7)] == 2


def test_exclude_existing_toggle(spark):
    # triangle 0-1-2: every pair is an edge AND shares a neighbor
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    assert link_prediction_scores(df).count() == 0
    kept = link_prediction_scores(df, exclude_existing=False)
    assert {(r["a"], r["b"]) for r in kept.collect()} == {(0, 1), (0, 2), (1, 2)}


def test_directed_multigraph_projection(spark):
    # parallel + reverse edges and a self-loop collapse to one simple
    # undirected wedge 1-0-2
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (0, 2), (2, 2)], "src long, dst long"
    )
    rows = link_prediction_scores(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["common_neighbors"]) == (1, 2, 1)
    assert abs(r["adamic_adar"] - 1.0 / math.log(2.0)) < 1e-12
    assert abs(r["resource_allocation"] - 0.5) < 1e-12
    assert r["pref_attachment"] == 1
