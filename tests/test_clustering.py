"""Clustering coefficients vs networkx (SURVEY §5)."""

from __future__ import annotations

import math
import random

import networkx as nx
import pytest

from cminer_spark.operators.clustering import (
    clustering_coefficients,
    global_clustering,
)

from tests.conftest import edges_df


def _parity(spark, pairs, vertices=None):
    df = edges_df(spark, pairs)
    vdf = (
        spark.createDataFrame([(int(v),) for v in vertices], "v_id long")
        if vertices
        else None
    )
    got = {
        r.v_id: (r.degree, r.triangles, r.lcc)
        for r in clustering_coefficients(df, vdf).collect()
    }
    g = nx.Graph()
    g.add_nodes_from(vertices or [])
    g.add_edges_from((p[0], p[1]) for p in pairs if p[0] != p[1])
    want_c = nx.clustering(g)
    want_t = nx.triangles(g)
    assert set(got) == set(want_c)
    for v in want_c:
        deg, tri, lcc = got[v]
        assert deg == g.degree(v), (v, deg, g.degree(v))
        assert tri == want_t[v], (v, tri, want_t[v])
        assert math.isclose(lcc, want_c[v], abs_tol=1e-12), (v, lcc, want_c[v])

    row = global_clustering(df, vdf).collect()[0]
    assert math.isclose(row.transitivity, nx.transitivity(g), abs_tol=1e-12)
    want_avg = nx.average_clustering(g, count_zeros=True) if len(g) else 0.0
    assert math.isclose(row.avg_clustering, want_avg, abs_tol=1e-12)
    assert row.n_vertices == len(g)
    assert row.n_triangles == sum(want_t.values()) // 3


def test_triangle_plus_tail(spark):
    # one triangle, one pendant: C = 1,1,1/3,0
    _parity(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])


def test_clique_and_star(spark):
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(100, 100 + i) for i in range(1, 8)]
    _parity(spark, pairs)


def test_parallel_and_self_loops_collapse(spark):
    _parity(spark, [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)])


def test_isolated_vertices_via_vertex_frame(spark):
    _parity(spark, [(0, 1), (1, 2), (2, 0)], vertices=[0, 1, 2, 42, 43])


def test_random_graph_parity(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(400)]
    _parity(spark, pairs)


def test_empty_graph(spark):
    df = edges_df(spark, [])
    assert clustering_coefficients(df).count() == 0
    row = global_clustering(df).collect()[0]
    assert row.transitivity == 0.0 and row.avg_clustering == 0.0
    assert row.n_vertices == 0 and row.n_triangles == 0 and row.n_wedges == 0
