"""k-truss peeling vs a driver-side reference (SURVEY §5)."""

from __future__ import annotations

import itertools
import random

import networkx as nx
import pytest

from cminer_spark.operators.truss import ktruss_edges

from tests.conftest import edges_df


def _nx_truss_edges(pairs, k):
    g = nx.Graph()
    g.add_edges_from((p[0], p[1]) for p in pairs if p[0] != p[1])
    t = nx.k_truss(g, k)
    return {(min(a, b), max(a, b)) for a, b in t.edges}


def _run(spark, pairs, k):
    out, info = ktruss_edges(edges_df(spark, pairs), k)
    assert info.converged, info
    return {(r.a, r.b) for r in out.collect()}, info


def test_clique_survives_its_truss(spark):
    # K5 is a 5-truss: every edge closes 3 triangles
    pairs = list(itertools.combinations(range(5), 2))
    for k in (3, 4, 5):
        got, _ = _run(spark, pairs, k)
        assert got == {(a, b) for a, b in pairs}, k
    got, _ = _run(spark, pairs, 6)
    assert got == set()


def test_pendant_triangle_chain_peels(spark):
    # triangle {0,1,2} + tail 2-3-4: k=3 keeps only the triangle
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got, info = _run(spark, pairs, 3)
    assert got == {(0, 1), (0, 2), (1, 2)}
    assert info.n_edges == 3


def test_cascading_peel_needs_multiple_rounds(spark):
    # two triangles sharing edge (1,2), plus a triangle hanging off a
    # vertex that loses support only after the first peel: k=4 demands
    # every edge in 2 triangles — the bowtie collapses in cascade
    pairs = [
        (0, 1), (0, 2), (1, 2),
        (1, 3), (2, 3),
        (3, 4), (3, 5), (4, 5),
    ]
    got, info = _run(spark, pairs, 4)
    assert got == _nx_truss_edges(pairs, 4) == set()
    assert info.rounds >= 2


def test_random_graph_matches_networkx(spark):
    rng = random.Random(83)
    pairs = list({
        (rng.randrange(18), rng.randrange(18)) for _ in range(90)
    })
    for k in (3, 4):
        got, _ = _run(spark, pairs, k)
        assert got == _nx_truss_edges(pairs, k), k


def test_k2_is_identity_and_bad_k_raises(spark):
    pairs = [(0, 1), (1, 2)]
    got, info = _run(spark, pairs, 2)
    assert got == {(0, 1), (1, 2)} and info.converged
    with pytest.raises(ValueError):
        ktruss_edges(edges_df(spark, pairs), 1)
