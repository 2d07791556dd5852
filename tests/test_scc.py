"""Strongly connected components vs networkx (SURVEY §5)."""

from __future__ import annotations

import random

import networkx as nx

from cminer_spark.operators.scc import strongly_connected_components

from tests.conftest import edges_df


def _nx_labels(pairs, extra_nodes=()):
    g = nx.DiGraph()
    g.add_edges_from((p[0], p[1]) for p in pairs)
    g.add_nodes_from(extra_nodes)
    labels = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            labels[v] = m
    return labels


def _parity(spark, pairs, **kw):
    labels, info = strongly_connected_components(edges_df(spark, pairs), **kw)
    assert info.converged, info
    got = {r.v_id: r.scc for r in labels.collect()}
    want = _nx_labels(pairs)
    assert got == want, {k: (got.get(k), want.get(k)) for k in set(got) | set(want)}
    return info


def test_dag_all_singletons(spark):
    info = _parity(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert info.n_nontrivial == 0


def test_single_cycle(spark):
    info = _parity(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    assert info.n_nontrivial == 1


def test_two_cycles_linked_by_dag_edge(spark):
    # cycle {0,1,2} → cycle {10,11}; the DAG edge must NOT merge them
    pairs = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 10)]
    info = _parity(spark, pairs)
    assert info.n_nontrivial == 2


def test_nested_cycle_needs_second_outer_round(spark):
    # color(5..7) = 0 (0 reaches them) but 0 ∉ {5,6,7}: the first
    # outer round assigns {0,1,2}, only the second finds {5,6,7}
    pairs = [(0, 1), (1, 2), (2, 0), (0, 5), (5, 6), (6, 7), (7, 5)]
    info = _parity(spark, pairs)
    assert info.n_nontrivial == 2
    assert info.outer_rounds >= 2


def test_self_loops_and_parallel_edges_ignored(spark):
    pairs = [(0, 0), (0, 1), (0, 1), (1, 0), (3, 4)]
    info = _parity(spark, pairs)
    assert info.n_nontrivial == 1  # {0,1}


def test_random_digraph_parity(spark):
    rng = random.Random(41)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    _parity(spark, pairs)


def test_sparse_random_digraph_parity(spark):
    # sparser → many mid-size SCCs and long trims
    rng = random.Random(99)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(90)]
    _parity(spark, pairs)


def test_budget_exhaustion_flags_not_converged(spark):
    labels, info = strongly_connected_components(
        edges_df(spark, [(0, 1), (1, 0)]), max_inner=0
    )
    assert not info.converged
    # fallback labels are singletons — flagged, not silently wrong
    got = {r.v_id: r.scc for r in labels.collect()}
    assert got == {0: 0, 1: 1}
