"""Borůvka MSF: networkx parity (exact on unique weights, weight-equal
on ties), forest structure, multi-component inputs, determinism."""

from __future__ import annotations

import networkx as nx

from cminer_spark.operators import boruvka_msf


def _run(spark, triples, **kw):
    df = spark.createDataFrame(triples, "src long, dst long, weight double")
    forest, info = boruvka_msf(df, **kw)
    return sorted(map(tuple, forest.collect())), info


def _nx_msf(triples):
    g = nx.Graph()
    for u, v, w in triples:
        if u == v:
            continue
        if g.has_edge(u, v):
            g[u][v]["weight"] = min(g[u][v]["weight"], w)
        else:
            g.add_edge(u, v, weight=w)
    return g, sorted(
        (min(u, v), max(u, v), d["weight"])
        for u, v, d in nx.minimum_spanning_edges(g, data=True)
    )


def _rand_graph(seed, n=40, m=140, unique=True):
    import random

    rng = random.Random(seed)
    triples = []
    for i in range(m):
        u, v = rng.randrange(n), rng.randrange(n)
        w = float(i if unique else rng.randrange(10))
        triples.append((u, v, w))
    if unique:
        rng.shuffle(triples)
    return triples


def test_unique_weights_exact_nx_parity(spark):
    triples = _rand_graph(1, unique=True)
    got, info = _run(spark, triples)
    _g, want = _nx_msf(triples)
    assert info.converged
    assert got == want


def test_duplicate_weights_same_total_and_structure(spark):
    triples = _rand_graph(2, unique=False)
    got, info = _run(spark, triples)
    g, want = _nx_msf(triples)
    assert info.converged
    assert abs(sum(w for *_e, w in got) - sum(w for *_e, w in want)) < 1e-9
    assert len(got) == len(want)
    f = nx.Graph()
    f.add_edges_from((u, v) for u, v, _ in got)
    f.add_nodes_from(g.nodes)
    assert nx.number_connected_components(f) == nx.number_connected_components(g)
    assert len(got) == f.number_of_edges()  # acyclic: n - #components edges


def test_multi_component_forest(spark):
    triples = [(0, 1, 3.0), (1, 2, 1.0), (0, 2, 2.0),
               (10, 11, 5.0), (11, 12, 4.0)]
    got, info = _run(spark, triples)
    assert info.converged
    assert got == [(0, 2, 2.0), (1, 2, 1.0), (10, 11, 5.0), (11, 12, 4.0)]


def test_parallel_edges_and_self_loops(spark):
    triples = [(0, 1, 9.0), (1, 0, 2.0), (0, 0, 0.5), (1, 2, 1.0)]
    got, _ = _run(spark, triples)
    assert got == [(0, 1, 2.0), (1, 2, 1.0)]


def test_deterministic_under_all_equal_weights(spark):
    # every weight equal: the (w, lo, hi) total order decides; output
    # must be identical across runs and a valid spanning tree
    triples = [(u, v, 1.0) for u in range(6) for v in range(u + 1, 6)]
    a, _ = _run(spark, triples)
    b, _ = _run(spark, triples)
    assert a == b
    assert len(a) == 5


def test_planted_gate_graph_closed_form(spark):
    from cminer_spark import gate

    forest, info = boruvka_msf(gate.msf_planted_edges(spark))
    got = sorted(map(tuple, forest.collect()))
    s, nc = gate.MSF_CLIQUE_SIZE, gate.MSF_CLIQUES
    want = sorted(
        [((v // s) * s, v, float(((v // s) * s) * 1000 + v))
         for v in range(nc * s) if v % s != 0]
        + [(c * s, (c + 1) * s, float(1_000_000 + c)) for c in range(nc - 1)]
    )
    assert info.converged
    assert got == want
