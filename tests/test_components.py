"""Connected components: exact parity vs networkx + differential vs
hash-min; resume-equals-fresh."""

from __future__ import annotations

import random

import networkx as nx

from cminer_spark.operators import connected_components, hashmin_components
from cminer_spark.plans import SuperstepCheckpoint

from tests.conftest import edges_df
from tests.oracles import hashmin_oracle


def _nx_components(pairs, vertices=()):
    g = nx.Graph()
    g.add_nodes_from(vertices)
    g.add_edges_from((s, d) for s, d in pairs)
    return {min(c): set(c) for c in nx.connected_components(g)}


def _got_components(labels_df):
    out: dict[int, set[int]] = {}
    for r in labels_df.collect():
        out.setdefault(r.component, set()).add(r.v_id)
    return out


def _check(spark, pairs, vertices=()):
    df = edges_df(spark, pairs)
    vdf = (
        spark.createDataFrame([(int(v),) for v in vertices], "v_id long")
        if vertices
        else None
    )
    labels, info = connected_components(df, vertices=vdf)
    got = _got_components(labels)
    want = _nx_components(pairs, vertices)
    assert got == want
    assert info.converged
    assert info.n_components == len(want)


def test_two_cliques_with_bridge(spark):
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    _check(spark, k1 + k2)  # two components
    _check(spark, k1 + k2 + [(4, 10)])  # bridged: one


def test_chain_and_isolated(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4), (7, 8)], vertices=[1, 2, 3, 4, 7, 8, 99])


def test_random_graph_parity(spark):
    rng = random.Random(13)
    n = 300
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    pairs = [p for p in pairs if p[0] != p[1]]
    _check(spark, pairs)


def test_hashmin_differential(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(60)]
    pairs = [p for p in pairs if p[0] != p[1]]
    df = edges_df(spark, pairs)
    got = {
        r.v_id: r.component
        for r in hashmin_components(df, rounds=4).collect()
    }
    want = hashmin_oracle(pairs, rounds=4)
    assert got == want


def test_cc_resume_equals_fresh(spark, tmp_ckpt):
    rng = random.Random(17)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(180)]
    pairs = [p for p in pairs if p[0] != p[1]]
    df = edges_df(spark, pairs)
    fresh, _ = connected_components(df)

    ck = SuperstepCheckpoint(spark, tmp_ckpt)
    connected_components(df, max_rounds=2, checkpoint=ck)
    resumed, info = connected_components(df, checkpoint=ck)
    assert info.resumed_from == 2
    assert _got_components(fresh) == _got_components(resumed)


def _labels(df):
    return {r.v_id: r.component for r in df.collect()}


def test_incremental_equals_full_recompute(spark):
    from cminer_spark.operators import incremental_components

    rng = random.Random(23)
    base = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(60)})
    base = [p for p in base if p[0] != p[1]]
    # delta: merges two existing components, adds brand-new vertices
    # (60-64 chain hooked onto vertex 0), and an intra-component edge
    delta = [(60, 61), (61, 62), (62, 0), (63, 64)] + [
        p for p in [(1, 40), (2, 3)] if p not in base
    ]
    prev, _ = connected_components(edges_df(spark, base))
    got, info = incremental_components(prev, edges_df(spark, delta))
    want, _ = connected_components(edges_df(spark, base + delta))
    assert _labels(got) == _labels(want)
    assert info.n_components == len(set(_labels(want).values()))


def test_incremental_no_delta_changes_nothing(spark):
    from cminer_spark.operators import incremental_components

    base = [(0, 1), (1, 2), (5, 6)]
    prev, _ = connected_components(edges_df(spark, base))
    empty = spark.createDataFrame([], "src long, dst long")
    got, _ = incremental_components(prev, empty)
    assert _labels(got) == _labels(prev)


def test_incremental_labels_stay_canonical_min(spark):
    from cminer_spark.operators import incremental_components

    # two components {5,6} and {7,8}; a new vertex 1 bridges them:
    # the merged component's label must become 1 (the new minimum)
    prev, _ = connected_components(edges_df(spark, [(5, 6), (7, 8)]))
    got, _ = incremental_components(prev, edges_df(spark, [(1, 5), (1, 7)]))
    assert set(_labels(got).values()) == {1}
