"""k-core decomposition vs networkx core_number (SURVEY §5)."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from cminer_spark.operators.kcore import core_numbers, k_core
from cminer_spark.plans import SuperstepCheckpoint

from tests.conftest import edges_df


def _assert_parity(spark, pairs, vertices=None):
    df = edges_df(spark, pairs)
    vdf = (
        spark.createDataFrame([(int(v),) for v in vertices], "v_id long")
        if vertices
        else None
    )
    cores, info = core_numbers(df, vertices=vdf)
    assert info.converged
    got = {r.v_id: r.core for r in cores.collect()}
    g = nx.Graph()
    g.add_nodes_from(vertices or [])
    g.add_edges_from((p[0], p[1]) for p in pairs if p[0] != p[1])
    want = nx.core_number(g)
    assert got == want, {k: (got.get(k), want.get(k)) for k in want if got.get(k) != want.get(k)}
    return info


def test_clique_with_tail(spark):
    # K5 (core 4) with a path tail (core 1)
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(4, 10), (10, 11), (11, 12)]
    info = _assert_parity(spark, pairs)
    assert info.rounds >= 1


def test_random_graph_parity(spark):
    rng = random.Random(17)
    n = 60
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    _assert_parity(spark, [p for p in pairs if p[0] != p[1]])


def test_self_loops_parallel_edges_isolated(spark):
    # self-loops ignored, parallel edges collapse, isolated → core 0
    pairs = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (3, 1)]
    info = _assert_parity(spark, pairs, vertices=[1, 2, 3, 50])
    assert info.converged


def test_two_cliques_bridge(spark):
    a = [(i, j) for i in range(4) for j in range(i + 1, 4)]          # K4
    b = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]  # K6
    _assert_parity(spark, a + b + [(0, 10)])


def test_k_core_membership(spark):
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]  # K5
    pairs += [(4, 10), (10, 11)]
    df = edges_df(spark, pairs)
    members = {r.v_id for r in k_core(df, 4).collect()}
    assert members == {0, 1, 2, 3, 4}
    members2 = {r.v_id for r in k_core(df, 1).collect()}
    assert members2 == {0, 1, 2, 3, 4, 10, 11}


def test_checkpoint_resume_equals_fresh(spark, tmp_ckpt):
    rng = random.Random(6)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    pairs = [p for p in pairs if p[0] != p[1]]
    df = edges_df(spark, pairs)
    fresh, fi = core_numbers(df)
    ck = SuperstepCheckpoint(spark, tmp_ckpt)
    core_numbers(df, max_rounds=1, checkpoint=ck)
    resumed, ri = core_numbers(df, checkpoint=ck)
    assert ri.resumed_from == 1
    g1 = {r.v_id: r.core for r in fresh.collect()}
    g2 = {r.v_id: r.core for r in resumed.collect()}
    assert g1 == g2
    # resume at fixpoint: no extra round
    again, ai = core_numbers(df, checkpoint=ck)
    assert ai.converged and ai.rounds == ri.rounds


def test_empty(spark):
    cores, info = core_numbers(edges_df(spark, []))
    assert cores.count() == 0 and info.converged
