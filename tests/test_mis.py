"""Maximal independent set: independence + maximality at convergence,
determinism, degenerate inputs, fixed-round prefix semantics."""

from __future__ import annotations

import random

import pytest

from cminer_spark.operators import maximal_independent_set
from tests.conftest import edges_df


def _run(spark, pairs, **kw):
    st, info = maximal_independent_set(edges_df(spark, pairs), **kw)
    rows = {r.v_id: r.status for r in st.collect()}
    return rows, info


@pytest.mark.parametrize("seed", [3, 17])
def test_converged_set_is_independent_and_maximal(spark, seed):
    rng = random.Random(seed)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    pairs = [p for p in pairs if p[0] != p[1]]
    rows, info = _run(spark, pairs, max_rounds=40)
    assert info.converged
    assert "undecided" not in rows.values()
    in_set = {v for v, s in rows.items() if s == "in"}
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independence: no edge inside the set
    for a, b in pairs:
        assert not (a in in_set and b in in_set), (a, b)
    # maximality: every excluded vertex has a neighbor in the set
    for v, s in rows.items():
        if s == "out":
            assert adj[v] & in_set, v


def test_deterministic_across_partitioning(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(100)]
    pairs = [p for p in pairs if p[0] != p[1]]
    st1, _ = maximal_independent_set(edges_df(spark, pairs).repartition(2))
    st2, _ = maximal_independent_set(edges_df(spark, pairs).repartition(9))
    assert {(r.v_id, r.status) for r in st1.collect()} == {
        (r.v_id, r.status) for r in st2.collect()
    }


def test_self_loop_only_vertex_is_isolated_and_in(spark):
    # simple-projection convention: self-loops ignored, so vertex 5 is
    # isolated and enters the set in round 1
    rows, info = _run(spark, [(1, 2), (5, 5)])
    assert rows[5] == "in"
    assert info.converged


def test_clique_selects_exactly_one(spark):
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    rows, info = _run(spark, pairs)
    assert info.converged
    assert sorted(rows.values()).count("in") == 1


def test_fixed_rounds_is_prefix_of_converged_run(spark):
    """stop_when_done=False after k rounds must agree with the
    converged run on every already-decided vertex (statuses are
    monotone: undecided -> in/out, never reassigned)."""
    rng = random.Random(11)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(120)]
    pairs = [p for p in pairs if p[0] != p[1]]
    partial, _ = _run(spark, pairs, max_rounds=2, stop_when_done=False)
    full, info = _run(spark, pairs, max_rounds=40)
    assert info.converged
    for v, s in partial.items():
        if s != "undecided":
            assert full[v] == s, v


def test_empty_edges(spark):
    st, info = maximal_independent_set(
        edges_df(spark, []).limit(0), max_rounds=3
    )
    assert st.count() == 0
