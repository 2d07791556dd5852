"""Jones-Plassmann greedy coloring: properness after every round,
convergence, chromatic bounds on known graphs, projection conventions."""

from __future__ import annotations

from pyspark.sql import functions as F

from cminer_spark.operators.coloring import greedy_coloring
from tests.conftest import edges_df


def _colors(spark, pairs, **kw):
    st, info = greedy_coloring(edges_df(spark, pairs), **kw)
    return {r.v_id: r.color for r in st.collect()}, info


def _assert_proper(pairs, colors):
    for u, v, *_ in [p + (None,) for p in pairs]:
        if u == v:
            continue
        cu, cv = colors[u], colors[v]
        if cu >= 0 and cv >= 0:
            assert cu != cv, (u, v, cu)


def test_triangle_needs_three_colors(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]
    colors, info = _colors(spark, pairs)
    assert info.converged
    _assert_proper(pairs, colors)
    assert sorted(colors.values()) == [0, 1, 2]


def test_star_uses_two_colors(spark):
    pairs = [(0, i) for i in range(1, 8)]
    colors, info = _colors(spark, pairs)
    assert info.converged
    _assert_proper(pairs, colors)
    assert len(set(colors.values())) == 2
    assert all(colors[i] != colors[0] for i in range(1, 8))


def test_even_cycle_two_colors_odd_three(spark):
    even = [(i, (i + 1) % 6) for i in range(6)]
    colors, info = _colors(spark, even)
    _assert_proper(even, colors)
    assert len(set(colors.values())) <= 3  # JP is greedy, >=2 needed
    odd = [(i, (i + 1) % 5) for i in range(5)]
    colors, _ = _colors(spark, odd)
    _assert_proper(odd, colors)
    assert len(set(colors.values())) >= 3


def test_partial_rounds_stay_proper(spark):
    # path graph: after 1 fixed round only local priority minima are
    # colored, everything colored must already be conflict-free
    pairs = [(i, i + 1) for i in range(30)]
    colors, info = _colors(
        spark, pairs, max_rounds=1, stop_when_done=False
    )
    assert not info.converged or info.uncolored[-1] == 0
    assert any(c == -1 for c in colors.values())
    assert any(c >= 0 for c in colors.values())
    _assert_proper(pairs, colors)


def test_deterministic_and_projection_conventions(spark):
    # parallel edges + self-loop collapse; self-loop never blocks
    pairs = [(1, 2), (1, 2), (2, 1), (3, 3)]
    a, _ = _colors(spark, pairs)
    b, _ = _colors(spark, pairs)
    assert a == b
    assert a[1] != a[2]
    assert a[3] == 0  # self-loop-only vertex is isolated -> color 0


def test_colors_bounded_by_degree_plus_one(spark):
    # random-ish dense-ish graph: JP never exceeds maxdeg+1 colors
    pairs = [(i, j) for i in range(12) for j in range(i + 1, 12)
             if (i * 7 + j * 3) % 4 == 0]
    colors, info = _colors(spark, pairs, max_rounds=40)
    assert info.converged
    _assert_proper(pairs, colors)
    from collections import Counter
    deg = Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    assert max(colors.values()) <= max(deg.values())


def test_ldf_hub_decides_first_round(spark):
    # largest-degree-first priorities: a star's hub outranks every
    # leaf regardless of md5 draws, so it colors in round 1 (color 0)
    # and the leaves finish in round 2 — exactly 2 rounds, always.
    pairs = [(0, i) for i in range(1, 30)]
    colors, info = _colors(spark, pairs, max_rounds=5)
    assert info.converged and info.rounds == 2
    assert colors[0] == 0
    assert all(colors[i] == 1 for i in range(1, 30))
    _assert_proper(pairs, colors)
