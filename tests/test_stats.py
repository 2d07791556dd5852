"""Graph summary statistics vs networkx / hand counts (SURVEY §5)."""

from __future__ import annotations

import math
import random

import networkx as nx
import pytest

from cminer_spark.operators.stats import (
    degree_assortativity,
    degree_histogram,
    graph_summary,
)

from tests.conftest import edges_df


def _rand_digraph(n=40, m=160, seed=7):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    return sorted(pairs)


def test_summary_matches_networkx(spark):
    pairs = _rand_digraph()
    g = nx.DiGraph(pairs)
    row = graph_summary(edges_df(spark, pairs)).collect()[0]
    assert row.n_vertices == g.number_of_nodes()
    assert row.n_edges == g.number_of_edges()
    assert row.n_self_loops == 0
    assert row.n_pairs == g.number_of_edges()
    assert math.isclose(row.density, nx.density(g), rel_tol=1e-12)
    assert math.isclose(row.reciprocity, nx.overall_reciprocity(g), rel_tol=1e-12)


def test_summary_multigraph_and_loops(spark):
    # 0→1 twice, 1→0, 2→2 loop, 3 isolated via 3→4
    pairs = [(0, 1), (0, 1), (1, 0), (2, 2), (3, 4)]
    row = graph_summary(edges_df(spark, pairs)).collect()[0]
    assert row.n_vertices == 5
    assert row.n_edges == 5
    assert row.n_self_loops == 1
    # distinct non-loop ordered pairs: (0,1),(1,0),(3,4)
    assert row.n_pairs == 3
    assert row.n_reciprocal == 2
    assert math.isclose(row.reciprocity, 2 / 3)
    assert math.isclose(row.density, 3 / (5 * 4))


def test_empty_pair_set_no_nulls(spark):
    row = graph_summary(edges_df(spark, [(1, 1)])).collect()[0]
    assert row.n_pairs == 0 and row.n_reciprocal == 0
    assert row.reciprocity == 0.0 and row.density == 0.0


def test_degree_histogram(spark):
    pairs = _rand_digraph(n=30, m=90, seed=11)
    got = {
        r.tot_deg: r.n_vertices
        for r in degree_histogram(edges_df(spark, pairs)).collect()
    }
    g = nx.DiGraph(pairs)
    want: dict[int, int] = {}
    for _v, d in g.degree():
        want[d] = want.get(d, 0) + 1
    assert got == want
    assert sum(got.values()) == g.number_of_nodes()


def test_assortativity_matches_networkx(spark):
    pairs = _rand_digraph(n=25, m=100, seed=3)
    g = nx.DiGraph(pairs)
    row = degree_assortativity(edges_df(spark, pairs)).collect()[0]
    assert row.m == g.number_of_edges()
    want = nx.degree_assortativity_coefficient(g, x="out", y="in")
    assert math.isclose(row.assortativity, want, abs_tol=1e-9), (
        row.assortativity,
        want,
    )


def test_assortativity_degenerate_is_null(spark):
    # perfect k-regular-ish: every x identical → zero variance → NULL
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    row = degree_assortativity(edges_df(spark, pairs)).collect()[0]
    assert row.m == 5
    assert row.assortativity is None


def test_modularity_matches_networkx(spark):
    from cminer_spark.operators.stats import modularity
    from networkx.algorithms.community import modularity as nx_modularity

    pairs = _rand_digraph(n=30, m=120, seed=19)
    g = nx.Graph()
    g.add_edges_from(pairs)
    # partition: vertex id mod 4
    part_map = {v: v % 4 for v in g.nodes}
    labels = spark.createDataFrame(
        [(int(v), int(c)) for v, c in part_map.items()],
        "v_id long, community long",
    )
    row = modularity(edges_df(spark, pairs), labels).collect()[0]
    comms = [
        {v for v, c in part_map.items() if c == k}
        for k in sorted(set(part_map.values()))
    ]
    want = nx_modularity(g, comms, weight=None)
    assert row.m == g.number_of_edges()
    assert math.isclose(row.q, want, abs_tol=1e-12), (row.q, want)


def test_modularity_extremes(spark):
    from cminer_spark.operators.stats import modularity

    # two disjoint triangles; perfect partition vs all-in-one
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    good = spark.createDataFrame(
        [(v, v // 10) for v in [0, 1, 2, 10, 11, 12]], "v_id long, community long"
    )
    merged = spark.createDataFrame(
        [(v, 0) for v in [0, 1, 2, 10, 11, 12]], "v_id long, community long"
    )
    q_good = modularity(edges_df(spark, pairs), good).collect()[0].q
    q_merged = modularity(edges_df(spark, pairs), merged).collect()[0].q
    assert math.isclose(q_good, 0.5)  # 1 - 2*(6/12)^2
    assert math.isclose(q_merged, 0.0)
    assert q_good > q_merged


def test_modularity_missing_labels_default_to_singletons(spark):
    from cminer_spark.operators.stats import modularity

    pairs = [(0, 1), (1, 2)]
    labels = spark.createDataFrame([(0, 7), (1, 7)], "v_id long, community long")
    row = modularity(edges_df(spark, pairs), labels).collect()[0]
    # und edges: (0,1) intra (7,7), (1,2) inter (7, 2-as-own)
    # A=1, m=2, degrees: 0:1,1:2,2:1 → d_7=3, d_2=1 → B=10
    assert row.m == 2
    assert math.isclose(row.q, 1 / 2 - 10 / 16)


def test_rank_churn_known_movers(spark):
    from cminer_spark.operators import rank_churn

    prev = spark.createDataFrame(
        [(1, 10.0), (2, 8.0), (3, 6.0), (4, 4.0)], "v_id long, rank double"
    )
    # 4 jumps to the top, 1 drops; 5 is new, 3 disappears
    cur = spark.createDataFrame(
        [(4, 12.0), (1, 9.0), (2, 7.0), (5, 1.0)], "v_id long, rank double"
    )
    rows = rank_churn(prev, cur, k=10).collect()
    by_v = {r.v_id: r for r in rows}
    # side-absent vertices are the largest movers, ordered by v_id
    assert [r.v_id for r in rows[:2]] == [3, 5]
    assert by_v[3].pos_cur is None and by_v[5].pos_prev is None
    assert by_v[4].pos_prev == 4 and by_v[4].pos_cur == 1
    assert by_v[4].pos_delta == 3
    assert by_v[1].pos_delta == 1 - 2  # slipped from 1st to 2nd
    assert by_v[2].pos_delta == 0 or by_v[2].pos_delta == -1


def test_rank_churn_k_limits_and_determinism(spark):
    from cminer_spark.operators import rank_churn

    prev = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(20)], "v_id long, rank double"
    )
    cur = spark.createDataFrame(
        [(i, float(100 - ((i + 5) % 20))) for i in range(20)],
        "v_id long, rank double",
    )
    a = [tuple(r) for r in rank_churn(prev, cur, k=7).collect()]
    b = [tuple(r) for r in rank_churn(prev, cur, k=7).collect()]
    assert a == b and len(a) == 7


def test_rank_churn_gate_parity(spark):
    import duckdb

    import __spark_entry__ as E
    from cminer_spark import gate

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in E.queries()["rank_churn_top50"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        tuple(None if v is None else int(v) for v in row)
        for row in con.execute(gate.rank_churn_oracle_sql()).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------- conductance


def test_conductance_two_cliques_bridge(spark):
    """Two triangles joined by one bridge edge: each community cuts 1
    edge and has volume 2*3+1 = 7 → φ = 1/7."""
    from cminer_spark.operators.stats import conductance

    tri_a = [(0, 1), (1, 2), (0, 2)]
    tri_b = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    e = edges_df(spark, tri_a + tri_b + bridge)
    labels = spark.createDataFrame(
        [(v, 100 if v < 3 else 200) for v in range(6)], "v_id long, community long"
    )
    rows = {r["community"]: r for r in conductance(e, labels).collect()}
    assert set(rows) == {100, 200}
    for c in (100, 200):
        assert rows[c]["cut_edges"] == 1
        assert rows[c]["volume"] == 7
        assert rows[c]["conductance"] == 1.0 / 7.0


def test_conductance_matches_networkx(spark):
    from cminer_spark.operators.stats import conductance

    pairs = _rand_digraph(n=30, m=120, seed=13)
    g = nx.Graph()
    g.add_edges_from(pairs)
    labels = {v: v % 3 for v in g.nodes}
    ldf = spark.createDataFrame(
        [(int(v), int(c)) for v, c in labels.items()], "v_id long, community long"
    )
    got = {
        r["community"]: r for r in conductance(edges_df(spark, pairs), ldf).collect()
    }
    for c in (0, 1, 2):
        s = {v for v, lb in labels.items() if lb == c}
        want = nx.conductance(g, s)
        assert got[c]["conductance"] == pytest.approx(want, abs=1e-12), c
        assert got[c]["cut_edges"] == nx.cut_size(g, s)
        assert got[c]["volume"] == nx.volume(g, s)


def test_conductance_whole_graph_community_is_zero(spark):
    from cminer_spark.operators.stats import conductance

    e = edges_df(spark, [(0, 1), (1, 2)])
    labels = spark.createDataFrame(
        [(0, 9), (1, 9), (2, 9)], "v_id long, community long"
    )
    rows = conductance(e, labels).collect()
    assert len(rows) == 1
    assert rows[0]["cut_edges"] == 0 and rows[0]["conductance"] == 0.0


def test_conductance_missing_labels_default_to_singletons(spark):
    from cminer_spark.operators.stats import conductance

    e = edges_df(spark, [(0, 1)])
    labels = spark.createDataFrame([(0, 5)], "v_id long, community long")
    rows = {r["community"]: r for r in conductance(e, labels).collect()}
    # vertex 1 falls back to community id 1
    assert set(rows) == {5, 1}
    for c in (5, 1):
        assert rows[c]["cut_edges"] == 1 and rows[c]["volume"] == 1
        assert rows[c]["conductance"] == 1.0
