"""ANF / neighborhood function: exact path vs networkx, FM-sketch
scale path vs exact within tolerance, effective diameter, determinism,
and the oracle gate."""

import random

import networkx as nx
import pytest

from cminer_spark.operators.anf import (
    anf_sketch,
    effective_diameter,
    neighborhood_function_exact,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def nx_nf(g, max_h):
    """Exact ordered-pair neighborhood function from networkx."""
    out = {}
    for h in range(1, max_h + 1):
        n = 0
        for v in g.nodes:
            n += sum(
                1
                for u, d in nx.single_source_shortest_path_length(
                    g, v, cutoff=h
                ).items()
                if u != v
            )
        out[h] = n
    return out


@pytest.fixture(scope="module")
def rnd_graph():
    rng = random.Random(7)
    pairs = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(70)})
    return [p for p in pairs if p[0] != p[1]]


def test_exact_vs_networkx_undirected(spark, rnd_graph):
    g = nx.Graph(rnd_graph)
    want = nx_nf(g, 4)
    got = {
        r.h: r.n_pairs
        for r in neighborhood_function_exact(
            edges_df(spark, rnd_graph), max_h=4
        ).collect()
    }
    assert got == want


def test_exact_directed_chain(spark):
    # 0->1->2->3: N(1)=3 (ordered, along direction), N(2)=5, N(3)=6
    e = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r.h: r.n_pairs
        for r in neighborhood_function_exact(e, 3, directed=True).collect()
    }
    assert got == {1: 3, 2: 5, 3: 6}


def test_sketch_tracks_exact_within_tolerance(spark, rnd_graph):
    exact = nx_nf(nx.Graph(rnd_graph), 4)
    est = {
        r.h: r.n_pairs_est
        for r in anf_sketch(
            edges_df(spark, rnd_graph), max_h=4, k=64, seed=3
        ).collect()
    }
    for h, n in exact.items():
        assert est[h] == pytest.approx(n, rel=0.35), (h, n, est)
    # monotone non-decreasing in h
    vals = [est[h] for h in sorted(est)]
    assert vals == sorted(vals)


def test_sketch_deterministic(spark, rnd_graph):
    e = edges_df(spark, rnd_graph)
    a = sorted(map(tuple, anf_sketch(e, 3, k=16, seed=9).collect()))
    b = sorted(map(tuple, anf_sketch(e, 3, k=16, seed=9).collect()))
    assert a == b


def test_sketch_converges_and_stops_early(spark):
    # star graph: everything within 2 hops — the sketch must stop well
    # before max_h once N stops growing
    e = edges_df(spark, [(0, i) for i in range(1, 12)])
    rows = anf_sketch(e, max_h=30, k=32, seed=1).collect()
    assert len(rows) <= 4  # 2 hops to saturate + 1 confirm round


def test_effective_diameter_path_graph(spark):
    # path of 12: 90% of pairs are within ~8 hops; the interpolated
    # estimate should land near the exact effective diameter
    n = 12
    e = edges_df(spark, [(i, i + 1) for i in range(n - 1)])
    exact = nx_nf(nx.Graph([(i, i + 1) for i in range(n - 1)]), n)
    total = exact[n - 1]
    want = next(h for h in sorted(exact) if exact[h] >= 0.9 * total)
    got = effective_diameter(e, q=0.9, k=64, seed=5, max_h=20)
    assert abs(got - want) <= 2.5


def test_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert neighborhood_function_exact(e, 2).count() in (0, 2)
    assert anf_sketch(e, 2).count() == 0


def test_gate_parity_vs_duckdb(spark):
    import duckdb

    import __spark_entry__ as E
    from cminer_spark import gate

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.h, r.n_pairs)
        for r in E.queries()["anf_exact_h2"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        (int(h), int(n))
        for h, n in con.execute(gate.anf_exact_oracle_sql()).fetchall()
    )
    assert got == want
