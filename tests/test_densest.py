"""Densest subgraph peeling: planted-core recovery, approximation
bound on known graphs, density accounting, degenerate inputs."""

from __future__ import annotations

from cminer_spark.operators import densest_subgraph
from tests.conftest import edges_df


def _planted(k=8, tail=30):
    """A K_k clique (density (k-1)/2) with a long path attached."""
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    pairs += [(100 + i, 100 + i + 1) for i in range(tail)]
    pairs.append((0, 100))  # attach the path to the clique
    return pairs


def test_planted_clique_recovered(spark):
    k = 8
    best, info = densest_subgraph(edges_df(spark, _planted(k)), eps=0.1)
    got = {r.v_id for r in best.collect()}
    assert got == set(range(k))
    # exact densest here IS the clique: density (k-1)/2
    assert abs(info.best_density - (k - 1) / 2) < 1e-9


def test_two_approx_bound(spark):
    # on any graph the peel's best density >= OPT / (2(1+eps));
    # for the planted instance OPT = (k-1)/2
    k = 10
    best, info = densest_subgraph(edges_df(spark, _planted(k)), eps=0.5)
    opt = (k - 1) / 2
    assert info.best_density >= opt / (2 * 1.5) - 1e-9
    sub = {r.v_id for r in best.collect()}
    assert set(range(k)) <= sub  # the clique survives peeling


def test_density_trace_and_rounds(spark):
    _best, info = densest_subgraph(
        edges_df(spark, _planted()), eps=0.1, max_rounds=10
    )
    assert info.densities[0] > 0
    assert info.best_density == max(info.densities)
    assert info.best_round == info.densities.index(info.best_density)


def test_single_edge_graph(spark):
    best, info = densest_subgraph(edges_df(spark, [(1, 2)]), eps=0.1)
    assert {r.v_id for r in best.collect()} == {1, 2}
    assert abs(info.best_density - 0.5) < 1e-9


def test_self_loops_and_parallel_collapse(spark):
    pairs = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3)]
    best, info = densest_subgraph(edges_df(spark, pairs), eps=0.1)
    # simple projection: edges {1-2, 2-3}, density 2/3 at round 0
    assert abs(info.densities[0] - 2 / 3) < 1e-9
    assert {r.v_id for r in best.collect()} == {1, 2, 3}


def test_isolated_hub_leaves_with_its_edges(spark):
    """K_{1,5} star + K_4: round 0 peels the star leaves, which
    isolates the (unpeeled) hub — the hub must NOT appear in the best
    round's set, which is the surviving K_4."""
    star = [(0, i) for i in range(1, 6)]
    k4 = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    best, info = densest_subgraph(edges_df(spark, star + k4), eps=0.1)
    assert info.best_round >= 1
    assert abs(info.best_density - 1.5) < 1e-9  # K4: 6 edges / 4 verts
    assert {r.v_id for r in best.collect()} == {10, 11, 12, 13}
