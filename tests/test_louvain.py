"""Louvain community detection: planted partitions recovered,
modularity beats/matches LPA, determinism across partitionings,
degenerate inputs."""

from __future__ import annotations

import random

from cminer_spark.operators import label_propagation, modularity
from cminer_spark.operators.louvain import louvain
from tests.conftest import edges_df


def _ring_of_cliques(n_cliques=4, size=5):
    pairs = []
    for c in range(n_cliques):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                pairs.append((base + i, base + j))
        # one bridge to the next clique
        pairs.append((base, ((c + 1) % n_cliques) * size))
    return pairs


def test_ring_of_cliques_recovered(spark):
    pairs = _ring_of_cliques()
    labels, info = louvain(edges_df(spark, pairs))
    got = {r.v_id: r.community for r in labels.collect()}
    # each clique one community
    for c in range(4):
        members = {got[c * 5 + i] for i in range(5)}
        assert len(members) == 1, (c, members)
    assert info.n_communities == 4
    assert info.modularity > 0.5


def test_beats_or_matches_lpa(spark):
    rng = random.Random(3)
    pairs = _ring_of_cliques(5, 6)
    # noise edges
    pairs += [
        (rng.randrange(30), rng.randrange(30)) for _ in range(8)
    ]
    pairs = [p for p in pairs if p[0] != p[1]]
    e = edges_df(spark, pairs)
    lv, info = louvain(e)
    lpa_labels, _ = label_propagation(e, max_rounds=6)
    q_lpa = float(
        modularity(
            e,
            lpa_labels.select("v_id", lpa_labels["label"].alias("community")),
        ).collect()[0]["q"]
    )
    assert info.modularity >= q_lpa - 1e-9


def test_deterministic_across_partitioning(spark):
    pairs = _ring_of_cliques(3, 4)
    a = sorted(
        map(tuple, louvain(edges_df(spark, pairs).repartition(7))[0].collect())
    )
    b = sorted(
        map(tuple, louvain(edges_df(spark, pairs).repartition(2))[0].collect())
    )
    assert a == b


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    labels, info = louvain(empty)
    assert labels.count() == 0 and info.levels == 0
    # single self-loop vertex: one community
    loop = spark.createDataFrame([(3, 3)], "src long, dst long")
    labels, info = louvain(loop)
    got = {(r.v_id, r.community) for r in labels.collect()}
    assert got == {(3, 3)}


def test_singleton_swap_guard_weighted_path(spark):
    """Two same-hash-color adjacent singletons must not swap
    communities and oscillate: on the weighted path
    1-2(100), 2-3(1), 3-4(100) the optimum is {1,2} | {3,4}
    (Q = 400/402 - 2*201^2/402^2 ~= 0.495), and without the
    Grappolo singleton-swap guard vertices 3 and 4 end up in
    swapped singleton communities."""
    edges = spark.createDataFrame(
        [(1, 2, 100.0), (2, 3, 1.0), (3, 4, 100.0)],
        "src long, dst long, weight double",
    )
    labels, info = louvain(edges)
    got = {(r[0], r[1]) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 3), (4, 3)}
    assert abs(info.modularity - (400 / 402 - 2 * 201**2 / 402**2)) < 1e-9


def test_reported_modularity_is_weighted_objective(spark):
    """info.modularity must score the weighted multigraph objective
    the sweeps optimize, not the unweighted simple projection."""
    edges = spark.createDataFrame(
        [(1, 2, 100.0), (2, 3, 1.0), (3, 4, 100.0)],
        "src long, dst long, weight double",
    )
    _, info = louvain(edges)
    # unweighted projection of the same partition scores 1/3 - ... --
    # distinctly different from the weighted 0.495
    assert info.modularity > 0.49
