"""LPA determinism/parity + triangle exactness vs networkx."""

from __future__ import annotations

import random

import networkx as nx

from cminer_spark.operators import label_propagation, triangle_counts

from tests.conftest import edges_df
from tests.oracles import lpa_oracle


def test_lpa_matches_handwritten_oracle(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(80)]
    pairs = [p for p in pairs if p[0] != p[1]]
    df = edges_df(spark, pairs)
    for rounds in (1, 3):
        labels, _ = label_propagation(df, max_rounds=rounds, stop_when_stable=False)
        got = {r.v_id: r.label for r in labels.collect()}
        want = lpa_oracle(pairs, rounds=rounds)
        assert got == want


def test_lpa_deterministic_across_partitioning(spark):
    rng = random.Random(29)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    pairs = [p for p in pairs if p[0] != p[1]]
    df1 = edges_df(spark, pairs).repartition(2)
    df2 = edges_df(spark, pairs).repartition(7)
    l1, _ = label_propagation(df1, max_rounds=4, stop_when_stable=False)
    l2, _ = label_propagation(df2, max_rounds=4, stop_when_stable=False)
    assert {(r.v_id, r.label) for r in l1.collect()} == {
        (r.v_id, r.label) for r in l2.collect()
    }


def test_lpa_two_cliques(spark):
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    labels, info = label_propagation(edges_df(spark, k1 + k2), max_rounds=10)
    got = {r.v_id: r.label for r in labels.collect()}
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(10, 15)}) == 1
    assert got[0] != got[10]
    assert info.converged


def _nx_triangles(pairs):
    g = nx.Graph()
    g.add_edges_from((s, d) for s, d in pairs if s != d)
    per = nx.triangles(g)
    return per, sum(per.values()) // 3


def test_triangles_two_cliques_closed_form(spark):
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    per_v, total = triangle_counts(edges_df(spark, k1 + k2 + [(4, 10)]))
    got = {r.v_id: r.triangles for r in per_v.collect()}
    # inside K5 every vertex closes C(4,2)=6 triangles
    assert all(got[v] == 6 for v in range(5))
    assert total == 20


def test_triangles_random_parity(spark):
    rng = random.Random(31)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(240)]
    # include parallel + self edges to prove simple-projection handling
    pairs += [(1, 1), (2, 3), (2, 3)]
    per_v, total = triangle_counts(edges_df(spark, pairs))
    want_per, want_total = _nx_triangles(pairs)
    got = {r.v_id: r.triangles for r in per_v.collect()}
    assert total == want_total
    assert got == dict(want_per)


def test_triangles_cycle_has_none(spark):
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    _, total = triangle_counts(edges_df(spark, pairs))
    assert total == 0


def _tri_map(df):
    return {r.v_id: r.triangles for r in df.collect()}


def test_incremental_triangles_equals_full(spark):
    from cminer_spark.operators.triangles import incremental_triangles

    rng = random.Random(11)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(140)})
    pairs = [p for p in pairs if p[0] != p[1]]
    base, delta = pairs[: len(pairs) * 3 // 4], pairs[len(pairs) * 3 // 4 :]
    # plant a fully-new triangle (3 new edges, corners partly new) and
    # a duplicate of an existing edge (must contribute nothing)
    delta += [(100, 101), (101, 102), (100, 102)] + base[:1]
    prev_pv, prev_total = triangle_counts(edges_df(spark, base))
    got_pv, got_total = incremental_triangles(
        prev_pv, prev_total, edges_df(spark, base), edges_df(spark, delta)
    )
    want_pv, want_total = triangle_counts(edges_df(spark, base + delta))
    assert got_total == want_total
    assert _tri_map(got_pv) == _tri_map(want_pv)


def test_incremental_triangles_empty_delta(spark):
    from cminer_spark.operators.triangles import incremental_triangles

    base = [(0, 1), (1, 2), (0, 2), (2, 3)]
    prev_pv, prev_total = triangle_counts(edges_df(spark, base))
    empty = spark.createDataFrame([], "src long, dst long")
    got_pv, got_total = incremental_triangles(
        prev_pv, prev_total, edges_df(spark, base), empty
    )
    assert got_total == prev_total == 1
    assert _tri_map(got_pv) == _tri_map(prev_pv)


def test_incremental_triangles_hub_delta(spark):
    from cminer_spark.operators.triangles import incremental_triangles

    # delta edge touches a hub: wedges must expand from the light side
    # and the count must still be exact
    base = [(0, i) for i in range(2, 40)] + [(2, 3), (4, 5)]
    delta = [(1, 0), (1, 2), (1, 3)]  # 1-0 hub edge; triangle 1-2-3? no: needs 2-3 and 1-2,1-3 -> yes
    prev_pv, prev_total = triangle_counts(edges_df(spark, base))
    got_pv, got_total = incremental_triangles(
        prev_pv, prev_total, edges_df(spark, base), edges_df(spark, delta)
    )
    want_pv, want_total = triangle_counts(edges_df(spark, base + delta))
    assert got_total == want_total
    assert _tri_map(got_pv) == _tri_map(want_pv)


def test_lpa_warm_start_equals_contiguous_run(spark):
    """Resuming from round-k labels via initial_labels for j more
    rounds must equal one contiguous (k+j)-round run (the
    --prev-labels ingest contract; gate lpa_warm_resume)."""
    rng = random.Random(31)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(120)]
    pairs = [p for p in pairs if p[0] != p[1]]
    df = edges_df(spark, pairs)
    base, _ = label_propagation(df, max_rounds=3, stop_when_stable=False)
    warm, _ = label_propagation(
        df, max_rounds=2, initial_labels=base, stop_when_stable=False
    )
    full, _ = label_propagation(df, max_rounds=5, stop_when_stable=False)
    assert {(r.v_id, r.label) for r in warm.collect()} == {
        (r.v_id, r.label) for r in full.collect()
    }


def test_lpa_warm_start_at_fixpoint_converges_in_one_round(spark):
    """Warm-starting from converged labels is idempotent: the next
    deterministic-tie round changes nothing and stop_when_stable exits
    after exactly one round."""
    # two 4-cliques joined by one bridge edge — converges quickly
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a + 10, b + 10) for a in range(4) for b in range(a + 1, 4)]
    pairs = c1 + c2 + [(0, 10)]
    df = edges_df(spark, pairs)
    conv, info = label_propagation(df, max_rounds=20)
    assert info.converged
    warm, winfo = label_propagation(df, max_rounds=20, initial_labels=conv)
    assert winfo.converged and winfo.rounds == 1
    assert {(r.v_id, r.label) for r in warm.collect()} == {
        (r.v_id, r.label) for r in conv.collect()
    }
