"""Tests for feature propagation, dyad census, and top-k edge capping
(operators/propagation.py, stats.dyad_census, sparsify.topk_out_edges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cminer_spark.operators import (
    dyad_census,
    propagate_features,
    topk_out_edges,
)
from tests.conftest import edges_df


def _feats(spark, vals):
    return spark.createDataFrame(
        [(int(v), [float(x) for x in emb]) for v, emb in vals.items()],
        "v_id long, emb array<double>",
    )


# ----------------------------------------------------------------------
# propagate_features
# ----------------------------------------------------------------------


def test_propagation_hand_computed_path(spark):
    # path 1-2-3, x0 = [v]; alpha=0.5, 1 round:
    #   x1(1) = .5*1 + .5*2   = 1.5
    #   x1(2) = .5*2 + .5*2   = 2.0   (mean(1,3)=2)
    #   x1(3) = .5*3 + .5*2   = 2.5
    e = edges_df(spark, [(1, 2), (2, 3)])
    f0 = _feats(spark, {1: [1], 2: [2], 3: [3]})
    out = propagate_features(e, f0, rounds=1, alpha=0.5)
    got = {r.v_id: r.val for r in out.collect()}
    assert got == {1: 1.5, 2: 2.0, 3: 2.5}


def test_propagation_zero_rounds_identity_and_isolated_fixpoint(spark):
    e = edges_df(spark, [(1, 2)])
    f0 = _feats(spark, {1: [1, 10], 2: [3, 30], 99: [7, 70]})
    out0 = propagate_features(e, f0, rounds=0)
    assert {(r.v_id, r.pos, r.val) for r in out0.collect()} == {
        (1, 0, 1.0), (1, 1, 10.0), (2, 0, 3.0), (2, 1, 30.0),
        (99, 0, 7.0), (99, 1, 70.0),
    }
    # vertex 99 has no edges: damped update is the identity forever
    out2 = propagate_features(e, f0, rounds=2)
    got99 = {
        (r.pos, r.val) for r in out2.where(F.col("v_id") == 99).collect()
    }
    assert got99 == {(0, 7.0), (1, 70.0)}


def test_propagation_constant_features_are_fixpoint(spark):
    # constant vector is a fixpoint of neighbor averaging at any alpha
    e = edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 3)])
    f0 = _feats(spark, {1: [5, 2], 2: [5, 2], 3: [5, 2]})
    out = propagate_features(e, f0, rounds=3, alpha=0.3)
    assert {r.val for r in out.collect()} == {5.0, 2.0}


def test_propagation_as_array_round_trip(spark):
    e = edges_df(spark, [(1, 2)])
    f0 = _feats(spark, {1: [1, 10], 2: [3, 30]})
    out = propagate_features(e, f0, rounds=1, alpha=0.0, as_array=True)
    got = {r.v_id: r.emb for r in out.collect()}
    assert got == {1: [3.0, 30.0], 2: [1.0, 10.0]}


def test_propagation_validates_args(spark):
    e = edges_df(spark, [(1, 2)])
    f0 = _feats(spark, {1: [1], 2: [2]})
    with pytest.raises(ValueError):
        propagate_features(e, f0, rounds=-1)
    with pytest.raises(ValueError):
        propagate_features(e, f0, alpha=1.5)


def test_propagation_plan_has_no_collect_list_in_loop(spark):
    # the exploded-state loop must stay scalar: no collect_list /
    # window in the per-round plan (only the final as_array reassembly
    # may collect)
    e = edges_df(spark, [(1, 2), (2, 3)])
    f0 = _feats(spark, {1: [1], 2: [2], 3: [3]})
    out = propagate_features(e, f0, rounds=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "Window" not in plan


# ----------------------------------------------------------------------
# dyad_census
# ----------------------------------------------------------------------


def test_dyad_census_hand_computed(spark):
    # 1->2, 2->1 (mutual), 1->3 (asym), 3->3 (self loop, ignored),
    # 1->2 duplicate row (collapses)
    e = edges_df(spark, [(1, 2), (2, 1), (1, 3), (3, 3), (1, 2)])
    row = dyad_census(e).collect()[0]
    assert (row.mutual, row.asym, row.edges) == (1, 1, 3)
    assert row.reciprocity == pytest.approx(2 / 3, abs=1e-6)


def test_dyad_census_pure_dag_zero_reciprocity(spark):
    e = edges_df(spark, [(1, 2), (2, 3), (1, 3)])
    row = dyad_census(e).collect()[0]
    assert (row.mutual, row.asym, row.reciprocity) == (0, 3, 0.0)


def test_dyad_census_fully_mutual(spark):
    e = edges_df(spark, [(1, 2), (2, 1), (3, 1), (1, 3)])
    row = dyad_census(e).collect()[0]
    assert (row.mutual, row.asym, row.edges, row.reciprocity) == (
        2, 0, 4, 1.0,
    )


# ----------------------------------------------------------------------
# topk_out_edges
# ----------------------------------------------------------------------


def test_topk_keeps_heaviest_with_deterministic_ties(spark):
    e = edges_df(
        spark,
        [(1, 10, 5.0), (1, 11, 7.0), (1, 12, 7.0), (1, 13, 1.0), (2, 10, 2.0)],
    )
    out = topk_out_edges(e, k=2)
    got = {(r.src, r.dst, r.w, r.rk) for r in out.collect()}
    # ties at w=7 break by dst asc: 11 before 12; 13 dropped
    assert got == {(1, 11, 7.0, 1), (1, 12, 7.0, 2), (2, 10, 2.0, 1)}


def test_topk_collapses_parallel_edges_before_ranking(spark):
    # 3 parallel (1,10) edges sum to 6.0, beating the single 5.0 edge
    e = edges_df(
        spark, [(1, 10, 2.0), (1, 10, 2.0), (1, 10, 2.0), (1, 11, 5.0)]
    )
    out = topk_out_edges(e, k=1)
    got = [(r.src, r.dst, r.w, r.rk) for r in out.collect()]
    assert got == [(1, 10, 6.0, 1)]


def test_topk_without_weight_column_counts_multiplicity(spark):
    e = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11)], "src long, dst long"
    )
    out = topk_out_edges(e, k=1, weight_col=None)
    got = [(r.src, r.dst, r.w, r.rk) for r in out.collect()]
    assert got == [(1, 10, 2.0, 1)]


def test_topk_validates_k(spark):
    e = edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        topk_out_edges(e, k=0)
