"""Tests for graph snapshot diffing."""

from __future__ import annotations

from cminer_spark.operators.stats import graph_diff


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_graph_diff_added_removed(spark):
    old = _e(spark, [(1, 2), (2, 3), (3, 1)])
    new = _e(spark, [(1, 2), (2, 3), (4, 1)])  # -(3,1), +(4,1)
    out = {r["v_id"]: r for r in graph_diff(old, new).collect()}
    assert set(out) == {3, 4, 1}
    assert out[4]["added_out"] == 1 and out[4]["degree_delta"] == 1
    assert out[3]["removed_out"] == 1 and out[3]["degree_delta"] == -1
    # vertex 1: lost in-edge from 3, gained in-edge from 4 -> net 0
    assert out[1]["added_in"] == 1 and out[1]["removed_in"] == 1
    assert out[1]["degree_delta"] == 0
    # vertex 2 unchanged: absent
    assert 2 not in out


def test_graph_diff_identical_snapshots_empty(spark):
    e = _e(spark, [(1, 2), (2, 3)])
    assert graph_diff(e, e).count() == 0


def test_graph_diff_multiplicity_invisible(spark):
    # duplicate parallel edges collapse: multiplicity change is not a diff
    old = _e(spark, [(1, 2)])
    new = _e(spark, [(1, 2), (1, 2), (1, 2)])
    assert graph_diff(old, new).count() == 0
