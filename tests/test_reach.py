"""Time-respecting reachability: strictness, earliest-arrival choice,
hop labeling, and the greedy-min frontier property."""

from __future__ import annotations

import pytest

from cminer_spark.operators.temporal import temporal_reachability


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, ts_us long")


def _out(df):
    return {(r.source, r.node): (r.arrive_ts, r.hops) for r in df.collect()}


def test_strict_blocks_non_increasing(spark):
    # 0 -(t=5)-> 1 -(t=5)-> 2 : second hop needs ts > 5
    e = _edges(spark, [(0, 1, 5), (1, 2, 5)])
    out = _out(temporal_reachability(e, [0], max_hops=2))
    assert out == {(0, 1): (5, 1)}
    out2 = _out(temporal_reachability(e, [0], max_hops=2, strict=False))
    assert out2 == {(0, 1): (5, 1), (0, 2): (5, 2)}


def test_earliest_arrival_wins(spark):
    # two routes to 2: via 1 arriving t=10, direct at t=20
    e = _edges(spark, [(0, 1, 5), (1, 2, 10), (0, 2, 20)])
    out = _out(temporal_reachability(e, [0], max_hops=2))
    assert out[(0, 2)] == (10, 2)


def test_min_hops_breaks_arrival_ties(spark):
    # arrive at 2 at t=10 both directly and via 1 -> hops=1 reported
    e = _edges(spark, [(0, 2, 10), (0, 1, 5), (1, 2, 10)])
    out = _out(temporal_reachability(e, [0], max_hops=2))
    assert out[(0, 2)] == (10, 1)


def test_greedy_min_frontier_is_lossless(spark):
    # late route to 1 (t=50) would block 1->2 (t=30); early route
    # (t=10) keeps it open — min-arrival frontier must find t=30
    e = _edges(spark, [(0, 1, 50), (0, 1, 10), (1, 2, 30)])
    out = _out(temporal_reachability(e, [0], max_hops=2))
    assert out[(0, 1)] == (10, 1)
    assert out[(0, 2)] == (30, 2)


def test_start_ts_filters_old_edges(spark):
    e = _edges(spark, [(0, 1, 5), (0, 2, 15)])
    out = _out(temporal_reachability(e, [0], max_hops=1, start_ts=10))
    assert out == {(0, 2): (15, 1)}


def test_multiple_sources_independent(spark):
    e = _edges(spark, [(0, 1, 5), (7, 1, 9)])
    out = _out(temporal_reachability(e, [0, 7], max_hops=1))
    assert out == {(0, 1): (5, 1), (7, 1): (9, 1)}


def test_max_hops_validation(spark):
    with pytest.raises(ValueError):
        temporal_reachability(_edges(spark, [(0, 1, 5)]), [0], max_hops=0)
