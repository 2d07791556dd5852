"""Tests for cohort retention grids."""

from __future__ import annotations

from datetime import datetime

from cminer_spark.operators.temporal import retention_cohorts

P = 100  # period_seconds for tests


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.utcfromtimestamp(ts), u, "e", 0.0) for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_retention_grid(spark):
    # periods of 100s: u1 active p0,p1,p2; u2 active p0,p2; u3 active p1
    rows = [
        (1, 10), (1, 150), (1, 250),
        (2, 20), (2, 260), (2, 280),  # two events in p2: counted once
        (3, 110),
    ]
    out = {
        (r["cohort"], r["period_offset"]): r
        for r in retention_cohorts(_events(spark, rows), period_seconds=P).collect()
    }
    # cohort 0 = {u1, u2}; cohort 1 = {u3}
    assert out[(0, 0)]["n_cohort"] == 2 and out[(0, 0)]["n_active"] == 2
    assert out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(0, 2)]["n_active"] == 2 and out[(0, 2)]["retention"] == 1.0
    assert out[(1, 0)]["n_cohort"] == 1 and out[(1, 0)]["retention"] == 1.0
    assert set(out) == {(0, 0), (0, 1), (0, 2), (1, 0)}


def test_offset_zero_always_full(spark):
    rows = [(u, u * 7) for u in range(1, 30)] + [(u, u * 7 + 500) for u in range(1, 30, 3)]
    grid = retention_cohorts(_events(spark, rows), period_seconds=P).collect()
    for r in grid:
        if r["period_offset"] == 0:
            assert r["retention"] == 1.0
        assert 0 < r["retention"] <= 1.0
        assert r["n_active"] <= r["n_cohort"]
