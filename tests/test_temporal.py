"""Unit tests for the temporal/event operators (sessionize, as-of
join, funnel) on small deterministic fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cminer_spark.operators.temporal import asof_join, funnel, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _events(spark, rows):
    """rows: (event_id, user_id, seconds, event_type, value)."""
    data = [
        (int(e), int(u), _ts(s), str(t), float(v)) for e, u, s, t, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )


def test_sessionize_gap_splits_and_zero_base(spark):
    ev = _events(
        spark,
        [
            (1, 1, 0, "a", 0),
            (2, 1, 100, "a", 0),
            (3, 1, 2000, "a", 0),  # > 1800s gap → new session
            (4, 1, 2100, "a", 0),
            (5, 2, 0, "a", 0),
        ],
    )
    out = {
        (r.event_id, r.session_idx)
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert out == {(1, 0), (2, 0), (3, 1), (4, 1), (5, 0)}


def test_sessionize_tie_break_deterministic(spark):
    # Two events at the identical timestamp: ordering must follow
    # event_id, and the equal-ts pair never splits a session.
    ev = _events(
        spark,
        [(2, 1, 0, "a", 0), (1, 1, 0, "a", 0), (3, 1, 5000, "a", 0)],
    )
    out = {
        (r.event_id, r.session_idx)
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert out == {(1, 0), (2, 0), (3, 1)}


def test_asof_backward_pick_and_nulls(spark):
    left = _events(spark, [(10, 1, 100, "p", 1.0), (11, 1, 5, "p", 2.0)])
    right = _events(
        spark,
        [
            (20, 1, 50, "v", 5.0),
            (21, 1, 90, "v", 6.0),  # most recent <= 100
            (22, 1, 200, "v", 7.0),  # after both lefts
        ],
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        right_cols=["event_id", "value"],
    )
    got = {r.event_id: (r.asof_event_id, r.asof_value) for r in out.collect()}
    assert got[10] == (21, 6.0)
    assert got[11] == (None, None)  # no right row at or before t=5


def test_asof_inclusive_and_tie_break(spark):
    # Equal timestamps: right sorts before left (inclusive), and ties
    # on right.ts resolve to the largest tie column.
    left = _events(spark, [(10, 1, 50, "p", 1.0)])
    right = _events(
        spark, [(20, 1, 50, "v", 5.0), (21, 1, 50, "v", 6.0)]
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        right_cols=["event_id", "value"],
        right_tie=("event_id",),
    )
    r = out.collect()[0]
    assert (r.asof_event_id, r.asof_value) == (21, 6.0)


def test_asof_tolerance_nulls_stale_match(spark):
    left = _events(spark, [(10, 1, 1000, "p", 1.0)])
    right = _events(spark, [(20, 1, 10, "v", 5.0)])
    out = asof_join(
        left,
        right,
        key="user_id",
        ts="ts",
        right_cols=["event_id"],
        tolerance_seconds=60,
    )
    r = out.collect()[0]
    assert r.asof_event_id is None and r.asof_ts is None


def test_asof_carries_legit_null_payload(spark):
    # A matched right row with a NULL payload column must yield NULL,
    # not skip back to an older non-null row (struct-last semantics).
    left = _events(spark, [(10, 1, 100, "p", 1.0)])
    right = _events(
        spark, [(20, 1, 50, "v", 5.0), (21, 1, 90, "v", 6.0)]
    ).withColumn(
        "value", F.when(F.col("event_id") == 21, F.lit(None)).otherwise(F.col("value"))
    )
    out = asof_join(
        left, right, key="user_id", ts="ts", right_cols=["event_id", "value"]
    )
    r = out.collect()[0]
    assert r.asof_event_id == 20 + 1
    assert r.asof_value is None


def test_funnel_ordered_steps(spark):
    # user 1 completes a→b→c in order; user 2 does b before a (b must
    # not count); user 3 stops after a.
    ev = _events(
        spark,
        [
            (1, 1, 0, "a", 0),
            (2, 1, 10, "b", 0),
            (3, 1, 20, "c", 0),
            (4, 2, 10, "b", 0),
            (5, 2, 20, "a", 0),
            (6, 3, 0, "a", 0),
        ],
    )
    out = {
        (r.step, r.step_idx): r.users
        for r in funnel(ev, steps=["a", "b", "c"]).collect()
    }
    assert out == {("a", 0): 3, ("b", 1): 1, ("c", 2): 1}


def test_funnel_strictly_after(spark):
    # Same-timestamp step does NOT count (strict >).
    ev = _events(spark, [(1, 1, 0, "a", 0), (2, 1, 0, "b", 0)])
    out = {r.step: r.users for r in funnel(ev, steps=["a", "b"]).collect()}
    assert out == {"a": 1, "b": 0}
