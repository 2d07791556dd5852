"""Transcript input-contract validation: each violation class on
handmade fixtures, a clean synthetic pass, and oracle parity on the
corrupted gate frame."""

from __future__ import annotations

import duckdb

from cminer_spark.sources import validate_transcripts
from cminer_spark.synth import transcripts as synthmod

SCHEMA = "conv_id string, turn_idx int, role string, ts timestamp"


def _row(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return validate_transcripts(df).collect()[0]


def _ts(s):
    import datetime

    return datetime.datetime(2026, 1, 1, 0, 0, int(s))


def test_synth_input_contract(spark):
    # synth transcripts honor the FULL input contract, including
    # strictly monotone ts per conversation (the validator caught the
    # old turn_idx * varying-gap formula regressing ~26% of pairs)
    t = synthmod.synth_transcripts(spark, n_convs=50, seed=2)
    r = validate_transcripts(t).collect()[0]
    assert r.n_rows == t.count() and r.n_convs == 50
    assert (
        r.n_null_conv_id, r.n_null_turn_idx, r.n_dup_turns,
        r.n_gap_convs, r.n_ts_regressions, r.n_bad_role,
    ) == (0, 0, 0, 0, 0, 0)


def test_handmade_clean_all_zeros(spark):
    rows = [
        ("a", 0, "user", _ts(0)),
        ("a", 1, "assistant", _ts(1)),
        ("b", 0, "system", _ts(4)),
    ]
    r = _row(spark, rows)
    assert tuple(r)[2:] == (0, 0, 0, 0, 0, 0)


def test_each_violation_class(spark):
    rows = [
        ("a", 0, "user", _ts(0)),
        ("a", 1, "assistant", _ts(1)),
        ("a", 1, "user", _ts(2)),        # dup turn_idx
        ("b", 1, "user", _ts(0)),        # gap: starts at 1
        ("c", 0, "user", _ts(5)),
        ("c", 1, "robot", _ts(3)),       # bad role + ts regression
        (None, 0, "user", _ts(0)),       # null conv_id
        ("d", None, "user", _ts(0)),     # null turn_idx
    ]
    r = _row(spark, rows)
    assert r.n_rows == 8
    # d's only row has a null turn_idx, so it is excluded from the
    # per-conversation stats (reported via n_null_turn_idx instead)
    assert r.n_convs == 3
    assert r.n_null_conv_id == 1
    assert r.n_null_turn_idx == 1
    assert r.n_dup_turns == 1
    assert r.n_gap_convs == 1  # b only ('a' stays dense 0..1)
    assert r.n_ts_regressions == 1
    assert r.n_bad_role == 1


def test_duplicate_full_tie_not_a_regression(spark):
    rows = [
        ("a", 0, "user", _ts(1)),
        ("a", 0, "user", _ts(1)),  # full (turn, ts) tie: dup but no regr
    ]
    r = _row(spark, rows)
    assert r.n_dup_turns == 1 and r.n_ts_regressions == 0
    assert r.n_gap_convs == 0


def test_gate_parity_vs_duckdb(spark):
    import __spark_entry__ as E
    from cminer_spark import gate

    sf_dir = "/root/testdata/sf0.001"
    got = [tuple(r) for r in E.queries()["validate_transcripts"](spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = [tuple(int(x) for x in r) for r in con.execute(gate.validate_oracle_sql()).fetchall()]
    assert got == want
    # the corruption actually produced non-zero counters
    assert any(v > 0 for v in got[0][2:])
