"""Mirror of the driver's correctness gate: every queries() entry vs
its DuckDB oracle at sf0.001 (the full sf0.01 check runs via
tools/check_gate.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    return f"{v:.9g}" if isinstance(v, float) else str(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _kinds(pdf):
    """{col: pandas dtype.kind}. The driver's value hasher is
    type-sensitive through the pandas conversion (round-3's
    validate_transcripts red: DuckDB HUGEINT sum vs Spark BIGINT —
    identical values, mismatched hash), so kinds must agree too."""
    return {c.lower(): pdf[c].dtype.kind for c in pdf.columns}


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_gate_query_matches_oracle(spark, duck, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR).persist()
    # Structural guard: the driver canonicalizer sorts through pandas,
    # which cannot hash list/dict cells (round-4 quantize_int8 /
    # random_projection reds). No gate may emit a complex-typed column.
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"gate {name!r} emits complex-typed columns {complex_cols}; "
        "flatten (posexplode) before returning — the driver cannot "
        "canonicalize array/map/struct cells"
    )
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        sdf.unpersist()
        assert len(s_rows) >= 0  # rows-only check
        return
    cur = duck.execute(oracles[name])
    d_cols = [d[0].lower() for d in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _multiset(s_cols, s_rows) == _multiset(d_cols, d_rows)
    if s_rows:
        s_kinds = _kinds(sdf.toPandas())
        d_kinds = _kinds(duck.execute(oracles[name]).df())
        mismatched = {
            c: (s_kinds.get(c), d_kinds.get(c))
            for c in s_kinds
            if s_kinds.get(c) != d_kinds.get(c)
        }
        assert not mismatched, f"pandas dtype-kind mismatch: {mismatched}"
    sdf.unpersist()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"v_id", "rank"}
