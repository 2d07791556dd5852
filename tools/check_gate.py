"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB at the given sf dir, compares row count,
column names, order-insensitive values (rounded string form), AND
pandas dtype KINDS per column.

The dtype-kind pass exists because the driver's value hasher is
type-sensitive through the pandas conversion: round-3's
``validate_transcripts`` red was a DuckDB HUGEINT ``sum()`` that
converts to a different pandas dtype than Spark's BIGINT — values
identical, hash mismatched — and the old string-normalized compare
could not see it. Both result sets are pulled through pandas
(``toPandas()`` / ``.df()``), columns sorted by name, and each
column's ``dtype.kind`` must agree (int vs float vs object ...).

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from cminer_spark import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def dtype_kinds(pdf):
    """{col: dtype.kind} with columns lowercased — the driver hashes
    through pandas, so a kind mismatch (int vs float vs object) is a
    hash mismatch even when stringified values agree."""
    return {c.lower(): pdf[c].dtype.kind for c in pdf.columns}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("gate-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).persist()
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            s_kinds = dtype_kinds(sdf.toPandas())
            sdf.unpersist()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0].lower() for d in cur.description]
            d_rows = cur.fetchall()
            d_kinds = dtype_kinds(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            failures += 1
            continue
        a = rows_to_multiset(s_cols, s_rows)
        b = rows_to_multiset(d_cols, d_rows)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures += 1
            continue
        # empty frames carry no kind signal on the object-typed side
        if len(s_rows) > 0:
            kind_bad = {
                c: (s_kinds.get(c), d_kinds.get(c))
                for c in s_kinds
                if s_kinds.get(c) != d_kinds.get(c)
            }
            if kind_bad:
                print(
                    f"FAIL {name}: pandas dtype-kind mismatch "
                    f"(spark, duckdb): {kind_bad}"
                )
                failures += 1
                continue
        print(f"PASS {name}: rows={len(s_rows)} cols={len(s_cols)} ({dt:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
