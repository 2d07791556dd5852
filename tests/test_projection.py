"""JL sign random projection: distance preservation, determinism,
linearity sanity, and oracle gate parity."""

from __future__ import annotations

import math
import random

import duckdb

from cminer_spark.pipeline import random_projection


def _project(spark, rows, out_dim, seed=42):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {
        r.vec_id: list(r.projected)
        for r in random_projection(df, out_dim, seed=seed).collect()
    }


def test_distances_preserved_in_expectation(spark):
    rng = random.Random(8)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(12)]
    proj = _project(spark, rows, out_dim=32, seed=7)
    orig = {i: v for i, v in rows}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for i in range(0, 12, 2):
        a, b = i, i + 1
        d0 = dist(orig[a], orig[b])
        d1 = dist(proj[a], proj[b])
        ratios.append(d1 / d0)
    # JL with k=32: every tested pair within 50%, mean within 15%
    assert all(0.5 < r < 1.5 for r in ratios), ratios
    assert abs(sum(ratios) / len(ratios) - 1.0) < 0.15, ratios


def test_deterministic_and_seed_sensitive(spark):
    rows = [(0, [float(i) for i in range(16)])]
    a = _project(spark, rows, 8, seed=1)
    b = _project(spark, rows, 8, seed=1)
    c = _project(spark, rows, 8, seed=2)
    assert a == b
    assert a != c


def test_linearity(spark):
    # projection is linear: P(2x) == 2 P(x)
    x = [0.5, -1.0, 2.0, 0.25]
    rows = [(0, x), (1, [2 * v for v in x])]
    p = _project(spark, rows, 4, seed=3)
    for u, v in zip(p[0], p[1]):
        assert abs(2 * u - v) < 1e-9


def test_gate_parity(spark):
    import __spark_entry__ as E
    from cminer_spark.gate_pipeline import projection_oracle_sql

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.vec_id, r.pos, r.val)
        for r in E.queries()["random_projection"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        (int(a), int(p), float(v))
        for a, p, v in con.execute(projection_oracle_sql()).fetchall()
    )
    assert got == want
