"""Configuration-model rewire: exact degree preservation, determinism,
seed sensitivity, statistic-significance use case."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from cminer_spark.operators import configuration_rewire
from tests.conftest import edges_df


def _degs(df):
    out = {
        r["v"]: r["n"]
        for r in df.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    inn = {
        r["v"]: r["n"]
        for r in df.groupBy(F.col("dst").alias("v"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return out, inn


@pytest.mark.parametrize("n_buckets", [1, 5])
def test_degrees_preserved_exactly(spark, n_buckets):
    rng = random.Random(19)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    df = edges_df(spark, pairs)
    rw = configuration_rewire(df, seed=3, n_buckets=n_buckets).persist()
    assert rw.count() == len(pairs)
    assert _degs(rw) == _degs(df)
    rw.unpersist()


def test_deterministic_across_partitioning(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    a = configuration_rewire(edges_df(spark, pairs).repartition(2), seed=1)
    b = configuration_rewire(edges_df(spark, pairs).repartition(13), seed=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_seed_changes_pairing_not_degrees(spark):
    rng = random.Random(29)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(150)]
    df = edges_df(spark, pairs)
    a = configuration_rewire(df, seed=0).persist()
    b = configuration_rewire(df, seed=1).persist()
    assert _degs(a) == _degs(b)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, b.collect()))
    a.unpersist()
    b.unpersist()


def test_null_model_destroys_planted_triangles(spark):
    """Significance use case: a clique-heavy graph has far more
    triangles than its degree-preserving null — the rewire must
    destroy the planted structure (statistic strictly drops)."""
    from cminer_spark.operators import triangle_counts

    # 6 disjoint directed 5-cliques: 6 * C(5,3) = 60 triangles
    pairs = []
    for c in range(6):
        base = 10 * c
        pairs += [
            (base + a, base + b) for a in range(5) for b in range(5) if a != b
        ]
    df = edges_df(spark, pairs)
    _, real_total = triangle_counts(df)
    null_edges = configuration_rewire(df, seed=4, n_buckets=1)
    _, null_total = triangle_counts(null_edges.withColumn("weight", F.lit(1.0)))
    assert real_total == 60
    assert null_total < real_total


def test_invalid_buckets_raises(spark):
    with pytest.raises(ValueError):
        configuration_rewire(edges_df(spark, [(1, 2)]), n_buckets=0)
