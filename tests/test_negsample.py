"""Negative edge sampling: label correctness, no-collision guarantees,
determinism, bounds."""

from __future__ import annotations

import pytest

from cminer_spark.operators import negative_edge_samples
from tests.conftest import edges_df


# a 40-vertex ring: plenty of occupied buckets, so candidate draws
# actually land on representatives (4 vertices x 16 buckets would
# mostly miss — negatives are "<= k", legitimately 0 on tiny graphs)
PAIRS = [(i, (i + 1) % 40) for i in range(40)]


def test_negatives_never_collide_with_edges_or_self(spark):
    out = negative_edge_samples(edges_df(spark, PAIRS), k=4, buckets=16)
    rows = [(r.src, r.dst, r.label) for r in out.collect()]
    pos = {(s, d) for s, d, l in rows if l == 1}
    neg = {(s, d) for s, d, l in rows if l == 0}
    assert pos == set(PAIRS)
    assert not (neg & pos)
    assert all(s != d for s, d in neg)
    assert len(neg) > 0


def test_at_most_k_negatives_per_source(spark):
    out = negative_edge_samples(edges_df(spark, PAIRS), k=3, buckets=64)
    from collections import Counter
    c = Counter(r.src for r in out.collect() if r.label == 0)
    assert all(v <= 3 for v in c.values())


def test_deterministic_and_seed_sensitivity(spark):
    e = edges_df(spark, PAIRS)
    a = sorted(map(tuple, negative_edge_samples(e, k=3, buckets=64).collect()))
    b = sorted(map(tuple, negative_edge_samples(e, k=3, buckets=64).collect()))
    assert a == b
    c = sorted(map(tuple,
                   negative_edge_samples(e, k=3, buckets=64, seed=9).collect()))
    assert a != c  # different seed draws different buckets


def test_exclude_positives_mode(spark):
    out = negative_edge_samples(
        edges_df(spark, PAIRS), k=2, buckets=32, include_positives=False
    )
    assert all(r.label == 0 for r in out.collect())


def test_validation(spark):
    with pytest.raises(ValueError):
        negative_edge_samples(edges_df(spark, PAIRS), k=0)
