"""Sequence packing: coverage, overflow bound, stability, oversize
docs, token-column passthrough, stats rollup."""

from __future__ import annotations

import random

import pytest

from cminer_spark.pipeline.packing import pack_sequences, pack_stats


def _docs(spark, n=300, seed=5, max_len=40):
    rng = random.Random(seed)
    rows = [
        (i, " ".join("w%d" % rng.randrange(50) for _ in range(rng.randrange(1, max_len))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_every_doc_in_exactly_one_bin(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, max_tokens=64, groups=5).persist()
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    packed.unpersist()


def test_overflow_bounded_by_last_doc(spark):
    """A bin's token sum exceeds max_tokens by less than its own max
    doc size (start-bin relaxation bound)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, n=500, seed=9)
    cap = 64
    packed = pack_sequences(docs, max_tokens=cap, groups=4).persist()
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    bad = bins.where(F.col("tot") >= cap + F.col("mx")).count()
    assert bad == 0
    stats = pack_stats(packed, cap)
    assert stats.where(F.col("overflow") < 0).count() == 0
    assert stats.count() == packed.select("bin_id").distinct().count()
    packed.unpersist()


def test_stable_under_repartitioning(spark):
    docs = _docs(spark, n=200, seed=2)
    a = pack_sequences(docs.repartition(3), max_tokens=50, groups=6)
    b = pack_sequences(docs.repartition(11), max_tokens=50, groups=6)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_oversize_doc_does_not_displace_others_bins(spark):
    """An oversize doc occupies its start bin; subsequent docs in its
    group simply start in a later bin — assignments stay a pure
    function of the cumulative sums."""
    from pyspark.sql import functions as F

    # four 500-token docs at cap 32: whatever the hash order, doc i
    # starts at cum 500*i -> bin_idx floor(500*i/32), all distinct
    rows = [(i, ("t " * 500).strip()) for i in range(1, 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(docs, max_tokens=32, groups=1)
    idxs = sorted(r["bin_idx"] for r in packed.collect())
    assert idxs == [0, 15, 31, 46]  # floor(500i/32)
    assert packed.select("bin_id").distinct().count() == 4


def test_tokens_col_passthrough_matches_text_tokens(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark, n=100, seed=4).withColumn(
        "n", F.size(F.split("text", " +"))
    )
    a = pack_sequences(docs, max_tokens=40, groups=3)
    b = pack_sequences(docs, max_tokens=40, groups=3, tokens_col="n")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_invalid_capacity_raises(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, n=5), max_tokens=0)
