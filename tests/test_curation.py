"""Unit tests for corpus-curation operators: deterministic splits,
quota sampling, n-gram decontamination."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cminer_spark.pipeline.curation import (
    decontaminate,
    deterministic_split,
    quota_sample,
    split_hash,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_hash(doc_id: int, seed: int) -> float:
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_split_hash_matches_python_md5(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", split_hash("doc_id", seed=7).alias("h")
        ).collect()
    }
    for i in range(50):
        assert abs(got[i] - _py_hash(i, 7)) < 1e-12


def test_split_weights_and_stability(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = deterministic_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
    )
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # stability: the same rows re-split in a subset keep their split
    sub = deterministic_split(
        docs.where(F.col("doc_id") < 100),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=0,
    )
    full = {r.doc_id: r.split for r in out.where("doc_id < 100").collect()}
    assert {r.doc_id: r.split for r in sub.collect()} == full


def test_split_weights_must_sum_to_one(spark):
    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        deterministic_split(docs, {"a": 0.5, "b": 0.2})


def test_quota_sample_deterministic_and_capped(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out1 = sorted(
        (r.doc_id, r.source)
        for r in quota_sample(df, "source", n=5, seed=1).collect()
    )
    out2 = sorted(
        (r.doc_id, r.source)
        for r in quota_sample(df, "source", n=5, seed=1).collect()
    )
    assert out1 == out2
    per = {}
    for _, s in out1:
        per[s] = per.get(s, 0) + 1
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # a different seed picks a different sample
    out3 = sorted(
        (r.doc_id, r.source)
        for r in quota_sample(df, "source", n=5, seed=2).collect()
    )
    assert out1 != out3


def test_quota_sample_small_group_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, source string"
    )
    assert quota_sample(df, "source", n=10).count() == 2


def test_decontaminate_drops_overlapping_docs(spark):
    corpus = _docs(
        spark,
        [
            "one two three four five six seven eight nine",  # overlaps eval
            "alpha beta gamma delta epsilon zeta eta theta iota",
            "short text",
        ],
    )
    eval_docs = _docs(
        spark, ["zzz one two three four five six seven eight yyy"]
    )
    kept = decontaminate(corpus, eval_docs, n=8)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
    marked = {
        r.doc_id: r.contaminated
        for r in decontaminate(corpus, eval_docs, n=8, mark_only=True).collect()
    }
    assert marked == {0: True, 1: False, 2: False}


def test_decontaminate_short_docs_never_match(spark):
    # docs under n tokens produce no n-grams → never contaminated
    corpus = _docs(spark, ["one two three"])
    eval_docs = _docs(spark, ["one two three"])
    assert decontaminate(corpus, eval_docs, n=8).count() == 1


def test_normalize_text_cases(spark):
    from cminer_spark.pipeline import normalize_text

    rows = [
        (0, "Hello   World"),
        (1, "\thello world\r\n"),
        (2, "hello\x00world\x0b!"),
        (3, None),
        (4, "  HELLO WORLD  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    assert got[0] == "hello world"
    assert got[1] == "hello world"
    assert got[2] == "helloworld!"
    assert got[3] is None
    assert got[4] == "hello world"
    # reformatted copies now dedup together
    assert got[0] == got[1] == got[4]
    # lowercase off keeps case
    kept = {r.doc_id: r.text_norm
            for r in normalize_text(df, lowercase=False).collect()}
    assert kept[4] == "HELLO WORLD"


def test_normalize_gate_parity(spark):
    import duckdb

    import __spark_entry__ as E
    from cminer_spark.gate_pipeline import normalize_oracle_sql

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.doc_id, r.text_norm)
        for r in E.queries()["normalize_text"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (int(a), b) for a, b in con.execute(normalize_oracle_sql()).fetchall()
    )
    assert got == want
