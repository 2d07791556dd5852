"""Tests for token-budget domain-mixture sampling.

The operator's contract: the distributed bucket-threshold selection is
IDENTICAL to the naive per-domain cumulative-sum window over the
``(split_hash(id, seed), id)`` order. The brute-force twin here runs
that naive form in plain Python.
"""

from __future__ import annotations

import hashlib

import pytest

from cminer_spark.pipeline.mixture import mixture_sample


def _h(doc_id, seed):
    d = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
    return int(d[:8], 16) / 2**32


def _brute(rows, weights, total_tokens, seed):
    """rows: list of (doc_id, domain, n_tokens). Returns
    {doc_id: (domain, n_tokens, sel_rank)} for the kept set."""
    wsum = float(sum(weights.values()))
    kept = {}
    for dom, w in weights.items():
        target = total_tokens * float(w) / wsum
        mine = sorted(
            (r for r in rows if r[1] == dom),
            key=lambda r: (_h(r[0], seed), r[0]),
        )
        acc = 0.0
        for rank, (doc_id, _, nt) in enumerate(mine, start=1):
            if acc < target:
                kept[doc_id] = (dom, nt, rank)
            acc += nt
    return kept


def _docs(spark, rows):
    # text with n_tokens whitespace tokens
    data = [(i, d, " ".join(["tok"] * nt)) for i, d, nt in rows]
    return spark.createDataFrame(data, "doc_id long, source string, text string")


def _rows(n=300, domains=("a", "b", "c", "zz")):
    import random

    rng = random.Random(42)
    return [
        (i, domains[rng.randrange(len(domains))], rng.randint(1, 30))
        for i in range(n)
    ]


WEIGHTS = {"a": 0.5, "b": 0.3, "c": 0.2}


def test_matches_naive_window(spark):
    rows = _rows()
    docs = _docs(spark, rows)
    out = mixture_sample(docs, WEIGHTS, 600, seed=3).collect()
    got = {r.doc_id: (r.source, r.n_tokens, r.sel_rank) for r in out}
    assert got == _brute(rows, WEIGHTS, 600, seed=3)


def test_bucket_count_invariance(spark):
    """The boundary-bucket machinery must not change the result: a tiny
    bucket count (every bucket is a boundary candidate) and the default
    2^16 produce the identical kept set and ranks."""
    rows = _rows(200)
    docs = _docs(spark, rows)
    a = sorted(
        map(tuple, mixture_sample(docs, WEIGHTS, 400, seed=1, n_buckets=4).collect())
    )
    b = sorted(
        map(tuple, mixture_sample(docs, WEIGHTS, 400, seed=1).collect())
    )
    assert a == b and len(a) > 0


def test_budget_semantics(spark):
    """Exclusive-prefix rule: every domain's kept tokens reach (>=) its
    target OR the domain is exhausted; removing the last-selected doc
    drops below target (minimality)."""
    rows = _rows(250)
    docs = _docs(spark, rows)
    total = 500
    out = mixture_sample(docs, WEIGHTS, total, seed=9).collect()
    wsum = sum(WEIGHTS.values())
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r)
    avail = {}
    for i, d, nt in rows:
        avail[d] = avail.get(d, 0) + nt
    for dom, w in WEIGHTS.items():
        target = total * w / wsum
        sel = sorted(by_dom.get(dom, []), key=lambda r: r.sel_rank)
        tot = sum(r.n_tokens for r in sel)
        if tot < target:
            assert tot == avail[dom]  # exhausted the domain
        else:
            assert tot - sel[-1].n_tokens < target  # minimal prefix
        # ranks are a contiguous 1..k prefix of the selection order
        assert [r.sel_rank for r in sel] == list(range(1, len(sel) + 1))


def test_unlisted_domains_dropped_and_zero_budget(spark):
    rows = _rows(100)
    docs = _docs(spark, rows)
    out = mixture_sample(docs, WEIGHTS, 100, seed=0).collect()
    assert all(r.source in WEIGHTS for r in out)
    assert mixture_sample(docs, WEIGHTS, 0, seed=0).count() == 0


def test_stability_under_append(spark):
    """Selection order is hash-based, so adding NEW docs can only
    insert into the order — docs selected before the budget boundary
    keep their relative order (same hash → same rank among survivors).
    Weaker but useful contract: rerunning on the same data is
    byte-stable regardless of partitioning."""
    rows = _rows(150)
    docs = _docs(spark, rows).repartition(7)
    a = sorted(map(tuple, mixture_sample(docs, WEIGHTS, 300, seed=5).collect()))
    b = sorted(
        map(
            tuple,
            mixture_sample(docs.repartition(2), WEIGHTS, 300, seed=5).collect(),
        )
    )
    assert a == b


def test_token_col_override(spark):
    rows = [(i, "a", 5) for i in range(20)]
    docs = _docs(spark, rows).withColumn(
        "my_tokens", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(10)
    )
    out = mixture_sample(
        docs, {"a": 1.0}, 35, token_col="my_tokens", seed=0
    ).collect()
    # 35-token budget at 10 tokens/doc -> 4 docs (crossing doc kept)
    assert len(out) == 4 and all(r.n_tokens == 10 for r in out)


def test_validation_errors(spark):
    docs = _docs(spark, [(0, "a", 1)])
    with pytest.raises(ValueError):
        mixture_sample(docs, {}, 10)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": -1.0}, 10)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": 0.0}, 10)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": 1.0}, -5)
