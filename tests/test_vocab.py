"""Tests for vocabulary statistics (word counts, BPE pair counts) and
per-group length percentiles."""

from __future__ import annotations

from collections import Counter

import pytest

from cminer_spark.pipeline.textstats import length_percentiles
from cminer_spark.pipeline.vocab import bpe_pair_counts, word_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "the cat sat on the mat",
    "The  THE the",  # case folding + multi-space split
    "aaa abab",  # overlapping pairs: aaa -> aa, aa
    "",  # empty doc contributes nothing
    "cat cathedral",
]


def _py_words(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                c[w] += 1
    return dict(c)


def _py_pairs(texts):
    words = _py_words(texts)
    c = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            c[w[i : i + 2]] += n
    return dict(c)


def test_word_counts_matches_python(spark):
    got = {r.word: r.n for r in word_counts(_docs(spark, TEXTS)).collect()}
    assert got == _py_words(TEXTS)


def test_bpe_pairs_matches_python_with_overlaps(spark):
    exp = _py_pairs(TEXTS)
    out = bpe_pair_counts(_docs(spark, TEXTS), top_k=1000).collect()
    got = {r.pair: r.n for r in out}
    assert got == exp
    # "aaa" occurs once -> pair "aa" counted twice (overlap)
    assert got["aa"] == 2
    # deterministic rank: count desc, pair asc
    ranked = sorted(out, key=lambda r: r.pair_rank)
    keys = [(-r.n, r.pair) for r in ranked]
    assert keys == sorted(keys)


def test_bpe_topk_and_validation(spark):
    docs = _docs(spark, TEXTS)
    assert bpe_pair_counts(docs, top_k=3).count() == 3
    with pytest.raises(ValueError):
        bpe_pair_counts(docs, top_k=0)


def test_word_counts_weighting_flows_into_pairs(spark):
    # "zz" appears 5 times in one doc -> pair "zz" counted 5x
    docs = _docs(spark, ["zz zz zz zz zz"])
    got = {r.pair: r.n for r in bpe_pair_counts(docs, top_k=10).collect()}
    assert got == {"zz": 5}


def _len_docs(spark):
    rows = []
    for i in range(40):
        rows.append((i, "en", float(i + 1)))  # 1..40
    for i in range(5):
        rows.append((100 + i, "fr", float(10 * (i + 1))))  # 10..50
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars double")


def test_length_percentiles_exact_matches_numpy(spark):
    import numpy as np

    out = {
        r.lang: r.asDict() for r in length_percentiles(_len_docs(spark)).collect()
    }
    en = np.arange(1.0, 41.0)
    fr = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
    for lang, vals in (("en", en), ("fr", fr)):
        assert out[lang]["n_docs"] == len(vals)
        for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            assert out[lang][f"p{p:02d}"] == pytest.approx(
                round(float(np.percentile(vals, p)), 6), abs=1e-9
            ), (lang, col)


def test_length_percentiles_approx_same_schema(spark):
    exact = length_percentiles(_len_docs(spark), exact=True)
    approx = length_percentiles(_len_docs(spark), exact=False)
    assert exact.columns == approx.columns
    # on tiny groups the GK sketch is exact up to interpolation; just
    # require the approx path to produce sane, ordered values
    for r in approx.collect():
        assert r.p50 <= r.p90 <= r.p99
