"""Tests for the bigram log-probability scorer."""

from __future__ import annotations

import math
from collections import Counter


def _py_bigram(texts, score_texts):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    v = len(uni)
    out = {}
    for i, t in score_texts:
        toks = t.lower().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        lp = [
            math.log((bi.get(p, 0) + 1.0) / (uni.get(p[0], 0) + v))
            for p in pairs
        ]
        out[i] = (len(pairs), round(sum(lp) / len(lp), 6))
    return out


TEXTS = [
    "the cat sat on the mat",
    "the cat ran",
    "dog",  # single token: no bigrams, absent from output
    "a b a b a b",  # repeated pair
]


def test_bigram_matches_reference(spark):
    from cminer_spark.pipeline.textstats import bigram_logprob

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["logprob_per_pair"])
        for r in bigram_logprob(docs).collect()
    }
    want = _py_bigram(TEXTS, list(enumerate(TEXTS)))
    assert got == want
    assert 2 not in got  # single-token doc has no bigram rows


def test_bigram_orders_beat_shuffled_text(spark):
    """Word order matters: a corpus-typical sequence must outscore the
    same multiset of tokens in scrambled order."""
    from cminer_spark.pipeline.textstats import bigram_logprob

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["logprob_per_pair"]
        for r in bigram_logprob(probe, corpus=corpus).collect()
    }
    assert scores[100] > scores[101]


def test_no_phantom_empty_token_bigrams(spark):
    """Trailing/leading/multiple spaces must not create '' bigrams
    (review fix)."""
    from cminer_spark.pipeline.textstats import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "hello "), (1, " the  cat "), (2, "a b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["logprob_per_pair"])
        for r in bigram_logprob(docs).collect()
    }
    assert 0 not in got  # one real token -> no bigrams
    assert got[1][0] == 1  # ('the','cat') only
    want = _py_bigram(["hello", "the cat", "a b"], [(1, "the cat"), (2, "a b")])
    assert got[1] == want[1] and got[2] == want[2]
