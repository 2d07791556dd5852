"""Unigram log-prob quality scoring: closed-form values, OOV floor,
corpus-vs-scored separation, ranking behavior."""

from __future__ import annotations

import math

from cminer_spark.pipeline.textstats import unigram_logprob


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_closed_form_two_docs(spark):
    # corpus: "a a b" + "b" -> counts a=2 b=2, N=4, V=2
    df = _docs(spark, [(0, "a a b"), (1, "b")])
    out = {r.doc_id: (r.n_tokens, r.logprob_per_token)
           for r in unigram_logprob(df).collect()}
    p = math.log(3 / 6)  # (2+1)/(4+2) for both tokens
    assert out[0] == (3, round(p, 6))
    assert out[1] == (1, round(p, 6))


def test_oov_floor(spark):
    corpus = _docs(spark, [(0, "a a a a")])  # N=4, V=1
    scored = _docs(spark, [(9, "zzz")])
    out = unigram_logprob(scored, corpus=corpus).collect()[0]
    assert out.logprob_per_token == round(math.log(1 / 5), 6)


def test_typical_docs_score_higher(spark):
    rows = [(i, "the cat sat on the mat") for i in range(9)]
    rows.append((99, "zorp quux flibble"))
    out = {r.doc_id: r.logprob_per_token
           for r in unigram_logprob(_docs(spark, rows)).collect()}
    assert out[99] < out[0]  # rare-token doc ranks below typical docs


def test_n_tokens_counts_all_occurrences(spark):
    out = unigram_logprob(_docs(spark, [(0, "x x x")])).collect()[0]
    assert out.n_tokens == 3
