"""Unit tests for BM25/TF-IDF ranking and repetition stats on
hand-computed fixtures."""

from __future__ import annotations

import math

from cminer_spark.pipeline.ranking import bm25_search, tfidf_top_terms
from cminer_spark.pipeline.textstats import repetition_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_hand_computed(spark):
    docs = _docs(spark, ["cat dog", "cat cat fish", "bird"])
    out = {
        (r.doc_id, r.term): (r.tf, r.tfidf, r.term_rank)
        for r in tfidf_top_terms(docs, k=5).collect()
    }
    # df: cat=2, dog=1, fish=1, bird=1; N=3
    assert out[(0, "dog")][0] == 1
    assert out[(0, "dog")][1] == round(math.log(3.0 / 1.0), 6)
    assert out[(1, "cat")][0] == 2
    assert out[(1, "cat")][1] == round(2 * math.log(3.0 / 2.0), 6)
    # dog (idf ln3≈1.099) outranks cat in doc 0
    assert out[(0, "dog")][2] == 1 and out[(0, "cat")][2] == 2


def test_tfidf_rank_tie_breaks_on_term(spark):
    docs = _docs(spark, ["b a", "x"])  # a and b: tf=1, df=1 → equal tfidf
    ranks = {
        r.term: r.term_rank
        for r in tfidf_top_terms(docs, k=2).collect()
        if r.doc_id == 0
    }
    assert ranks == {"a": 1, "b": 2}


def test_bm25_rare_term_doc_wins(spark):
    # doc 2 holds the rare term; docs 0/1 only the common one
    docs = _docs(
        spark,
        ["common alpha beta", "common gamma delta", "rare epsilon zeta"],
    )
    out = bm25_search(docs, ["common", "rare"], k=3).collect()
    assert out[0].doc_id == 2 and out[0].rank == 1
    # docs 0 and 1 tie on score → doc_id ascending
    assert [r.doc_id for r in out[1:]] == [0, 1]
    assert [r.rank for r in out] == [1, 2, 3]


def test_bm25_hand_computed_single_doc(spark):
    docs = _docs(spark, ["w w x", "y y y"])
    out = {r.doc_id: r.score for r in bm25_search(docs, ["w"], k=5).collect()}
    # only doc 0 matches; tf=2, dl=3, avgdl=3, N=2, df=1
    k1, b = 1.2, 0.75
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (2 * (k1 + 1)) / (2 + k1 * (1 - b + b * 3 / 3.0))
    assert set(out) == {0}
    assert abs(out[0] - round(expect, 6)) < 1e-9


def test_bm25_non_matching_docs_absent(spark):
    docs = _docs(spark, ["a b", "c d"])
    rows = bm25_search(docs, ["a"], k=10).collect()
    assert [r.doc_id for r in rows] == [0]


def test_repetition_stats_hand_computed(spark):
    docs = _docs(spark, ["aa bb aa aa", "x y z", "p p"])
    out = {
        r.doc_id: (
            r.top_token_fraction,
            r.dup_token_char_fraction,
            r.dup_bigram_fraction,
        )
        for r in repetition_stats(docs).collect()
    }
    # doc 0: tokens aa,bb,aa,aa → top=3/4; dup chars = 3*2 of 8; bigrams
    # (aa,bb),(bb,aa),(aa,aa) all distinct → 0
    assert out[0] == (0.75, 0.75, 0.0)
    # doc 1: no repetition at all
    assert out[1] == (round(1 / 3, 6), 0.0, 0.0)
    # doc 2: p p → top=1.0, dup chars 2/2, single bigram (p,p) not
    # repeated → 0
    assert out[2] == (1.0, 1.0, 0.0)


def test_repetition_stats_repeated_bigram(spark):
    docs = _docs(spark, ["a b a b a"])
    r = repetition_stats(docs).collect()[0]
    # bigrams: (a,b),(b,a),(a,b),(b,a) → all 4 occurrences duplicated
    assert r.dup_bigram_fraction == 1.0
    assert r.top_token_fraction == 0.6
