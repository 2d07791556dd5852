"""Gopher quality filters: each rule fires on a purpose-built doc and
the pass/fail_reasons wiring is exact."""

from __future__ import annotations

from cminer_spark.pipeline.textstats import gopher_quality_filters


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in gopher_quality_filters(df, **kw).collect()}


GOOD = "the cat and the dog have fun with that red ball of yarn to play"


def test_good_doc_passes(spark):
    out = _run(spark, [(0, GOOD)], min_words=5)
    assert out[0]["pass_filter"] is True
    assert out[0]["fail_reasons"] == ""


def test_word_count_bounds(spark):
    out = _run(spark, [(0, "too few words here")], min_words=10)
    assert out[0]["ok_word_count"] is False
    assert "word_count" in out[0]["fail_reasons"]
    out = _run(spark, [(0, GOOD)], min_words=1, max_words=5)
    assert out[0]["ok_word_count"] is False


def test_mean_word_len(spark):
    out = _run(spark, [(0, "a b c d e")], min_words=1, min_stopwords=0)
    assert out[0]["mean_word_len"] == 1.0
    assert out[0]["ok_mean_word_len"] is False
    assert out[0]["fail_reasons"] == "mean_word_len"


def test_symbol_ratio_counts_hash_and_ellipsis(spark):
    out = _run(
        spark,
        [(0, "wow ### such ... text")],
        min_words=1,
        min_stopwords=0,
        min_mean_word_len=0.0,
    )
    # 3 hashes + 1 ellipsis over 5 words = 0.8
    assert out[0]["symbol_ratio"] == 0.8
    assert out[0]["ok_symbol_ratio"] is False


def test_alpha_ratio(spark):
    out = _run(
        spark,
        [(0, "123 456 789 word")],
        min_words=1,
        min_stopwords=0,
        min_mean_word_len=0.0,
    )
    assert out[0]["alpha_ratio"] == 0.25
    assert out[0]["ok_alpha_ratio"] is False


def test_stopword_rule_counts_distinct(spark):
    # 'the' repeated 3x is still ONE distinct stopword
    out = _run(spark, [(0, "the the the xyz")], min_words=1)
    assert out[0]["n_stopwords"] == 1
    assert out[0]["ok_stopwords"] is False


def test_fail_reasons_joins_all_failures(spark):
    out = _run(spark, [(0, "9 8")], min_words=5)
    assert out[0]["pass_filter"] is False
    assert out[0]["fail_reasons"] == (
        "word_count,mean_word_len,alpha_ratio,stopwords"
    )
