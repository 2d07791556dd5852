"""DSIR-style importance weights: direction, empty docs, plan shape,
gate parity (the all-gate DuckDB mirror re-checks parity every run)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cminer_spark.pipeline import importance_weights


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_score_higher(spark):
    raw = _df(
        spark,
        [
            (0, "alpha beta alpha beta"),     # target-like
            (1, "zork quux zork quux"),       # off-target
            (2, "alpha beta zork quux"),      # mixed
        ],
    )
    target = _df(spark, [(100, "alpha beta alpha beta alpha")])
    out = {
        r.doc_id: r.logweight
        for r in importance_weights(raw, target, n_buckets=64).collect()
    }
    assert out[0] > out[2] > out[1]


def test_empty_and_null_docs_get_zero_rows(spark):
    raw = _df(spark, [(0, "alpha beta"), (1, ""), (2, None), (3, "   ")])
    target = _df(spark, [(9, "alpha")])
    rows = {
        r.doc_id: (r.n_grams, r.logweight)
        for r in importance_weights(raw, target, n_buckets=32).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for d in (1, 2, 3):
        assert rows[d] == (0, 0.0)
    assert rows[0][0] == 3  # 2 unigrams + 1 bigram


def test_weight_sums_are_occurrence_level(spark):
    # doubling every gram occurrence doubles the (unrounded) weight:
    # the per-doc sum counts occurrences, not distinct grams
    raw1 = _df(spark, [(0, "alpha beta")])
    raw2 = _df(spark, [(0, "alpha beta alpha beta")])
    target = _df(spark, [(9, "alpha beta")])
    w1 = importance_weights(raw1, target, n_buckets=64).collect()[0]
    w2 = importance_weights(raw2, target, n_buckets=64).collect()[0]
    assert w1.n_grams == 3 and w2.n_grams == 7


def test_model_join_is_broadcast_no_corpus_shuffle_for_lookup(spark):
    raw = _df(spark, [(0, "a b"), (1, "c d")])
    target = _df(spark, [(9, "a b")])
    plan = importance_weights(raw, target, n_buckets=16)._sc._jvm \
        .PythonSQLUtils.explainString(
            importance_weights(raw, target, n_buckets=16)
            ._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan


def test_target_needs_no_doc_id_column(spark):
    # a curated target corpus is naturally a bare text table —
    # histogram sides never use document identity
    raw = _df(spark, [(0, "alpha beta alpha"), (1, "zork quux")])
    target = spark.createDataFrame(
        [("alpha beta alpha beta",)], "text string"
    )
    out = {
        r.doc_id: r.logweight
        for r in importance_weights(raw, target, n_buckets=64).collect()
    }
    assert out[0] > out[1]


def test_empty_target_is_uniform_model(spark):
    # an empty target corpus degenerates to the add-one-smoothed
    # uniform model: every bucket's ln_t = ln(1/nb), so ranking is
    # purely anti-raw-frequency — and nothing divides by zero
    raw = _df(spark, [(0, "alpha alpha alpha"), (1, "beta")])
    target = spark.createDataFrame([], "text string")
    rows = {
        r.doc_id: (r.n_grams, r.logweight)
        for r in importance_weights(raw, target, n_buckets=32).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[0][0] == 5 and rows[1][0] == 1
    # the rarer-in-raw doc scores higher under a uniform target
    assert rows[1][1] / 1 > rows[0][1] / 5


def test_exactly_three_gram_explodes_per_action(spark):
    # the lazy minimum: raw corpus exploded twice (model histogram +
    # per-doc scoring), target once. The model's totals must come from
    # windows over the tiny histograms, not self-joins that would
    # re-evaluate a corpus subtree (4+ Generate nodes = regression).
    import re

    raw = _df(spark, [(0, "a b c"), (1, "c d e")])
    target = _df(spark, [(9, "a b")])
    df = importance_weights(raw, target, n_buckets=16)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # AQE prints Final + Initial plan trees; count the final tree only
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Generate \(\d+\)", final)) == 3
