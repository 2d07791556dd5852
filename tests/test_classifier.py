"""Tests for the multinomial Naive Bayes classifier (train on a
labeled seed set, broadcast-score a corpus)."""

from __future__ import annotations

import math
from collections import Counter

from cminer_spark.pipeline.classifier import (
    classify_corpus,
    score_naive_bayes,
    train_naive_bayes,
)


def _labeled(spark, rows):
    return spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


SEED_ROWS = [
    ("the cat sat on the mat the end", "en"),
    ("the dog and the cat ran to the park", "en"),
    ("el gato y el perro en el parque", "es"),
    ("la casa y el sol en la playa", "es"),
    ("der hund und die katze im park", "de"),
    ("das haus und der baum im wald", "de"),
]


def _py_nb(rows, score_rows):
    """Reference NB: add-one smoothing, shared vocab, ln-space."""
    counts: dict[str, Counter] = {}
    n_docs: Counter = Counter()
    for text, label in rows:
        n_docs[label] += 1
        counts.setdefault(label, Counter()).update(
            w for w in text.lower().split() if w
        )
    vocab = {w for c in counts.values() for w in c}
    v = len(vocab)
    n = sum(n_docs.values())
    out = {}
    for i, text in score_rows:
        best = []
        for label, c in counts.items():
            t_l = sum(c.values())
            ll = math.log(n_docs[label] / n)
            for w in text.lower().split():
                if w:
                    ll += math.log((c.get(w, 0) + 1.0) / (t_l + v))
            best.append((round(ll, 6), label))
        best.sort(key=lambda p: (-p[0], p[1]))
        margin = round(best[0][0] - best[1][0], 6) if len(best) > 1 else 0.0
        out[i] = (best[0][1], best[0][0], margin)
    return out


def test_classify_recovers_planted_labels(spark):
    docs = _labeled(spark, SEED_ROWS)
    out = {r["doc_id"]: r for r in classify_corpus(docs, "lang").collect()}
    assert len(out) == len(SEED_ROWS)
    for i, (_, label) in enumerate(SEED_ROWS):
        assert out[i]["pred_label"] == label


def test_scores_match_reference_nb(spark):
    docs = _labeled(spark, SEED_ROWS)
    got = {
        r["doc_id"]: (r["pred_label"], r["score"], r["margin"])
        for r in classify_corpus(docs, "lang").collect()
    }
    want = _py_nb(SEED_ROWS, [(i, t) for i, (t, _) in enumerate(SEED_ROWS)])
    assert got == want


def test_score_disjoint_corpus_handles_unseen_tokens(spark):
    seed = _labeled(spark, SEED_ROWS)
    loglik, labels = train_naive_bayes(seed, "lang")
    # "zzz" never appears in training: the ln_floor fallback path
    new = spark.createDataFrame(
        [(100, "el gato zzz en el parque"), (101, "the zzz cat zzz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in score_naive_bayes(new, loglik, labels).collect()}
    want = _py_nb(SEED_ROWS, [(100, "el gato zzz en el parque"), (101, "the zzz cat zzz")])
    assert out[100]["pred_label"] == "es" == want[100][0]
    assert out[101]["pred_label"] == "en" == want[101][0]
    for i in (100, 101):
        assert (out[i]["pred_label"], out[i]["score"], out[i]["margin"]) == want[i]


def test_vocab_cap_keeps_top_tokens_only(spark):
    docs = _labeled(spark, SEED_ROWS)
    loglik, labels = train_naive_bayes(docs, "lang", vocab_size=5)
    kept = {r["t"] for r in loglik.select("t").distinct().collect()}
    assert len(kept) == 5
    # top tokens by global frequency (ties broken token-asc)
    c = Counter(
        w for t, _ in SEED_ROWS for w in t.lower().split() if w
    )
    want = {
        w for w, _ in sorted(c.items(), key=lambda p: (-p[1], p[0]))[:5]
    }
    assert kept == want
    # scoring still runs and yields one row per doc
    assert score_naive_bayes(docs, loglik, labels).count() == len(SEED_ROWS)


def test_single_label_margin_zero(spark):
    docs = _labeled(spark, [("a b c", "en"), ("c d e", "en")])
    rows = classify_corpus(docs, "lang").collect()
    assert all(r["margin"] == 0.0 for r in rows)
    assert all(r["pred_label"] == "en" for r in rows)


# ---------------------------------------------------------------------------
# evaluate_predictions
# ---------------------------------------------------------------------------


def test_evaluate_predictions_report(spark):
    from cminer_spark.pipeline.classifier import evaluate_predictions

    truth = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "b")],
        "doc_id long, label string",
    )
    pred = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "b"), (3, "b"), (4, "a")],
        "doc_id long, pred_label string",
    )
    rep = {r["label"]: r for r in evaluate_predictions(pred, truth).collect()}
    # a: tp=1, n_true=2, n_pred=2 -> P=R=0.5, f1=0.5
    assert (rep["a"]["tp"], rep["a"]["n_true"], rep["a"]["n_pred"]) == (1, 2, 2)
    assert rep["a"]["precision"] == rep["a"]["recall"] == rep["a"]["f1"] == 0.5
    # b: tp=2, n_true=3, n_pred=3
    assert (rep["b"]["tp"], rep["b"]["n_true"], rep["b"]["n_pred"]) == (2, 3, 3)
    assert abs(rep["b"]["f1"] - 2 / 3) < 1e-6


def test_evaluate_predictions_unpredicted_class(spark):
    from cminer_spark.pipeline.classifier import evaluate_predictions

    truth = spark.createDataFrame(
        [(0, "a"), (1, "c")], "doc_id long, label string"
    )
    pred = spark.createDataFrame(
        [(0, "a"), (1, "a")], "doc_id long, pred_label string"
    )
    rep = {r["label"]: r for r in evaluate_predictions(pred, truth).collect()}
    # c never predicted: n_pred=0, precision 0.0 (not null/NaN)
    assert rep["c"]["n_pred"] == 0 and rep["c"]["tp"] == 0
    assert rep["c"]["precision"] == 0.0 and rep["c"]["recall"] == 0.0
    assert rep["c"]["f1"] == 0.0
    # a predicted twice, right once
    assert rep["a"]["precision"] == 0.5 and rep["a"]["recall"] == 1.0


def test_tokenless_docs_get_prior_only_row(spark):
    """Empty/null/whitespace-only docs must not vanish: they score the
    prior-only argmax (review fix)."""
    docs = spark.createDataFrame(
        [(0, "a b", "x"), (1, "a", "x"), (2, "c d", "y"),
         (10, "", "x"), (11, None, "y"), (12, "   ", "x")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in classify_corpus(docs, "lang").collect()}
    assert set(out) == {0, 1, 2, 10, 11, 12}
    # prior argmax: 4 'x' docs vs 2 'y' docs -> 'x'
    for i in (10, 11, 12):
        assert out[i]["pred_label"] == "x"
        assert out[i]["score"] == round(math.log(4 / 6), 6)
        assert out[i]["margin"] == round(math.log(4 / 6) - math.log(2 / 6), 6)
