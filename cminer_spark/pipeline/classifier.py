"""Naive Bayes text classifier: distributed train + broadcast score.

The CCNet / fastText-style quality-classification step of a training-
data pipeline: fit a multinomial Naive Bayes model on a labeled seed
corpus (e.g. "wiki-like" vs "crawl" — here any label column), then
score every document and keep / route by predicted class.

Spark-first shape (reference has no classifier; this is the
training-data-pipeline extension the task brief asks for):

* **Training is two combinable aggregations** — ``groupBy(label,
  token)`` counts and ``groupBy(label)`` totals — each one shuffle
  with map-side partial aggregation. No iteration, no driver data.
* **The fitted model is small** — ``O(vocab × n_labels)`` rows — so
  scoring joins it with an explicit ``broadcast()``: the 100 TB corpus
  side never shuffles for the model lookup; the only wide exchange is
  the per-(doc, label) score aggregation, keyed by doc id (uniform,
  no skew).
* **Unseen (token, label) pairs** fall back to the add-one-smoothing
  floor ``ln(1/(T_l + V))`` via ``coalesce`` after the left join — the
  grid is never densified.
* Ties in the argmax are broken on the ROUNDED score then label order,
  so the prediction is deterministic and engine-portable (the gate's
  DuckDB oracle ranks the same way).
* ``vocab_size=N`` caps the model to the N globally most frequent
  tokens (deterministic freq-desc, token-asc order) — the scale knob
  for open-vocabulary corpora; capped-out tokens score as unseen.

All pure ``pyspark.sql.functions`` (codegen'd); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str, label_col: str | None) -> DataFrame:
    cols = [F.col(id_col).alias("doc_id")]
    if label_col is not None:
        cols.append(F.col(label_col).alias("label"))
    return (
        docs.select(*cols, F.explode(F.split(F.lower(F.col(text_col)), " +")).alias("t"))
        .where(F.col("t") != "")
    )


def train_naive_bayes(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with add-one smoothing on a labeled corpus.

    Returns ``(loglik, labels)``:

    * ``loglik``: (label, t, loglik double) — ``ln((c_lt + 1) /
      (T_l + V))`` for every (label, token) pair seen in training.
    * ``labels``: (label, ln_prior double, ln_floor double) —
      document-count prior and the per-label unseen-token floor
      ``ln(1 / (T_l + V))``.

    ``V`` counts the distinct retained vocabulary (after the optional
    ``vocab_size`` cap), shared across labels.
    """
    toks = _tokens(docs, id_col, text_col, label_col)
    if vocab_size is not None:
        top = (
            toks.groupBy("t")
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.col("_n").desc(), F.col("t").asc())
            .limit(int(vocab_size))
            .select("t")
        )
        toks = toks.join(F.broadcast(top), "t", "inner")

    counts = toks.groupBy("label", "t").agg(F.count(F.lit(1)).alias("c"))
    v = counts.select(F.countDistinct("t").alias("v"))
    totals = counts.groupBy("label").agg(F.sum("c").alias("t_l")).crossJoin(F.broadcast(v))

    n_docs = docs.select(
        F.col(label_col).alias("label")
    ).groupBy("label").agg(F.count(F.lit(1)).alias("n_l"))
    n_tot = n_docs.select(F.sum("n_l").alias("n"))
    labels = (
        n_docs.crossJoin(F.broadcast(n_tot))
        .join(totals, "label")
        .select(
            "label",
            F.log(F.col("n_l") / F.col("n")).alias("ln_prior"),
            F.log(F.lit(1.0) / (F.col("t_l") + F.col("v"))).alias("ln_floor"),
        )
    )
    loglik = counts.join(F.broadcast(totals), "label").select(
        "label",
        "t",
        F.log((F.col("c") + F.lit(1.0)) / (F.col("t_l") + F.col("v"))).alias("loglik"),
    )
    return loglik, labels


def score_naive_bayes(
    docs: DataFrame,
    loglik: DataFrame,
    labels: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a corpus against a fitted NB model.

    Returns one row per document: ``(doc_id, pred_label,
    score double, margin double)`` — ``score`` is the winning label's
    rounded log posterior, ``margin`` the rounded gap to the runner-up
    (0.0 when only one label exists). Documents with NO tokens (null/
    empty/whitespace-only text) still get a row: the prior-only argmax
    (anti-join recovers them — they cannot silently vanish from a
    keep/route decision).

    Plan: exploded tokens → broadcast left join against the O(V×L)
    model grid (no shuffle: the corpus side keeps its scan
    partitioning) → ONE doc-keyed shuffle-aggregate with map-side
    partial combine → per-doc argmax window (tiny groups, bounded by
    n_labels). The corpus is never exchanged for the model lookup —
    a (doc, token) pre-count would shrink the join input but cost a
    full extra corpus shuffle, which dominates at scale.
    """
    toks = _tokens(docs, id_col, text_col, None)
    # dense per-label expansion of each token occurrence: labels tiny
    scored = (
        toks.crossJoin(F.broadcast(labels.select("label", "ln_floor")))
        .join(F.broadcast(loglik), ["label", "t"], "left")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.coalesce(F.col("loglik"), F.col("ln_floor"))).alias("ll"))
        .join(F.broadcast(labels.select("label", "ln_prior")), "label")
        .select(
            "doc_id",
            "label",
            F.round(F.col("ll") + F.col("ln_prior"), 6).alias("score"),
        )
    )
    # token-less documents: prior-only posterior. Tokenlessness is a
    # ROW-LOCAL property (no non-empty piece after the split), so a
    # scan predicate replaces the previous explode + distinct +
    # anti-join — one fewer full-corpus explode and shuffle, same set
    # of documents by definition of _tokens.
    has_tok = (
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), " +"),
                lambda x: x != "",
            )
        )
        > 0
    )
    no_tok = (
        docs.where(~F.coalesce(has_tok, F.lit(False)))
        .select(F.col(id_col).alias("doc_id"))
        .crossJoin(F.broadcast(labels.select("label", "ln_prior")))
        .select("doc_id", "label", F.round("ln_prior", 6).alias("score"))
    )
    scored = scored.unionByName(no_tok)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("label").asc())
    ranked = scored.select(
        "doc_id",
        "label",
        "score",
        F.row_number().over(w).alias("rk"),
        F.lead("score", 1).over(w).alias("_next"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "doc_id",
        F.col("label").alias("pred_label"),
        "score",
        F.round(
            F.coalesce(F.col("score") - F.col("_next"), F.lit(0.0)), 6
        ).alias("margin"),
    )


def classify_corpus(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = None,
) -> DataFrame:
    """Train-on-self then score: the one-call gate/demo entry point.

    Real pipelines train on a small labeled seed set and score a huge
    unlabeled corpus; the two-function API above supports that split —
    this wrapper just wires them to the same frame.
    """
    loglik, labels = train_naive_bayes(
        docs, label_col, text_col=text_col, id_col=id_col, vocab_size=vocab_size
    )
    return score_naive_bayes(docs, loglik, labels, text_col=text_col, id_col=id_col)


def evaluate_predictions(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred_label",
    truth_col: str = "label",
) -> DataFrame:
    """Per-class quality report for a prediction table: ``(label,
    n_true, n_pred, tp, precision, recall, f1)`` — the evaluation leg
    of the classify-then-filter pipeline (route/drop decisions need
    per-class precision before you trust a filter at 100 TB).

    Plan: one inner join on the id (both sides keyed, uniform), ONE
    confusion aggregate ``groupBy(true, pred)`` — after which
    everything is O(n_labels²) and the per-class rollups are free.
    Zero-denominator classes report 0.0, not null/NaN (ANSI-safe).
    Metrics round to 6 dp (engine-portable, gate ``nb_eval``).
    """
    j = truth.select(
        F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")
    ).join(
        pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p")),
        "_id",
    )
    conf = j.groupBy("_t", "_p").agg(F.count(F.lit(1)).alias("n"))
    by_true = conf.groupBy(F.col("_t").alias("label")).agg(
        F.sum("n").alias("n_true")
    )
    by_pred = conf.groupBy(F.col("_p").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = conf.where(F.col("_t") == F.col("_p")).select(
        F.col("_t").alias("label"), F.col("n").alias("tp")
    )
    rep = (
        by_true.join(by_pred, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true")).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return rep.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
