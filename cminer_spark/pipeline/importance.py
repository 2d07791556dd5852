"""DSIR-style hashed n-gram importance weights for data selection.

Data Selection via Importance Resampling (Xie et al. 2023): score
every raw document by how much more likely its hashed n-gram bag is
under a TARGET distribution (e.g. a curated high-quality corpus) than
under the RAW distribution, then keep/resample by the weight. The
standard pretraining-corpus curation step between quality filtering
and mixture sampling.

Model: unigrams + bigrams, hashed into ``n_buckets`` via the
engine-portable md5-prefix bucket (the same idiom the dedup/curation
family uses — ``conv(substr(md5(g),1,8),16,10) % n_buckets``), with
add-one smoothing over the bucket vocabulary:

    lw(b)  = ln p_target(b) - ln p_raw(b)
    w(doc) = sum over gram occurrences g in doc of lw(bucket(g))

Spark-first scale shape (100 TB corpus, small target):

* each histogram is ONE combinable count aggregate keyed on the
  bucket int (uniform by construction, no skew; map-side partials
  collapse every task to ≤ ``n_buckets`` rows before the shuffle)
  over the text column alone — a target corpus needs no doc-id
  column;
* scoring reduces the corpus to per-(doc, bucket) counts — one
  combinable aggregate keyed on (doc_id, bucket) — then sums
  ``c · lw`` per document;
* the fitted model is at most ``n_buckets`` rows and its totals come
  from single-partition windows over the histograms (never a
  self-join back into a corpus subtree), so the model costs no extra
  corpus pass and scoring joins it with an explicit ``broadcast()``
  — the corpus side never shuffles for the lookup;
* everything is built-in expressions (split / slice / arrays_zip /
  md5 / conv) — zero Python in the hot path.

No reference counterpart (CMiner has no text pipeline); this extends
the task-brief training-data operator family alongside quality
scoring and mixture sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["importance_weights"]


def _grams(
    docs: DataFrame, id_col: str | None, text_col: str
) -> DataFrame:
    """Unigram + bigram occurrence stream, '' filtered: ``(doc_id, g)``
    — or just ``(g)`` when ``id_col`` is None (histogram sides need no
    document identity, so a target corpus may be a bare text table)."""
    toks = F.split(F.lower(F.col(text_col)), " +")
    ids = [F.col(id_col).alias("doc_id")] if id_col is not None else []
    base = docs.select(
        *ids,
        F.filter(toks, lambda t: t != "").alias("toks"),
    )
    big = F.transform(
        F.arrays_zip(
            F.slice(
                F.col("toks"),
                1,
                F.greatest(F.size("toks") - 1, F.lit(0)),
            ),
            F.slice(
                F.col("toks"),
                2,
                F.greatest(F.size("toks") - 1, F.lit(0)),
            ),
        ),
        lambda p: F.concat(p["0"], F.lit(" "), p["1"]),
    )
    keep = ["doc_id"] if id_col is not None else []
    return base.select(
        *keep, F.explode(F.concat(F.col("toks"), big)).alias("g")
    )


def _bucket(col, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _log_ratio_model(
    raw_counts: DataFrame, tgt_counts: DataFrame, n_buckets: int
) -> DataFrame:
    """(b, lw): add-one-smoothed log-likelihood-ratio model over the
    union of observed buckets.

    Each total comes from a single-partition window over the tiny
    (≤ ``n_buckets``-row) joined histogram — NOT a self-join back to
    the counts, which would re-evaluate the corpus-sized histogram
    subtree a second time per action (plan-level exchange reuse does
    not survive the asymmetric predicate pushdown between the
    branches, so the only robust way to keep the corpus pass count
    down is to reference each corpus subtree once). Buckets observed
    in neither side are omitted: scoring joins on raw-observed
    buckets only, and raw-observed buckets are always present here,
    so the omission is invisible downstream while sparing the
    all-buckets ``range`` scaffold. Totals are exact integer sums, so
    the smoothed doubles are bit-identical to an occurrence-level
    model."""
    from pyspark.sql import Window

    j = raw_counts.select("b", F.col("c").alias("rc")).join(
        tgt_counts.select("b", F.col("c").alias("tc")), "b", "full"
    )
    w = Window.partitionBy()
    rc = F.coalesce(F.col("rc"), F.lit(0))
    tc = F.coalesce(F.col("tc"), F.lit(0))
    nb = F.lit(float(n_buckets))
    return j.select(
        "b",
        (
            F.log((tc + F.lit(1.0)) / (F.sum(tc).over(w) + nb))
            - F.log((rc + F.lit(1.0)) / (F.sum(rc).over(w) + nb))
        ).alias("lw"),
    )


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``docs`` against the ``target`` distribution.

    Returns one row per input document: ``(doc_id, n_grams long,
    logweight double)`` — ``logweight`` is the summed hashed-n-gram
    log-likelihood ratio (rounded to 6 dp; higher = more target-like),
    0.0 for token-less documents (``n_grams = 0``), so no document
    silently vanishes from a keep/resample decision.

    ``target`` only needs ``text_col`` (histogram sides never use
    document identity); ``docs`` needs ``id_col`` + ``text_col``.

    Each action runs exactly three wide passes: the raw corpus is
    reduced twice (once to the bucket histogram for the model, once to
    per-(doc, bucket) counts for scoring — the model must be complete
    before scoring, so two passes is the lazy minimum) and the target
    once; the model math then stays on ≤ ``n_buckets``-row frames
    (window-based totals, no self-joins back into corpus subtrees).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    doc_buckets = (
        _grams(docs, id_col, text_col)
        .select("doc_id", _bucket(F.col("g"), n_buckets).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    raw_counts = (
        _grams(docs, None, text_col)
        .groupBy(_bucket(F.col("g"), n_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tgt_counts = (
        _grams(target, None, text_col)
        .groupBy(_bucket(F.col("g"), n_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lw = _log_ratio_model(raw_counts, tgt_counts, n_buckets)
    scored = (
        doc_buckets.join(F.broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lw")).alias("w"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias(
                "n_grams"
            ),
            F.round(F.coalesce(F.col("w"), F.lit(0.0)), 6).alias(
                "logweight"
            ),
        )
    )
