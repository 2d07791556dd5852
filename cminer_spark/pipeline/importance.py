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

* each side's bucket histogram is ONE combinable count aggregate
  (map-side partial, keyed on the bucket int — uniform by
  construction, no skew);
* the fitted model is exactly ``n_buckets`` rows, so scoring joins it
  with an explicit ``broadcast()`` — the corpus side never shuffles
  for the lookup; the only wide exchange is the per-doc sum, keyed by
  doc id;
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


def _grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, g): unigram + bigram occurrence stream, '' filtered."""
    toks = F.split(F.lower(F.col(text_col)), " +")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
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
    return base.select(
        "doc_id", F.explode(F.concat(F.col("toks"), big)).alias("g")
    )


def _bucket(col, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _bucket_logprob(grams: DataFrame, n_buckets: int, name: str) -> DataFrame:
    """(b, ln_<name>): add-one-smoothed log prob of every bucket."""
    counts = grams.groupBy(_bucket(F.col("g"), n_buckets).alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    total = counts.select(F.sum("c").alias("n"))
    return (
        grams.sparkSession.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(counts, "b", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "b",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("n") + F.lit(float(n_buckets)))
            ).alias(f"ln_{name}"),
        )
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
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    lw = (
        _bucket_logprob(_grams(target, id_col, text_col), n_buckets, "t")
        .join(
            _bucket_logprob(_grams(docs, id_col, text_col), n_buckets, "r"),
            "b",
        )
        .select("b", (F.col("ln_t") - F.col("ln_r")).alias("lw"))
    )
    scored = (
        _grams(docs, id_col, text_col)
        .select("doc_id", _bucket(F.col("g"), n_buckets).alias("b"))
        .join(F.broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lw").alias("w"),
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
