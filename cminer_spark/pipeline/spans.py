"""Exact-substring duplicate-span detection (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better") for
large-scale training corpora.

Document- and line-level dedup (``dedup.py``, ``lines.py``) miss the
third duplication mode web corpora carry: long verbatim passages
embedded inside otherwise-distinct documents (quoted articles, license
blocks, templated product text). The published cure finds every
substring of >= N tokens that occurs more than once in the corpus and
removes/flags those spans. The reference engine
(`/root/reference/src/CMiner`) has no text operators at all — this
extends the repo's training-data stack alongside its MinHash/SimHash
document dedup.

Spark-first plan (no suffix arrays, no per-row Python):

1. tokenize once per doc (JVM ``split``) and enumerate rolling
   ``n``-token gram hashes via a higher-order ``transform`` over the
   token array — zero shuffles, zero explode until the gram frame;
2. one ``groupBy(gram)`` hash-aggregate finds grams occurring
   >= ``min_count`` times corpus-wide (partial aggregation map-side;
   this is THE shuffle, and it's the same shape as exact dedup);
3. a semi equi-join marks each doc's duplicated gram start positions
   (bucketable, never all-pairs);
4. per-doc maximal spans come from folding the SORTED start-position
   array with ``aggregate`` (overlap-or-adjacent intervals merge) —
   per-doc array work, no window shuffle beyond the doc groupBy.

At 100 TB: the gram aggregate dominates; gram keys are md5 strings
here for DuckDB-oracle portability — switch ``gram_hash='xxhash64'``
for production (8-byte longs, ~3x less shuffle IO, same plan). The
interval fold copies the span accumulator per element (quadratic in
spans-per-doc), which is bounded by doc length; for pathological
million-token docs use a window-function variant instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["duplicate_spans", "span_dup_stats", "strip_duplicate_spans"]


def _gram_starts(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    gram_hash: str,
) -> DataFrame:
    """(doc_id, start, gram): one row per rolling n-gram, start is the
    1-indexed token position. Docs shorter than n tokens contribute
    nothing."""
    if gram_hash == "md5":
        hash_fn = "md5"
    elif gram_hash == "xxhash64":
        hash_fn = "xxhash64"
    else:
        raise ValueError("gram_hash must be 'md5' or 'xxhash64'")
    toks = F.split(F.lower(F.col(text_col)), " +")
    # SQL-expr form: the gram hash needs the loop variable inside a
    # function call chain, which reads cleaner than nested Column
    # lambdas and matches the oracle SQL one-to-one
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> {hash_fn}(concat_ws(' ', slice(toks, i, {n}))))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .where(F.size("toks") >= n)
        .select("doc_id", F.posexplode(grams).alias("pos", "gram"))
        .select(
            "doc_id", (F.col("pos") + 1).cast("int").alias("start"), "gram"
        )
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_hash: str = "md5",
) -> DataFrame:
    """Maximal duplicated token intervals per document:
    ``(doc_id, span_start int, span_end int, span_tokens bigint)``.

    A token position is *duplicated* when it is covered by an
    ``n``-token gram that occurs >= ``min_count`` times corpus-wide
    (within-doc repeats count — a doc repeating its own paragraph is a
    duplicate source too, per the published definition). Overlapping
    or adjacent covered intervals merge into maximal spans;
    ``span_start``/``span_end`` are 1-indexed inclusive token
    positions under the corpus tokenization (lowercase, split on
    runs of spaces).
    """
    g = _gram_starts(docs, n, id_col, text_col, gram_hash)
    dup = (
        g.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("gram")
    )
    starts = (
        g.join(dup.hint("shuffle_hash"), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("start")).alias("ss"))
    )
    spans = F.expr(
        f"""
        aggregate(
          ss,
          CAST(array() AS array<struct<s:int,e:int>>),
          (acc, p) -> CASE
            WHEN size(acc) > 0 AND p <= element_at(acc, -1).e + 1
            THEN concat(
              slice(acc, 1, size(acc) - 1),
              array(named_struct(
                's', element_at(acc, -1).s,
                'e', CAST(p + {n - 1} AS INT))))
            ELSE concat(acc, array(named_struct(
              's', p, 'e', CAST(p + {n - 1} AS INT))))
          END
        )
        """
    )
    return (
        starts.select("doc_id", F.explode(spans).alias("sp"))
        .select(
            "doc_id",
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
            (F.col("sp.e") - F.col("sp.s") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    min_count: int = 2,
    keep: str = "first",
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_hash: str = "md5",
) -> DataFrame:
    """Rewrite the corpus with duplicated spans removed:
    ``(doc_id, text_clean string, n_removed bigint)`` — every doc
    appears; untouched docs pass through with ``n_removed = 0``.

    Policies (span = a maximal interval from :func:`duplicate_spans`):

    * ``keep='none'`` — remove every duplicated span everywhere (the
      aggressive boilerplate-scrub; no copy survives).
    * ``keep='first'`` — the globally first occurrence (smallest
      ``(doc_id, span_start)``) of each exact span CONTENT survives,
      later copies are removed — one copy of each duplicated passage
      stays in the corpus, the published dedup policy. Content
      granularity is the merged maximal span: a span whose merged
      extent produces content no other doc reproduces exactly keeps
      its (unique) first occurrence, i.e. survives.

    The survivor choice is a combinable ``min(struct(doc_id, start))``
    per content hash — deliberately no per-key sort window, so a
    million-copy passage cannot create a skewed sort (same design as
    ``lines.line_dedup``). Token rebuild is a per-doc higher-order
    filter; nothing leaves the doc's row.
    """
    if keep not in ("first", "none"):
        raise ValueError("keep must be 'first' or 'none'")
    toks = F.split(F.lower(F.col(text_col)), " +")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    )
    spans = duplicate_spans(
        docs, n, min_count, id_col, text_col, gram_hash
    ).join(base, "doc_id")
    spans = spans.withColumn(
        "span_hash",
        F.expr("md5(concat_ws(' ', slice(toks, span_start, "
               "span_end - span_start + 1)))"),
    ).select("doc_id", "span_start", "span_end", "span_tokens", "span_hash")
    if keep == "first":
        firsts = spans.groupBy("span_hash").agg(
            F.min(F.struct("doc_id", "span_start")).alias("f")
        )
        removals = spans.join(
            firsts.hint("shuffle_hash"), "span_hash"
        ).where(
            ~(
                (F.col("doc_id") == F.col("f.doc_id"))
                & (F.col("span_start") == F.col("f.span_start"))
            )
        )
    else:
        removals = spans
    rm = removals.groupBy("doc_id").agg(
        F.collect_list(F.struct(
            F.col("span_start").alias("s"), F.col("span_end").alias("e")
        )).alias("rm"),
        F.sum("span_tokens").alias("n_removed"),
    )
    return (
        base.join(rm, "doc_id", "left")
        .withColumn(
            "kept",
            F.expr(
                "CASE WHEN rm IS NULL THEN toks ELSE "
                "transform(filter(zip_with(toks, sequence(1, size(toks)),"
                " (t, i) -> named_struct('t', t, 'i', i)),"
                " x -> NOT exists(rm, sp -> x.i >= sp.s AND x.i <= sp.e)),"
                " x -> x.t) END"
            ),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("kept")).alias("text_clean"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def span_dup_stats(
    docs: DataFrame,
    n: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_hash: str = "md5",
) -> DataFrame:
    """Per-doc duplicated-content summary for filter rules:
    ``(doc_id, n_tokens bigint, dup_tokens bigint, dup_frac double)``.
    Every doc appears (zero rows never drop a doc from a curation
    decision); ``dup_tokens`` sums the maximal spans from
    :func:`duplicate_spans` so overlapping grams are not
    double-counted."""
    toks = F.split(F.lower(F.col(text_col)), " +")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    per_doc = (
        duplicate_spans(docs, n, min_count, id_col, text_col, gram_hash)
        .groupBy("doc_id")
        .agg(F.sum("span_tokens").alias("dup_tokens"))
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest("n_tokens", F.lit(1)),
            6,
        ).alias("dup_frac"),
    )
