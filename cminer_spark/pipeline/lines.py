"""Line-level deduplication (C4 / RefinedWeb-style boilerplate
removal) for large-scale training corpora.

Web text carries massive *line-level* duplication that document-level
dedup never sees: navigation menus, cookie banners, license footers
repeated across millions of otherwise-distinct pages. The standard
cure (C4; RefinedWeb "line-wise corrections") deduplicates at line
granularity and reassembles the documents.

Two policies, both exact:

* **global** (``keep_first=False``): any line occurring in at least
  ``min_dup_docs`` distinct documents is boilerplate — remove *every*
  occurrence corpus-wide (C4's "citation needed"/boilerplate rule).
* **keep-first** (``keep_first=True``): keep only the first
  occurrence of each duplicated line — first = smallest
  ``(doc_id, line position)`` — and drop the rest (RefinedWeb /
  Dolma-style exact line dedup).

Scale design (the 100 TB path):

* Lines are keyed by ``md5(trim(line))`` — counting and joining is
  always hash-on-digest, never string-on-string.
* The global policy is one hash-aggregate (``count(distinct doc)``
  per key is map-side combinable, so a line with 10^9 copies costs
  its partition count, not a skewed reducer) plus one anti-join of
  occurrences against the boilerplate keys (broadcastable when the
  boilerplate set is small, which it is by definition: keys with
  ``>= min_dup_docs`` docs are the heavy tail's head).
* The keep-first policy deliberately avoids a per-key sort window
  (a mega-duplicated line would sort 10^9 rows inside one
  partition): the first occurrence is ``min(struct(doc_id, pos))``
  per key — a combinable aggregate — joined back on the key.
* Reassembly is one groupBy per document over ``(pos, line)``
  structs; document order is restored with ``sort_array``, never a
  window.

Everything is JVM-side codegen (split/explode/md5/aggregate); no
Python in the path. The DuckDB gate oracle replicates the exact
semantics (same md5 keys, same tie-breaks) — see
``gate_pipeline.line_dedup_oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["line_dedup"]


def _occurrences(
    docs: DataFrame, id_col: str, text_col: str, min_line_chars: int
) -> DataFrame:
    """One row per (doc, line position): the exploded line table.

    ``key`` is md5 of the trimmed line for lines long enough to
    participate in dedup, NULL for exempt (shorter) lines — exempt
    lines are always kept, so empty lines never become "the most
    duplicated line in the corpus".
    """
    lines = F.split(F.col(text_col), "\n")
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(lines).alias("pos", "line"),
    )
    trimmed = F.trim(F.col("line"))
    return occ.withColumn(
        "key",
        F.when(F.length(trimmed) >= min_line_chars, F.md5(trimmed)),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup_docs: int = 2,
    keep_first: bool = False,
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove duplicated lines across the corpus and reassemble docs.

    Returns one row per input document:
    ``(doc_id, text_clean, n_lines, n_lines_kept)`` where
    ``text_clean`` is the document with dropped lines removed (line
    order preserved; ``''`` if nothing survives) and
    ``n_lines`` / ``n_lines_kept`` count lines before/after.

    ``min_dup_docs``: a line must appear in at least this many
    distinct documents to count as duplicated (global policy removes
    all its occurrences; keep-first keeps exactly one).
    ``min_line_chars``: trimmed lines shorter than this are exempt
    (always kept) — they carry no dedup signal.
    """
    if min_dup_docs < 2:
        raise ValueError(f"min_dup_docs must be >= 2, got {min_dup_docs}")
    occ = _occurrences(docs, id_col, text_col, min_line_chars)

    # Keys duplicated across >= min_dup_docs distinct docs. Partial
    # aggregation collapses per-partition copies first, so corpus-wide
    # mega-lines cost no skewed reducer. The keep-first policy also
    # needs each duplicated key's first occurrence — a combinable
    # min(struct), aggregated only when that policy asks for it.
    aggs = [F.countDistinct("doc_id").alias("n_docs")]
    if keep_first:
        aggs.append(F.min(F.struct("doc_id", "pos")).alias("first_occ"))
    dup_keys = (
        occ.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(*aggs)
        .where(F.col("n_docs") >= min_dup_docs)
        .drop("n_docs")
    )

    if keep_first:
        # Drop an occurrence iff its key is duplicated AND it is not
        # the corpus-first (min (doc_id, pos)) occurrence.
        marked = occ.join(dup_keys, "key", "left")
        kept = marked.where(
            F.col("first_occ").isNull()
            | (F.struct("doc_id", "pos") == F.col("first_occ"))
        )
    else:
        kept = occ.join(dup_keys, "key", "left_anti")

    surv = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(surv, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.coalesce("n_lines_kept", F.lit(0))
            .cast("long")
            .alias("n_lines_kept"),
        )
    )
