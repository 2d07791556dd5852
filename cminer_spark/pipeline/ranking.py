"""Keyword ranking over a document corpus: TF-IDF term weights and
BM25 top-k search.

The retrieval layer a training-data pipeline needs next to dedup and
ANN: score documents against keyword queries (BM25) and surface each
document's most characteristic terms (TF-IDF) for tagging/mixing
decisions.

Scale design:

* **Query-as-columns**: ``bm25_search`` treats the short query-term
  list as literal per-term tf column expressions — no token explode,
  no (doc, term) shuffle, no df join. The whole search is two
  columnar scans: one 1-row stats aggregate (N, avgdl, per-term df)
  broadcast into a scoring scan that ends in a TakeOrdered top-k.
  Per-doc scores sum left-to-right over the sorted terms, so float
  totals are deterministic and engine-portable.
* **TF-IDF** is the classic two-aggregate inverted-index build:
  tf over (doc, term) and df over term — two hash shuffles, both
  map-side combined. The per-doc top-k picks via ``slice(sort_array(
  collect_list(...)))`` inside the doc-grain aggregate (bounded by a
  doc's distinct terms), not a global window sort.
* Scores are rounded to 6 places BEFORE ranking with a deterministic
  (score desc, id asc) tie-break, so ranking is reproducible across
  engines (raw float ordering is not portable).
* All pure ``pyspark.sql.functions`` — no Python in the row path.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tfidf_top_terms", "bm25_search"]


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.col(text_col)), " +")


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Returns ``(doc_id, term, tf long, tfidf double, term_rank int)``
    with ``tfidf = tf * ln(N / df)`` (raw counts, corpus-wide df),
    rounded to 6 places; ranking ties break on term ascending.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(text_col)).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).alias("n_docs")
    )  # 1-row broadcast
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    # per-doc top-k inside the doc-grain aggregate: sort (−tfidf, term)
    # ascending → best first, deterministic
    picked = scored.groupBy("doc_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("tfidf")).alias("neg"),
                        F.col("term").alias("term"),
                        F.col("tf").alias("tf"),
                    )
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return picked.select(
        "doc_id",
        F.posexplode("top").alias("pos", "t"),
    ).select(
        "doc_id",
        F.col("t.term").alias("term"),
        F.col("t.tf").alias("tf"),
        (-F.col("t.neg")).alias("tfidf"),
        (F.col("pos") + 1).cast("int").alias("term_rank"),
    )


def bm25_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-``k`` documents for a bag-of-words query.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with the Robertson idf ``ln(1 + (N − df + 0.5)/(df + 0.5))``;
    ``dl`` is the document's token count. Returns ``(doc_id,
    score double, rank int)`` — score rounded to 6 places before
    ranking, ties broken by doc_id ascending; only docs matching ≥1
    query term appear.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = _tokens(text_col)

    # Query terms are a short literal list, so per-term tf is a column
    # expression — no token explode, no (doc, term) shuffle, no join.
    # The whole search is two columnar scans: a 1-row stats aggregate
    # (N, avgdl, per-term df) broadcast into a scoring scan that ends
    # in TakeOrdered. (For bulk scoring of MANY queries use the
    # inverted-index shape — tfidf_top_terms' tf/df aggregates.)
    def _tf_expr(term: str) -> F.Column:
        # NB: closure, not a defaulted lambda arg — a second lambda
        # parameter would make F.filter pass (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *[_tf_expr(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"_tf_{i}") > 0, 1)).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )  # 1-row broadcast

    def _part(i: int) -> F.Column:
        tf = F.col(f"_tf_{i}")
        df = F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + 0.5) / (df + 0.5)
        )
        return F.when(
            tf > 0,
            idf
            * (tf * (k1 + 1))
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))

    # fixed left-to-right summation over the sorted terms — float
    # ordering is deterministic and engine-portable
    total = _part(0)
    for i in range(1, len(terms)):
        total = total + _part(i)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .where(
            reduce(
                lambda a, c: a | c,
                [F.col(f"_tf_{i}") > 0 for i in range(len(terms))],
            )
        )
        .select("doc_id", F.round(total, 6).alias("score"))
    )
    # global top-k: orderBy+limit plans as TakeOrdered (per-partition
    # top-k + driver merge), not a full sort
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                # k rows by this point — the single-partition window is
                # over the already-limited result, not the corpus
                Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            )
            .cast("int"),
        )
    )
