"""Token-budget domain-mixture sampling (DoReMi / Pile-style mixing).

The reference engine has no corpus-selection surface; this extends the
curation family (SURVEY §2.9) with the step every pretraining-data
pipeline runs after dedup + quality filtering: given target mixture
weights over a domain column ("web 60%, code 25%, books 15%") and a
TOTAL token budget, select documents per domain — deterministically —
until each domain's token share is met.

Semantics (exact, engine-portable, oracle-checked):

* each domain ``d`` gets ``target_d = weights[d] / sum(weights) *
  total_tokens`` tokens;
* within a domain, documents are ordered by ``(split_hash(id, seed),
  id)`` — the same md5-derived uniform order the split/quota operators
  use, so selection is stable under reruns, repartitioning, and
  appends;
* a document is kept iff the EXCLUSIVE prefix sum of token counts
  before it (in that order) is ``< target_d`` — i.e. take documents
  until the budget is crossed, keeping the crossing document, so any
  positive target selects at least one document;
* token count is the corpus convention ``size(split(text, ' +'))``
  (whitespace tokens, empty string counts 1 — matching
  ``textstats.token_counts``), or a caller-supplied numeric column.

Scale design — distributed threshold selection, NOT a per-domain
global sort. A per-domain cumulative-sum window would sort each
domain's entire row set in one partition chain; at 100 TB a "web"
domain is most of the corpus. Instead:

1. bucket every row by the TOP bits of its selection hash
   (``bucket = floor(hash * n_buckets)`` — monotone in the hash, so
   bucket order refines hash order);
2. ONE combinable aggregate computes per-(domain, bucket) token sums —
   a frame of at most ``|domains| * n_buckets`` rows;
3. a window over that TINY frame finds each domain's boundary bucket
   ``b*`` (the bucket where the running total crosses the target) and
   the budget remaining when it starts;
4. rows in buckets ``< b*`` are kept OUTRIGHT (a broadcast join +
   filter — no sort, no window, no shuffle of the corpus);
   rows in bucket ``> b*`` are dropped outright;
5. only the single boundary bucket per domain — expected corpus
   fraction ``1 / n_buckets`` — flows through the exact cumulative-sum
   window.

So the full-corpus cost is one scan + one map-side-combinable
aggregate + one broadcast filter; the exact sort touches ~0.002% of
rows at the default ``n_buckets=2^16``. The result is IDENTICAL to
the naive per-domain window (the oracle runs the naive form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cminer_spark.pipeline.curation import split_hash

__all__ = ["mixture_sample"]


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    seed: int = 0,
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """Select documents to hit ``total_tokens`` at the given mixture.

    ``weights`` maps domain values to non-negative target weights
    (normalized internally); domains absent from ``weights`` are
    dropped. Returns the kept rows as ``(<id_col>, <domain_col>,
    n_tokens)`` plus a ``sel_rank`` column (1-based position in the
    domain's selection order) for auditability.
    """
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of >= 0")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    targets = [
        (str(d), float(total_tokens) * float(w) / wsum)
        for d, w in sorted(weights.items())
    ]
    spark = docs.sparkSession
    tgt = spark.createDataFrame(targets, f"{domain_col} string, _target double")

    ntok = (
        F.col(token_col).cast("double")
        if token_col is not None
        else F.size(F.split(F.col(text_col), " +")).cast("double")
    )
    h = split_hash(id_col, seed)
    base = (
        docs.join(F.broadcast(tgt), domain_col, "inner")
        .select(
            F.col(id_col),
            F.col(domain_col),
            ntok.alias("n_tokens"),
            h.alias("_h"),
            F.floor(h * F.lit(float(n_buckets))).cast("long").alias("_b"),
            "_target",
        )
    )

    # per-(domain, bucket) token sums -> tiny frame (<= |domains| *
    # n_buckets rows); the running total, each bucket's state, and the
    # rows-before count all come from ONE window over that frame.
    # States: a bucket whose exclusive running total already meets the
    # target is 'drop' (every row's exclusive prefix >= target); one
    # whose INCLUSIVE total is still under is 'keep' (every row's
    # exclusive prefix < target); the single crossing bucket per domain
    # is 'boundary' and gets the exact row-level treatment.
    rank_w = Window.partitionBy(domain_col).orderBy("_b")
    marked = (
        base.groupBy(domain_col, "_b", "_target")
        .agg(F.sum("n_tokens").alias("_bt"), F.count(F.lit(1)).alias("_bn"))
        .withColumn("_before", F.sum("_bt").over(rank_w) - F.col("_bt"))
        .withColumn(
            "_state",
            F.when(F.col("_before") >= F.col("_target"), F.lit("drop"))
            .when(
                F.col("_before") + F.col("_bt") < F.col("_target"),
                F.lit("keep"),
            )
            .otherwise(F.lit("boundary")),
        )
        .withColumn("_rows_before", F.sum("_bn").over(rank_w) - F.col("_bn"))
        .select(domain_col, "_b", "_before", "_state", "_rows_before")
    )

    joined = base.join(
        F.broadcast(marked), [domain_col, "_b"], "inner"
    ).where(F.col("_state") != "drop")

    kept_whole = joined.where(F.col("_state") == "keep")

    # exact window ONLY inside boundary buckets (tiny fraction of rows)
    bw_rows = (
        Window.partitionBy(domain_col, "_b")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary = (
        joined.where(F.col("_state") == "boundary")
        .withColumn(
            "_excl",
            F.col("_before")
            + F.sum("n_tokens").over(bw_rows)
            - F.col("n_tokens"),
        )
        .where(F.col("_excl") < F.col("_target"))
        .drop("_excl")
    )

    out = kept_whole.unionByName(boundary)
    # sel_rank = position in the domain's (hash, id) selection order.
    # The kept set is a PREFIX of that order, so the rank decomposes as
    # rows-in-earlier-buckets (from the tiny bucket frame) + the rank
    # WITHIN the row's own bucket — per-(domain, bucket) windows, never
    # a per-domain sort of the whole kept set.
    in_bucket = Window.partitionBy(domain_col, "_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return out.select(
        id_col,
        domain_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("_rows_before") + F.row_number().over(in_bucket))
        .cast("long")
        .alias("sel_rank"),
    )
