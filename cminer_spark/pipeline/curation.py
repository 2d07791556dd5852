"""Corpus curation operators: deterministic train/held-out splits,
per-group quota sampling (data mixing), and n-gram decontamination
against an evaluation set.

The selection layer of a training-data pipeline: AFTER dedup/quality
filtering, decide which documents go to which split, how many to take
from each source, and which to drop because they overlap a benchmark.

Scale design:

* **Splits are a pure expression** — a doc's split is a deterministic
  function of (id, seed) via an md5-derived uniform hash: no shuffle,
  no state, stable across reruns and engines (md5 is bit-identical
  everywhere; xxhash64/murmur implementations are not portable to
  other engines, so the oracle-checked hash is md5).
* **Quota sampling is one window per group** — rank by the same
  deterministic hash, keep ``n`` — a single hash-partitioned sort per
  group, no driver-side sampling state. Reproducible "take 1M docs
  per source" mixing.
* **Decontamination is a hash equi-join, never text × text** — both
  sides reduce to distinct n-gram hashes (the contaminated-set side
  is usually a small benchmark → broadcast); a left-semi join marks
  contaminated docs. O(|corpus tokens| + |eval tokens|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cminer_spark.pipeline.dedup import shingles

__all__ = [
    "split_hash",
    "deterministic_split",
    "quota_sample",
    "decontaminate",
    "normalize_text",
    "normalize_sql_expr",
    "NORMALIZE_STEPS",
]


def split_hash(id_col: str | F.Column, seed: int = 0) -> F.Column:
    """Deterministic uniform hash in [0, 1): the first 8 md5 hex chars
    of ``"<id>:<seed>"`` as an integer / 2^32. Engine-portable (md5 on
    an identical string), so oracle-checkable — unlike xxhash64."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(col.cast("string"), F.lit(f":{int(seed)}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def deterministic_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign each row to a named split with the given weights (must
    sum to ~1.0), as a pure column: rows land in the split whose
    cumulative-weight interval contains their :func:`split_hash`.

    Adds a ``split`` column; membership is stable under re-runs,
    re-partitioning, and incremental appends (a new row never moves an
    old row's split — the property driver-side ``randomSplit`` lacks).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    h = split_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return docs.withColumn("split", expr)


def quota_sample(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic pseudo-random sample of ≤``n`` rows per
    group: rank rows inside each group by :func:`split_hash` (ties by
    id) and keep the first ``n``. The reproducible version of
    "take 1M docs per source" mixing quotas."""
    w = Window.partitionBy(group_col).orderBy(
        split_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_qr", F.row_number().over(w))
        .where(F.col("_qr") <= n)
        .drop("_qr")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    mark_only: bool = False,
) -> DataFrame:
    """Drop (or mark) corpus documents sharing any word ``n``-gram
    with an evaluation set — the standard benchmark-decontamination
    pass (GPT-3 appendix C / PaLM style: 8-gram overlap).

    Both sides reduce to distinct n-gram md5 hashes; the eval side is
    aggregated to unique hashes and broadcast when small. With
    ``mark_only`` the full corpus is returned with a ``contaminated``
    flag; otherwise contaminated docs are dropped.
    """
    eval_grams = (
        eval_docs.select(
            F.explode(shingles(eval_text_col, n)).alias("g")
        )
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("_did"),
        F.explode(shingles(text_col, n)).alias("g"),
    ).select("_did", F.md5("g").alias("gh"))
    hit_ids = (
        doc_grams.join(F.broadcast(eval_grams), "gh", "left_semi")
        .select(F.col("_did"))
        .distinct()
    )
    if mark_only:
        return docs.join(
            hit_ids.withColumnRenamed("_did", id_col).withColumn(
                "contaminated", F.lit(True)
            ),
            id_col,
            "left",
        ).withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    return docs.join(
        hit_ids.withColumnRenamed("_did", id_col), id_col, "left_anti"
    )


NORMALIZE_STEPS = (
    ("controls", r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    ("whitespace", r"\s+", " "),
)


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Canonicalize a text column for dedup/fingerprinting: strip
    control characters, collapse all whitespace runs to single spaces,
    trim, and (optionally) lowercase.

    This is the standard pre-pass in front of ``exact_duplicates`` /
    MinHash / SimHash — without it, trivially-reformatted copies
    (trailing newline, CRLF, double spaces, case) hash apart and
    survive dedup. Pure ``regexp_replace``/``lower`` codegen,
    shuffle-free, and the regex subset is Java∩RE2-portable so the
    gate oracle runs the identical semantics (same policy as
    ``pipeline/redact.py``).
    """
    out = out_col or f"{text_col}_norm"
    c = F.col(text_col)
    for _name, pat, repl in NORMALIZE_STEPS:
        c = F.regexp_replace(c, pat, repl)
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return docs.withColumn(out, c)


def normalize_sql_expr(text_expr: str = "text", lowercase: bool = True) -> str:
    """DuckDB mirror of :func:`normalize_text`, generated from the
    same step table so gate and engine cannot drift."""
    e = text_expr
    for _name, pat, repl in NORMALIZE_STEPS:
        esc = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{esc}', '{repl}', 'g')"
    e = f"trim({e})"
    return f"lower({e})" if lowercase else e
