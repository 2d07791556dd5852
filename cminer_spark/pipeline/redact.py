"""PII redaction for training-data curation: detect and mask emails,
SSNs, phone numbers, and IPv4 addresses in a text column.

A standard pre-training scrub pass (the reference engine has no text
pipeline; this extends the repo's curation stack the same way dedup
and decontamination do). Everything is ``regexp_replace`` /
``regexp_count`` — JVM-side, whole-stage codegen, zero Python in the
row path, embarrassingly parallel (no shuffle at all: the scan
partitioning is the execution partitioning, so it runs at any scale
the storage layer can feed).

Pattern notes:

* Patterns are deliberately restricted to the syntax subset where
  Java regex (Spark) and RE2 (DuckDB/Go — the oracle engine) agree:
  no backreferences, no lookaround, ASCII ``\\d`` classes, ``\\b``
  word boundaries. That keeps the operator oracle-checkable and the
  semantics portable.
* Replacement is applied in a fixed documented order (email → ssn →
  phone → ipv4); per-kind match counts are computed on the ORIGINAL
  text, so counts are order-independent.
* Null text propagates: redacted text and all counts stay null
  (SQL semantics, identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — order matters for replacement.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]

__all__ = ["PII_PATTERNS", "redact_pii", "redact_sql_exprs"]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
) -> DataFrame:
    """Append ``{text_col}_redacted``, one ``n_<kind>`` count per PII
    kind, and ``n_pii`` (their sum) to ``docs``.

    ``kinds`` restricts detection to a subset of
    :data:`PII_PATTERNS` keys (default: all, in canonical order).
    """
    pats = [p for p in PII_PATTERNS if kinds is None or p[0] in kinds]
    if kinds is not None:
        missing = set(kinds) - {k for k, _, _ in pats}
        if missing:
            raise ValueError(f"unknown PII kinds: {sorted(missing)}")
    out = docs
    red = F.col(text_col)
    total = F.lit(0)
    for kind, pat, repl in pats:
        cnt = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"n_{kind}", cnt)
        total = total + cnt
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(f"{text_col}_redacted", red).withColumn(
        "n_pii", total
    )


def redact_sql_exprs(
    text_expr: str = "text",
) -> tuple[str, list[tuple[str, str]]]:
    """The oracle-side DuckDB SQL for the same redaction: returns
    ``(redacted_expr, [(kind, count_expr)])`` built from the same
    pattern table, so gate and oracle can never drift."""
    red = text_expr
    counts = []
    for kind, pat, repl in PII_PATTERNS:
        esc = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{esc}', '{repl}', 'g')"
        counts.append(
            (kind, f"len(regexp_extract_all({text_expr}, '{esc}'))")
        )
    return red, counts
