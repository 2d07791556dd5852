"""Johnson-Lindenstrauss random projection for embedding columns.

Sign (Achlioptas) random projection: ``y_j = (1/√k) Σ_i s_ij · x_i``
with ``s_ij ∈ {±1}`` — the standard distance-preserving dimension
reduction in front of ANN / clustering when the stored dimension is
larger than the search needs (JL: pairwise distances preserved within
(1±ε) for k = O(log n / ε²)). Composes with the rest of the embedding
toolkit: project → :mod:`quantize` → LSH/IVF.

Engine-portable determinism: the sign matrix is derived from
``md5(i _ j _ seed)`` hex (first nibble < '8' ⇒ +1) — identical on
Spark and DuckDB, so the oracle recomputes the projection exactly
(DuckDB lambda indexes are 1-based; the oracle shifts accordingly).
Pure ``transform``/``aggregate`` array expressions: no shuffle, no
Python, k·d multiply-adds per row in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["random_projection", "projection_sign_sql"]

_PLUS = ("0", "1", "2", "3", "4", "5", "6", "7")


def _sign(i: F.Column, j: int, seed: int) -> F.Column:
    h = F.md5(
        F.concat_ws("_", i.cast("string"), F.lit(str(j)), F.lit(str(seed)))
    )
    return F.when(F.substring(h, 1, 1).isin(*_PLUS), F.lit(1.0)).otherwise(
        F.lit(-1.0)
    )


def random_projection(
    embs: DataFrame,
    out_dim: int,
    col: str = "embedding",
    seed: int = 42,
    out_col: str = "projected",
) -> DataFrame:
    """Append ``out_col`` (array<double>, length ``out_dim``)."""
    x = F.col(col)
    norm = F.lit(float(out_dim) ** 0.5)
    # NB: a two-parameter lambda in F.transform means (element, index)
    # — a default-arg closure (lambda i, jj=j: ...) silently receives
    # the INDEX as jj. Build the single-arg lambda via a factory.
    def _signs_for(jj: int):
        return lambda i: _sign(i, jj, seed)

    comps = []
    for j in range(out_dim):
        signs = F.transform(
            F.sequence(F.lit(0), F.size(x) - 1), _signs_for(j)
        )
        dot = F.aggregate(
            F.zip_with(x, signs, lambda a, s: a.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        comps.append(dot / norm)
    return embs.withColumn(out_col, F.array(*comps))


def projection_sign_sql(i_expr: str, j: int, seed: int) -> str:
    """DuckDB mirror of the sign derivation (``i_expr`` must already
    be 0-based)."""
    return (
        f"CASE WHEN substring(md5(CAST({i_expr} AS VARCHAR) || '_' || "
        f"'{j}' || '_' || '{seed}'), 1, 1) IN "
        "('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END"
    )
