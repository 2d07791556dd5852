"""Mining-solution re-verification and solution-set comparison.

The reference completes its test-strategy triangle with two tools the
engine itself should expose:

* an independent support re-check of every mined pattern
  (reference ``test/checker.py:57-125`` — re-runs a matcher per
  solution block and diffs claimed vs actual support), and
* a cross-tool solution-set diff
  (reference ``test/comparator.py:8-110`` — aligns two solution files
  by graph-isomorphic pattern and compares supports).

Both operate on the ``t/v/e/s/f[/x]`` solution text the result sink
(:func:`cminer_spark.sources.data_format.write_patterns_text`) emits,
so a written solution file round-trips straight into verification.

Scale shape: the SOLUTION SET is small (frequent patterns — hundreds,
not billions), so parsing is driver-side like the reference; each
re-verification is a fully distributed :func:`match` + one aggregate
over the (arbitrarily large) transactional DB — the same per-pattern
job structure the mining loop itself uses. Nothing data-sized ever
lands on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cminer_spark.operators.matching import Pattern, match
from cminer_spark.operators.mining import canonical_code

__all__ = [
    "Solution",
    "parse_solutions_text",
    "verify_solutions",
    "compare_solutions",
]


@dataclass
class Solution:
    pattern_id: str
    pattern: Pattern
    support: int
    frequency: int | None = None


def parse_solutions_text(text: str) -> list[Solution]:
    """Parse result-sink ``t/v/e/s/f[/x]`` blocks (the exact format
    :func:`write_patterns_text` / ``pattern_block_text`` emit,
    reference ``CMiner.py:418-446``) into :class:`Solution` rows.
    ``x`` info lines are ignored (per-graph counts are re-derivable)."""
    sols: list[Solution] = []
    cur_id: str | None = None
    pat: Pattern | None = None
    sup: int | None = None
    freq: int | None = None

    def flush() -> None:
        nonlocal cur_id, pat, sup, freq
        if cur_id is not None and pat is not None and sup is not None:
            sols.append(Solution(cur_id, pat, sup, freq))
        cur_id, pat, sup, freq = None, None, None, None

    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        toks = line.split()
        if toks[0] == "t":
            flush()
            cur_id = toks[-1] if len(toks) > 1 else str(len(sols))
            pat = Pattern()
        elif toks[0] == "v" and pat is not None:
            pat.add_node(toks[1], toks[2:])
        elif toks[0] == "e" and pat is not None:
            pat.add_edge(toks[1], toks[2], toks[3] if len(toks) > 3 else "")
        elif toks[0] == "s":
            sup = int(toks[1])
        elif toks[0] == "f":
            freq = int(toks[1])
        # 'x' per-graph info lines: skipped
    flush()
    return sols


def _as_solutions(solutions) -> list[Solution]:
    if isinstance(solutions, str):
        return parse_solutions_text(solutions)
    if isinstance(solutions, DataFrame):
        # a write_patterns_text frame / spark.read.text of a solution
        # file — one block (or line) per row; tiny by contract
        return parse_solutions_text(
            "\n".join(r[0] for r in solutions.collect() if r[0] is not None)
        )
    return list(solutions)


def verify_solutions(
    vertices: DataFrame,
    edges: DataFrame,
    solutions,
    graph_col: str = "graph_id",
) -> DataFrame:
    """Independently re-verify a mined solution set against its DB
    (reference ``test/checker.py:57-125``): for each claimed pattern,
    re-run the matcher from scratch and recompute transactional
    support (#distinct graphs) and frequency (#multigraph embeddings,
    the mining loop's own grain).

    ``solutions``: solution text (str), a one-column text DataFrame
    (``write_patterns_text`` output or ``spark.read.text`` of a
    solution file), or an iterable of :class:`Solution`.

    Returns ``(pattern_id, claimed_support, actual_support,
    support_ok, claimed_frequency, actual_frequency, frequency_ok)``
    — one row per solution; a corrupted solution file shows up as
    ``support_ok = false`` rows, never as a silent pass.
    """
    sols = _as_solutions(solutions)
    spark = vertices.sparkSession
    rows = []
    for s in sols:
        emb = match(
            s.pattern,
            edges,
            vertices,
            graph_col=graph_col,
            include_edges=True,
        )
        st = emb.agg(
            F.countDistinct(graph_col).alias("sup"),
            F.count(F.lit(1)).alias("freq"),
        ).collect()[0]
        a_sup, a_freq = int(st["sup"]), int(st["freq"])
        rows.append(
            (
                s.pattern_id,
                int(s.support),
                a_sup,
                int(s.support) == a_sup,
                None if s.frequency is None else int(s.frequency),
                a_freq,
                None if s.frequency is None else int(s.frequency) == a_freq,
            )
        )
    return spark.createDataFrame(
        rows,
        "pattern_id string, claimed_support long, actual_support long, "
        "support_ok boolean, claimed_frequency long, actual_frequency long, "
        "frequency_ok boolean",
    )


def compare_solutions(a, b) -> list[dict]:
    """Cross-tool solution-set diff (reference
    ``test/comparator.py:8-110``): align two solution sets by EXACT
    canonical pattern code (graph-isomorphic alignment — node naming
    and emission order do not matter) and compare supports.

    ``a`` / ``b`` as in :func:`verify_solutions`. Returns one dict per
    distinct canonical code:
    ``{code, in_a, in_b, support_a, support_b, support_match}`` —
    driver-side by design (solution sets are tiny).
    """
    sa = {canonical_code(s.pattern): s for s in _as_solutions(a)}
    sb = {canonical_code(s.pattern): s for s in _as_solutions(b)}
    out = []
    for code in sorted(set(sa) | set(sb)):
        xa, xb = sa.get(code), sb.get(code)
        out.append(
            {
                "code": code,
                "in_a": xa is not None,
                "in_b": xb is not None,
                "support_a": None if xa is None else xa.support,
                "support_b": None if xb is None else xb.support,
                "support_match": (
                    xa is not None
                    and xb is not None
                    and xa.support == xb.support
                ),
            }
        )
    return out
