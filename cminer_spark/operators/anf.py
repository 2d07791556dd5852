"""Approximate Neighborhood Function (ANF) and effective diameter.

The neighborhood function N(h) — how many ordered vertex pairs are
within distance h — is the classic whole-graph distance summary for
web-scale link graphs (effective diameter, closeness distribution);
the ANF/HyperANF line of work (Palmer et al. KDD'02; Boldi & Vigna
WWW'11) computes it with per-vertex probabilistic counters whose
union is a cheap bitwise OR. The reference engine has no distance
summaries beyond per-query BFS; this extends the repo's path stack
(`paths.py` has exact BFS / landmark variants).

Two paths, same convention as jaccard / ANN:

* :func:`neighborhood_function_exact` — materializes the reachable
  pair set per hop. Exact, DuckDB-oracle-gateable, O(pairs) storage:
  the verification path, fine up to ~10^7 pairs.
* :func:`anf_sketch` — the 100-TB path. Each vertex carries ``k``
  Flajolet-Martin bitmasks packed into ``k`` LONG columns; one
  superstep is ``groupBy(v).agg(bit_or(m_0) .. bit_or(m_{k-1}))``
  over (state ∪ neighbor messages) — ONE hash shuffle per hop, all
  JVM expressions (bit tricks below), no Python in the row path, no
  per-vertex set materialization ever. State rides the
  :class:`~cminer_spark.plans.checkpoint.EphemeralStateStore` parquet
  double-buffer and the per-hop estimate sum rides the state write
  via ``Observation`` (one job per superstep).

Bit-trick notes (ANSI-safe: ``try_add``/``try_subtract`` + coalesce
instead of overflow-prone ``-x`` / ``x+1`` at LONG_MIN/MAX):

* trailing zeros of hash h (geometric trial):
  ``least(bit_count(~h & (h-1)), 62)`` — ``h-1`` flips exactly the
  trailing zeros, ``~h`` masks everything else.
* least-zero-bit position of mask m (FM estimator R):
  ``t = ~m & (m+1)`` isolates the lowest zero as a power of two;
  position = ``bit_count(t-1)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.plans.checkpoint import EphemeralStateStore
from cminer_spark.plans.loopconf import superstep_conf

__all__ = [
    "neighborhood_function_exact",
    "anf_sketch",
    "effective_diameter",
]

_FM_PHI = 0.77351  # Flajolet-Martin bias correction


def _sym(edges: DataFrame, directed: bool) -> DataFrame:
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    if not directed:
        e = e.union(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    return e.where(F.col("u") != F.col("v")).distinct()


def neighborhood_function_exact(
    edges: DataFrame, max_h: int, directed: bool = False
) -> DataFrame:
    """Exact N(h) for h = 1..max_h: ``(h int, n_pairs long)`` where
    ``n_pairs`` counts ordered pairs (u, v), u != v, dist(u,v) <= h.

    Verification path — materializes the pair frame (O(reachable
    pairs) rows); the scale path is :func:`anf_sketch`.
    """
    spark = edges.sparkSession
    sym = _sym(edges, directed).persist()
    store = EphemeralStateStore(spark, "anf_exact")
    out: list[tuple[int, int]] = []
    try:
        pairs = store.save(sym, 0)
        out.append((1, pairs.count()))
        for h in range(2, max_h + 1):
            # (u, x) ++ (x, v): rename to join on the middle vertex
            ext = (
                pairs.withColumnRenamed("v", "mid")
                .join(sym.withColumnRenamed("u", "mid"), "mid")
                .select("u", "v")
                .where(F.col("u") != F.col("v"))
            )
            pairs = store.save(pairs.union(ext).distinct(), h)
            out.append((h, pairs.count()))
        return spark.createDataFrame(out, "h int, n_pairs long")
    finally:
        store.close()
        sym.unpersist()


def _mask_cols(k: int) -> list[str]:
    return [f"m{i}" for i in range(k)]


def _init_state(sym: DataFrame, k: int, seed: int) -> DataFrame:
    verts = (
        sym.select(F.col("u").alias("v_id"))
        .union(sym.select(F.col("v").alias("v_id")))
        .distinct()
    )
    r_cols = []
    for i in range(k):
        h = F.xxhash64(F.col("v_id"), F.lit(i), F.lit(seed))
        r_cols.append(
            F.least(
                F.bit_count(
                    F.bitwise_not(h).bitwiseAND(F.try_subtract(h, F.lit(1)))
                ),
                F.lit(62),
            ).alias(f"r{i}")
        )
    # pyspark's F.shiftleft takes a literal shift; the SQL form takes
    # a column — two-step select through the computed r columns
    return verts.select("v_id", *r_cols).select(
        "v_id",
        *[
            F.expr(f"shiftleft(CAST(1 AS BIGINT), r{i})").alias(f"m{i}")
            for i in range(k)
        ],
    )


def _est_expr(k: int) -> F.Column:
    """Per-row FM estimate: 2^(mean least-zero-bit position) / phi."""
    pos_sum = F.lit(0)
    for c in _mask_cols(k):
        m = F.col(c)
        t = F.bitwise_not(m).bitwiseAND(F.try_add(m, F.lit(1)))
        pos = F.coalesce(
            F.bit_count(F.try_subtract(t, F.lit(1))), F.lit(63)
        )
        pos_sum = pos_sum + pos
    return F.pow(F.lit(2.0), pos_sum.cast("double") / F.lit(float(k))) / F.lit(
        _FM_PHI
    )


def anf_sketch(
    edges: DataFrame,
    max_h: int,
    k: int = 32,
    seed: int = 42,
    directed: bool = False,
    rel_tol: float = 1e-4,
) -> DataFrame:
    """Approximate N(h) for h = 1..H: ``(h int, n_pairs_est double)``.

    H = ``max_h``, or earlier if the estimate stops growing by more
    than ``rel_tol`` (all distances exhausted). ``k`` trials trade
    accuracy (stderr ~ 0.78/sqrt(k)) for 8k bytes/vertex of state.
    Deterministic for a fixed ``seed``.
    """
    from pyspark.sql import Observation

    spark = edges.sparkSession
    sym = _sym(edges, directed).persist()
    store = EphemeralStateStore(spark, "anf")
    cols = _mask_cols(k)
    try:
        state = _init_state(sym, k, seed)
        n_vertices = state.count()
        out: list[tuple[int, float]] = []
        if n_vertices == 0:
            return spark.createDataFrame(out, "h int, n_pairs_est double")
        prev = float(n_vertices)
        n_sym = sym.count()
        # Loop-scoped config (plans/loopconf.py): shuffle partitions
        # sized to the message volume (|sym| sketch rows of k packed
        # longs), AQE off — one scheduler job per hop.
        with superstep_conf(spark, n_sym):
            for h in range(1, max_h + 1):
                # shuffle_hash: the state side is a parquet scan with
                # unknown stats — Catalyst would otherwise pick a
                # sort-merge join and re-sort the adjacency every hop
                msgs = sym.join(
                    state.withColumnRenamed("v_id", "u").hint(
                        "shuffle_hash"
                    ),
                    "u",
                ).select(F.col("v").alias("v_id"), *cols)
                combined = (
                    state.unionByName(msgs)
                    .groupBy("v_id")
                    .agg(*[F.bit_or(c).alias(c) for c in cols])
                )
                obs = Observation(f"anf_{h}")
                state = store.save(
                    combined.observe(obs, F.sum(_est_expr(k)).alias("s")), h
                )
                total = float(obs.get["s"] or 0.0)
                out.append((h, total - n_vertices))
                if total <= prev * (1.0 + rel_tol):
                    break
                prev = total
        return spark.createDataFrame(out, "h int, n_pairs_est double")
    finally:
        store.close()
        sym.unpersist()


def effective_diameter(
    edges: DataFrame,
    q: float = 0.9,
    k: int = 32,
    seed: int = 42,
    max_h: int = 128,
    directed: bool = False,
) -> float:
    """Effective diameter: the (interpolated) smallest h such that
    N(h) >= q * N(max) — the standard HyperANF summary statistic."""
    nf = anf_sketch(edges, max_h=max_h, k=k, seed=seed, directed=directed)
    rows = sorted((r.h, r.n_pairs_est) for r in nf.collect())
    if not rows:
        return 0.0
    target = q * rows[-1][1]
    prev_h, prev_n = 0, 0.0
    for h, n in rows:
        if n >= target:
            if n == prev_n:
                return float(h)
            # linear interpolation between the bracketing hops
            return prev_h + (target - prev_n) / (n - prev_n) * (h - prev_h)
        prev_h, prev_n = h, n
    return float(rows[-1][0])


