"""Correctness-gate queries + ANSI-SQL oracles.

Each engine operator exposed through ``__spark_entry__.queries()`` has
a DuckDB-runnable oracle built here. The gate graph is derived from
the driver's ``events`` table with PORTABLE SQL (identical text runs
on Spark and DuckDB), using arithmetic vertex ids so both engines
agree bit-for-bit on keys:

* turn vertex id  = user_id * 100000 + turn_idx
* tool vertex id  = 1_000_000_000 + (event_id % 7)

Iterative algorithms are gated as fixed-iteration variants whose
oracles are programmatically UNROLLED into chained CTEs — integer
results (CC, LPA, triangles) match exactly; PageRank is compared on
``round(rank·N, 6)`` so float summation-order noise (~1e-15) cannot
flip the hash.

The convergence-driven variants (tol-based stopping) are covered by
the pytest oracle-parity suite instead (tests/), mirroring the
reference's checker strategy (``/root/reference/test/checker.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERS = 5
HITS_ITERS = 4
KCORE_ROUNDS = 8
BFS_ROUNDS = 6
CC_ROUNDS = 10
LPA_ROUNDS = 3
KHOP_K = 2
KHOP_SEED = 1_000_000_000  # tool_0 vertex
MINE_MINSUP = 8
# Louvain planted-partition gate: ring of LOUVAIN_CLIQUES K_size
# cliques (one bridge per adjacent pair). Sized below the resolution
# limit (merging two K_5 cliques is modularity-negative while
# n_cliques * (2*intra_deg + 2) stays well under 2m), so the unique
# modularity-optimal partition IS the cliques and the closed-form
# oracle `community = size * (v div size)` (= min member id, the
# engine's canonical label) is exact. tests/test_louvain.py proves
# recovery for three ring sizes; the gate pins 12 x 5.
LOUVAIN_CLIQUES = 12
LOUVAIN_CLIQUE_SIZE = 5

# ----------------------------------------------------------------------
# Shared portable SQL fragments (run verbatim on Spark AND DuckDB)
# ----------------------------------------------------------------------

TRANSCRIPTS_CTE = """
tr AS (
  SELECT CAST(user_id AS STRING) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         CASE event_type WHEN 'purchase' THEN 'tool'
                         WHEN 'signup' THEN 'system'
                         WHEN 'error' THEN 'assistant'
                         ELSE 'user' END AS role,
         props AS text,
         CASE WHEN event_type = 'purchase'
              THEN 'tool_' || CAST(event_id % 7 AS STRING)
              ELSE NULL END AS tool,
         ts,
         user_id,
         event_id
  FROM events
)
"""

EDGES_CTE = (
    TRANSCRIPTS_CTE
    + """,
edges AS (
  SELECT user_id * 100000 + turn_idx     AS src,
         user_id * 100000 + turn_idx - 1 AS dst,
         'replies_to' AS type
  FROM tr WHERE turn_idx > 0
  UNION ALL
  SELECT user_id * 100000 + turn_idx   AS src,
         1000000000 + (event_id % 7)   AS dst,
         'invokes' AS type
  FROM tr WHERE tool IS NOT NULL
),
verts AS (
  SELECT src AS v FROM edges UNION SELECT dst AS v FROM edges
),
sym AS (
  SELECT src AS u, dst AS v FROM edges WHERE src <> dst
  UNION
  SELECT dst AS u, src AS v FROM edges WHERE src <> dst
)
"""
)


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_events(spark, sf_dir)
    return spark.sql(f"WITH {TRANSCRIPTS_CTE} SELECT * FROM tr")


def gate_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate graph as an edges DataFrame (engine input)."""
    _register_events(spark, sf_dir)
    return spark.sql(
        f"WITH {EDGES_CTE} SELECT src, dst, type, 1.0 AS weight FROM edges"
    )


def _register_events(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")


def register_all(spark: SparkSession, sf_dir: str) -> None:
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ----------------------------------------------------------------------
# Unrolled oracle SQL builders
# ----------------------------------------------------------------------

def _materialize(sql: str) -> str:
    """Force DuckDB to materialize every CTE (``AS MATERIALIZED``).

    DuckDB inlines CTEs by default; an unrolled k-round chain where
    round i references round i-1 twice would otherwise expand to 2^k
    copies of the base scan. Oracle-only — Spark never parses these
    strings (the Spark side runs engine operators).
    """
    return sql.replace("AS (SELECT", "AS MATERIALIZED (SELECT").replace(
        "AS (\n", "AS MATERIALIZED (\n"
    )


def pagerank_oracle_sql(k: int = PR_ITERS, d: float = DAMPING) -> str:
    parts = [
        f"WITH {EDGES_CTE}",
        """,
adjw AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM edges GROUP BY src, dst),
outw AS (SELECT src, sum(w) AS ow FROM adjw GROUP BY src),
adj  AS (SELECT a.src, a.dst, a.w / o.ow AS p FROM adjw a JOIN outw o ON a.src = o.src),
nv   AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
dangf AS (SELECT v.v, CASE WHEN o.src IS NULL THEN 1 ELSE 0 END AS dang
          FROM verts v LEFT JOIN outw o ON v.v = o.src),
r0 AS (SELECT v.v, 1.0 / nv.n AS r FROM verts v CROSS JOIN nv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
m{i} AS (SELECT a.dst AS v, sum(a.p * r.r) AS mass
         FROM adj a JOIN r{i-1} r ON a.src = r.v GROUP BY a.dst),
dg{i} AS (SELECT coalesce(sum(r.r), 0.0) AS dmass
          FROM r{i-1} r JOIN dangf f ON r.v = f.v WHERE f.dang = 1),
r{i} AS (SELECT v.v,
                (1.0 - {d}) / nv.n + {d} * (coalesce(m.mass, 0.0) + dg.dmass / nv.n) AS r
         FROM verts v CROSS JOIN nv CROSS JOIN dg{i} dg
         LEFT JOIN m{i} m ON v.v = m.v)"""
        )
    parts.append(
        f"""
SELECT r.v AS v_id, round(r.r * nv.n, 6) AS rank_x_n
FROM r{k} r CROSS JOIN nv"""
    )
    return _materialize("".join(parts))


KATZ_ALPHA = 0.05
KATZ_ITERS = 5


def katz_oracle_sql(
    k: int = KATZ_ITERS, a: float = KATZ_ALPHA, beta: float = 1.0
) -> str:
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
adjw AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM edges GROUP BY src, dst),
x0 AS (SELECT v, CAST({beta} AS DOUBLE) AS x FROM verts)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
m{i} AS (SELECT a.dst AS v, sum(a.w * x.x) AS mass
         FROM adjw a JOIN x{i-1} x ON a.src = x.v GROUP BY a.dst),
x{i} AS (SELECT v.v, {beta} + {a} * coalesce(m.mass, 0.0) AS x
         FROM verts v LEFT JOIN m{i} m ON v.v = m.v)"""
        )
    parts.append(
        f"""
SELECT v AS v_id, round(x, 6) AS katz FROM x{k}"""
    )
    return _materialize("".join(parts))


def ppr_oracle_sql(k: int = PR_ITERS, d: float = DAMPING) -> str:
    """Personalized PageRank, seeded on the tool-hub vertices
    (``v >= 1000000000`` — the deterministic `invokes` targets).
    Teleport AND dangling mass re-enter through the seed set only;
    r0 = the reset vector, matching the engine's ``seeds=`` path."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
adjw AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM edges GROUP BY src, dst),
outw AS (SELECT src, sum(w) AS ow FROM adjw GROUP BY src),
adj  AS (SELECT a.src, a.dst, a.w / o.ow AS p FROM adjw a JOIN outw o ON a.src = o.src),
nv   AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
seeds AS (SELECT v FROM verts WHERE v >= 1000000000),
nsd  AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM seeds),
resetv AS (SELECT v.v, CASE WHEN s.v IS NOT NULL THEN 1.0 / nsd.m ELSE 0.0 END AS rv
           FROM verts v CROSS JOIN nsd LEFT JOIN seeds s ON v.v = s.v),
dangf AS (SELECT v.v, CASE WHEN o.src IS NULL THEN 1 ELSE 0 END AS dang
          FROM verts v LEFT JOIN outw o ON v.v = o.src),
r0 AS (SELECT v, rv AS r FROM resetv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
m{i} AS (SELECT a.dst AS v, sum(a.p * r.r) AS mass
         FROM adj a JOIN r{i-1} r ON a.src = r.v GROUP BY a.dst),
dg{i} AS (SELECT coalesce(sum(r.r), 0.0) AS dmass
          FROM r{i-1} r JOIN dangf f ON r.v = f.v WHERE f.dang = 1),
r{i} AS (SELECT rv.v,
                (1.0 - {d}) * rv.rv + {d} * (coalesce(m.mass, 0.0) + dg.dmass * rv.rv) AS r
         FROM resetv rv CROSS JOIN dg{i} dg
         LEFT JOIN m{i} m ON rv.v = m.v)"""
        )
    parts.append(
        f"""
SELECT r.v AS v_id, round(r.r * nv.n, 6) AS rank_x_n
FROM r{k} r CROSS JOIN nv"""
    )
    return _materialize("".join(parts))


def hits_oracle_sql(k: int = HITS_ITERS) -> str:
    """Kleinberg HITS, k iterations, L1-normalized each half-step
    (auth from the previous hub, hub from the NEW auth) — matching
    :func:`cminer_spark.operators.hits.hits` with ``tol=0``."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
adjw AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM edges GROUP BY src, dst),
nv   AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
h0 AS (SELECT v.v, 1.0 / nv.n AS h FROM verts v CROSS JOIN nv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
ar{i} AS (SELECT a.dst AS v, sum(a.w * h.h) AS x
          FROM adjw a JOIN h{i-1} h ON a.src = h.v GROUP BY a.dst),
asum{i} AS (SELECT sum(x) AS s FROM ar{i}),
a{i} AS (SELECT v.v, coalesce(ar.x, 0.0) / s.s AS a
         FROM verts v CROSS JOIN asum{i} s LEFT JOIN ar{i} ar ON v.v = ar.v),
hr{i} AS (SELECT e.src AS v, sum(e.w * aa.a) AS x
          FROM adjw e JOIN a{i} aa ON e.dst = aa.v GROUP BY e.src),
hsum{i} AS (SELECT sum(x) AS s FROM hr{i}),
h{i} AS (SELECT v.v, coalesce(hr.x, 0.0) / s.s AS h
         FROM verts v CROSS JOIN hsum{i} s LEFT JOIN hr{i} hr ON v.v = hr.v)"""
        )
    parts.append(
        f"""
SELECT h.v AS v_id,
       round(h.h * nv.n, 6) AS hub_x_n,
       round(a.a * nv.n, 6) AS auth_x_n
FROM h{k} h JOIN a{k} a ON h.v = a.v CROSS JOIN nv"""
    )
    return _materialize("".join(parts))


REWIRE_BUCKETS = 4


def rewire_oracle_sql(seed: int = 0, b: int = REWIRE_BUCKETS) -> str:
    """Configuration-model rewire mirror: identical md5 bucket/order
    keys, identical per-bucket windows, positional zip — matching
    :func:`cminer_spark.operators.nullmodel.configuration_rewire`
    row-multiset exactly."""
    bkt = (
        "CAST('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || "
        f"CAST(dst AS VARCHAR) || ':{seed}'), 1, 8) AS BIGINT) % {b}"
    )
    skey = (
        "md5('s:' || CAST(src AS VARCHAR) || ':' || "
        f"CAST(dst AS VARCHAR) || ':{seed}')"
    )
    dkey = (
        "md5('d:' || CAST(dst AS VARCHAR) || ':' || "
        f"CAST(src AS VARCHAR) || ':{seed}')"
    )
    return _materialize(
        f"""WITH {EDGES_CTE},
tg AS (SELECT src, dst, {bkt} AS _b FROM edges),
ss AS (SELECT _b, src, row_number() OVER (
         PARTITION BY _b ORDER BY {skey} ASC, src ASC, dst ASC) AS _pos
       FROM tg),
ds AS (SELECT _b, dst, row_number() OVER (
         PARTITION BY _b ORDER BY {dkey} ASC, dst ASC, src ASC) AS _pos
       FROM tg)
SELECT s.src, d.dst FROM ss s JOIN ds d ON s._b = d._b AND s._pos = d._pos"""
    )


def salsa_oracle_sql(k: int = HITS_ITERS) -> str:
    """SALSA: the HITS iteration with degree-normalized half-step
    weights (auth gathers ``w/outdeg_w``, hub gathers ``w/indeg_w``),
    L1-normalized each half-step — matching
    :func:`cminer_spark.operators.hits.salsa` with ``tol=0``."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
adjw AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM edges GROUP BY src, dst),
outw AS (SELECT src, sum(w) AS ow FROM adjw GROUP BY src),
inw  AS (SELECT dst, sum(w) AS iw FROM adjw GROUP BY dst),
fwd AS (SELECT a.src, a.dst, a.w / o.ow AS w
        FROM adjw a JOIN outw o ON a.src = o.src),
bwd AS (SELECT a.src, a.dst, a.w / i.iw AS w
        FROM adjw a JOIN inw i ON a.dst = i.dst),
nv   AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
h0 AS (SELECT v.v, 1.0 / nv.n AS h FROM verts v CROSS JOIN nv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
ar{i} AS (SELECT a.dst AS v, sum(a.w * h.h) AS x
          FROM fwd a JOIN h{i-1} h ON a.src = h.v GROUP BY a.dst),
asum{i} AS (SELECT sum(x) AS s FROM ar{i}),
a{i} AS (SELECT v.v, coalesce(ar.x, 0.0) / s.s AS a
         FROM verts v CROSS JOIN asum{i} s LEFT JOIN ar{i} ar ON v.v = ar.v),
hr{i} AS (SELECT e.src AS v, sum(e.w * aa.a) AS x
          FROM bwd e JOIN a{i} aa ON e.dst = aa.v GROUP BY e.src),
hsum{i} AS (SELECT sum(x) AS s FROM hr{i}),
h{i} AS (SELECT v.v, coalesce(hr.x, 0.0) / s.s AS h
         FROM verts v CROSS JOIN hsum{i} s LEFT JOIN hr{i} hr ON v.v = hr.v)"""
        )
    parts.append(
        f"""
SELECT h.v AS v_id,
       round(h.h * nv.n, 6) AS hub_x_n,
       round(a.a * nv.n, 6) AS auth_x_n
FROM h{k} h JOIN a{k} a ON h.v = a.v CROSS JOIN nv"""
    )
    return _materialize("".join(parts))


def kcore_oracle_sql(k: int = KCORE_ROUNDS) -> str:
    """k rounds of the distributed h-index coreness iteration
    (Montresor et al.) — matches
    :func:`cminer_spark.operators.kcore.core_numbers` with
    ``max_rounds=k`` (the operator's early-stop at the fixpoint is
    idempotent, so extra oracle rounds are no-ops)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
degc AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
c0 AS (SELECT v.v, CAST(coalesce(d.d, 0) AS BIGINT) AS c
       FROM verts v LEFT JOIN degc d ON v.v = d.u)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
nb{i} AS (SELECT s.u, c.c FROM sym s JOIN c{i-1} c ON s.v = c.v),
ct{i} AS (SELECT u, c, count(*) AS k FROM nb{i} GROUP BY u, c),
cm{i} AS (SELECT u, c, sum(k) OVER (PARTITION BY u ORDER BY c DESC) AS ge FROM ct{i}),
h{i} AS (SELECT u, max(least(c, ge)) AS h FROM cm{i} GROUP BY u),
c{i} AS (SELECT p.v, CAST(least(p.c, coalesce(h.h, 0)) AS BIGINT) AS c
         FROM c{i-1} p LEFT JOIN h{i} h ON p.v = h.u)"""
        )
    parts.append(f"\nSELECT v AS v_id, c AS core FROM c{k}")
    return _materialize("".join(parts))


def bfs_dist_oracle_sql(k: int = BFS_ROUNDS) -> str:
    """k rounds of multi-source min-plus relaxation (undirected, unit
    weights) from the tool-hub vertices — matches
    :func:`cminer_spark.operators.paths.shortest_paths` with
    ``directed=False, max_rounds=k`` (frontier relaxation yields the
    same ≤k-edge-path minimum as the whole-state relaxation unrolled
    here; early convergence is idempotent)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
seeds AS (SELECT DISTINCT dst AS v FROM edges WHERE type = 'invokes'),
d0 AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM seeds)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
rx{i} AS (SELECT s.v AS v, d.dist + 1 AS dist
          FROM d{i-1} d JOIN sym s ON d.v = s.u),
d{i} AS (SELECT v, min(dist) AS dist
         FROM (SELECT * FROM d{i-1} UNION ALL SELECT * FROM rx{i}) t
         GROUP BY v)"""
        )
    parts.append(f"\nSELECT v AS v_id, dist FROM d{k}")
    return _materialize("".join(parts))


def cc_oracle_sql(k: int = CC_ROUNDS) -> str:
    parts = [
        f"WITH {EDGES_CTE}",
        """,
l0 AS (SELECT v AS v_id, v AS component FROM verts)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
mn{i} AS (SELECT s.v AS v_id, min(x.component) AS m
          FROM sym s JOIN l{i-1} x ON s.u = x.v_id GROUP BY s.v),
l{i} AS (SELECT l.v_id, least(l.component, coalesce(mn.m, l.component)) AS component
         FROM l{i-1} l LEFT JOIN mn{i} mn ON l.v_id = mn.v_id)"""
        )
    parts.append(f"\nSELECT v_id, component FROM l{k}")
    return _materialize("".join(parts))


# Transactional per-conversation graph for the WL gate (same vertex/
# edge construction the mining gate uses, with graph_id carried).
WL_CTE = (
    TRANSCRIPTS_CTE
    + """,
wlv AS (
  SELECT conv_id AS graph_id, user_id * 100000 + turn_idx AS v_id, role AS lbl
  FROM tr
  UNION
  SELECT conv_id, 1000000000 + (event_id % 7), 'tool'
  FROM tr WHERE tool IS NOT NULL
),
wle AS (
  SELECT conv_id AS graph_id,
         user_id * 100000 + turn_idx     AS src,
         user_id * 100000 + turn_idx - 1 AS dst
  FROM tr WHERE turn_idx > 0
  UNION ALL
  SELECT conv_id, user_id * 100000 + turn_idx, 1000000000 + (event_id % 7)
  FROM tr WHERE tool IS NOT NULL
),
wlsym AS (
  SELECT graph_id, src AS u, dst AS v FROM wle
  UNION
  SELECT graph_id, dst AS u, src AS v FROM wle
)
"""
)

WL_ROUNDS = 2


def wl_fingerprint_oracle_sql(k: int = WL_ROUNDS) -> str:
    """Unrolled 1-WL refinement: color_i = md5(prev || '|' ||
    ','-joined sorted neighbor colors) — strings and md5 are
    engine-identical, the sort normalizes aggregation order."""
    parts = [
        f"WITH {WL_CTE}",
        """,
wc0 AS (SELECT graph_id, v_id, md5(lbl) AS color FROM wlv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
wn{i} AS (SELECT s.graph_id, s.v AS v_id,
                 array_to_string(list_sort(list(c.color)), ',') AS njoin
          FROM wlsym s JOIN wc{i-1} c
            ON s.graph_id = c.graph_id AND s.u = c.v_id
          GROUP BY s.graph_id, s.v),
wc{i} AS (SELECT c.graph_id, c.v_id,
                 md5(concat_ws('|', c.color, coalesce(n.njoin, ''))) AS color
          FROM wc{i-1} c LEFT JOIN wn{i} n
            ON c.graph_id = n.graph_id AND c.v_id = n.v_id)"""
        )
    parts.append(
        f"""
SELECT graph_id,
       md5(array_to_string(list_sort(list(color)), ',')) AS fingerprint
FROM wc{k} GROUP BY graph_id"""
    )
    return _materialize("".join(parts))


# Bounded-diameter gate graph for the INCREMENTAL CC gate: the
# user–tool bipartite purchase graph (diameter ≤ ~6 through the 7 tool
# hubs), so a short unrolled hash-min chain reaches the exact
# components — unlike the turn-chain graph, where 10 rounds don't
# saturate (measured: 4441 label mismatches vs exact at sf0.01).
BIPARTITE_CTE = (
    TRANSCRIPTS_CTE
    + """,
bedges AS (
  SELECT user_id AS src,
         1000000000 + (event_id % 7) AS dst,
         event_id
  FROM tr WHERE tool IS NOT NULL
),
bverts AS (
  SELECT src AS v FROM bedges UNION SELECT dst AS v FROM bedges
),
bsym AS (
  SELECT src AS u, dst AS v FROM bedges
  UNION
  SELECT dst AS u, src AS v FROM bedges
)
"""
)

CC_INCR_ROUNDS = 8


def cc_incremental_oracle_sql(k: int = CC_INCR_ROUNDS) -> str:
    """Exact components of the bipartite purchase graph via a k-round
    hash-min unroll (k ≥ its diameter, so this IS the converged
    labeling). The Spark side computes the same labeling
    incrementally: exact CC on the event_id % 3 != 0 edges, then
    :func:`~cminer_spark.operators.components.incremental_components`
    splices in the % 3 == 0 delta — so the gate checks the
    contract-solve-compose path end to end."""
    parts = [
        f"WITH {BIPARTITE_CTE}",
        """,
bl0 AS (SELECT v AS v_id, v AS component FROM bverts)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
bmn{i} AS (SELECT s.v AS v_id, min(x.component) AS m
           FROM bsym s JOIN bl{i-1} x ON s.u = x.v_id GROUP BY s.v),
bl{i} AS (SELECT l.v_id, least(l.component, coalesce(mn.m, l.component)) AS component
          FROM bl{i-1} l LEFT JOIN bmn{i} mn ON l.v_id = mn.v_id)"""
        )
    parts.append(f"\nSELECT v_id, component FROM bl{k}")
    return _materialize("".join(parts))


def _lpa_ctes(k: int) -> str:
    """Unrolled LPA CTE chain ending in ``lab{k}(v_id, label)`` —
    shared by the LPA gate and the modularity gate (which scores the
    same partition)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
lab0 AS (SELECT v AS v_id, v AS label FROM verts)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
f{i} AS (SELECT s.v AS v_id, x.label, count(*) AS c
         FROM sym s JOIN lab{i-1} x ON s.u = x.v_id GROUP BY s.v, x.label),
w{i} AS (SELECT v_id, label,
                row_number() OVER (PARTITION BY v_id ORDER BY c DESC, label ASC) AS rn
         FROM f{i}),
lab{i} AS (SELECT l.v_id, coalesce(w.label, l.label) AS label
           FROM lab{i-1} l
           LEFT JOIN (SELECT v_id, label FROM w{i} WHERE rn = 1) w
             ON l.v_id = w.v_id)"""
        )
    return "".join(parts)


def lpa_oracle_sql(k: int = LPA_ROUNDS) -> str:
    return _materialize(_lpa_ctes(k) + f"\nSELECT v_id, label FROM lab{k}")


LPA_WARM_EXTRA = 2
MIS_ROUNDS = 4


def mis_oracle_sql(k: int = MIS_ROUNDS) -> str:
    """Unrolled Luby MIS: per round, an undecided vertex wins iff its
    md5 priority beats every undecided neighbor's (strict ``<`` on the
    hex string — engine-identical in Spark and DuckDB); undecided
    neighbors of winners leave. Matches
    :func:`cminer_spark.operators.mis.maximal_independent_set` with
    ``stop_when_done=False`` exactly, round by round."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
st0 AS (SELECT v AS v_id, md5(CAST(v AS VARCHAR)) AS p,
               'undecided' AS status
        FROM verts)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
mn{i} AS (SELECT s.v AS v_id, min(x.p) AS mp
          FROM sym s
          JOIN st{i-1} x ON s.u = x.v_id AND x.status = 'undecided'
          JOIN st{i-1} y ON s.v = y.v_id AND y.status = 'undecided'
          GROUP BY s.v),
win{i} AS (SELECT t.v_id FROM st{i-1} t
           LEFT JOIN mn{i} m ON t.v_id = m.v_id
           WHERE t.status = 'undecided'
             AND (m.mp IS NULL OR t.p < m.mp)),
out{i} AS (SELECT DISTINCT s.v AS v_id
           FROM sym s JOIN win{i} w ON s.u = w.v_id),
st{i} AS (SELECT t.v_id, t.p,
                 CASE WHEN w.v_id IS NOT NULL THEN 'in'
                      WHEN t.status = 'undecided'
                           AND o.v_id IS NOT NULL THEN 'out'
                      ELSE t.status END AS status
          FROM st{i-1} t
          LEFT JOIN win{i} w ON t.v_id = w.v_id
          LEFT JOIN out{i} o ON t.v_id = o.v_id)"""
        )
    parts.append(f"\nSELECT v_id, status FROM st{k}")
    return _materialize("".join(parts))


COLOR_ROUNDS = 4


def coloring_oracle_sql(k: int = COLOR_ROUNDS) -> str:
    """Unrolled Jones-Plassmann-LDF coloring: per round, an uncolored
    vertex wins iff its composite priority — zero-padded
    ``10^10 - degree`` prefix (degree DESC) then md5 (the exact
    expression in operators/coloring.py::_pri) — beats every uncolored
    neighbor's (strict ``<`` on the string) and takes the smallest
    color its already-colored neighbors don't hold (min over
    candidates 0..round-1 anti-joined against used colors). Matches
    :func:`cminer_spark.operators.coloring.greedy_coloring` with
    ``stop_when_done=False`` exactly, round by round."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
cdeg AS (SELECT u AS v_id, count(*) AS d FROM sym GROUP BY u),
st0 AS (SELECT v AS v_id,
               lpad(CAST(10000000000 - coalesce(cd.d, 0) AS VARCHAR),
                    11, '0')
                 || md5(CAST(v AS VARCHAR)) AS p,
               CAST(-1 AS BIGINT) AS color
        FROM verts LEFT JOIN cdeg cd ON verts.v = cd.v_id)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
mn{i} AS (SELECT s.v AS v_id, min(x.p) AS mp
          FROM sym s
          JOIN st{i-1} x ON s.u = x.v_id AND x.color = -1
          JOIN st{i-1} y ON s.v = y.v_id AND y.color = -1
          GROUP BY s.v),
win{i} AS (SELECT t.v_id FROM st{i-1} t
           LEFT JOIN mn{i} m ON t.v_id = m.v_id
           WHERE t.color = -1
             AND (m.mp IS NULL OR t.p < m.mp)),
used{i} AS (SELECT DISTINCT s.v AS v_id, t.color
            FROM sym s
            JOIN win{i} w ON s.v = w.v_id
            JOIN st{i-1} t ON s.u = t.v_id AND t.color >= 0),
asg{i} AS (SELECT c.v_id, min(c.c) AS color
           FROM (SELECT w.v_id, r.c
                 FROM win{i} w CROSS JOIN range(0, {i}) r(c)) c
           LEFT JOIN used{i} u
             ON u.v_id = c.v_id AND u.color = c.c
           WHERE u.v_id IS NULL
           GROUP BY c.v_id),
st{i} AS (SELECT t.v_id, t.p,
                 CAST(coalesce(a.color, t.color) AS BIGINT) AS color
          FROM st{i-1} t
          LEFT JOIN asg{i} a ON t.v_id = a.v_id)"""
        )
    parts.append(f"\nSELECT v_id, color FROM st{k}")
    return _materialize("".join(parts))


def lpa_warm_oracle_sql(
    k: int = LPA_ROUNDS, extra: int = LPA_WARM_EXTRA
) -> str:
    """Oracle for the warm-start contract: LPA resumed from the
    round-``k`` labels (``initial_labels=``, the ``--prev-labels``
    ingest path) for ``extra`` more rounds must equal one contiguous
    ``k + extra``-round run — warm-start is a continuation, not a
    different algorithm."""
    return lpa_oracle_sql(k + extra)


def modularity_oracle_sql(k: int = LPA_ROUNDS) -> str:
    """Newman modularity of the k-round LPA partition — integer
    intra-edge and squared-degree-sum totals with one closed-form
    double expression, matching
    :func:`cminer_spark.operators.stats.modularity` (compared on
    ``round(q, 6)``)."""
    return _materialize(
        _lpa_ctes(k)
        + f""",
und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        FROM edges WHERE src <> dst),
elab AS (SELECT la.label AS c_lo, lb.label AS c_hi
         FROM und u
         JOIN lab{k} la ON u.lo = la.v_id
         JOIN lab{k} lb ON u.hi = lb.v_id),
am AS (SELECT count(*) AS m,
              CAST(coalesce(sum(CASE WHEN c_lo = c_hi THEN 1 ELSE 0 END), 0)
                   AS BIGINT) AS a
       FROM elab),
degs AS (SELECT v, count(*) AS d
         FROM (SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und) t
         GROUP BY v),
dcs AS (SELECT la.label AS c, CAST(sum(d.d) AS HUGEINT) AS dc
        FROM degs d JOIN lab{k} la ON d.v = la.v_id
        GROUP BY la.label),
bstat AS (SELECT CAST(coalesce(sum(dc * dc), 0) AS HUGEINT) AS b FROM dcs)
SELECT m,
       CASE WHEN m > 0
            THEN round(a / CAST(m AS DOUBLE)
                       - CAST(b AS DOUBLE)
                         / (CAST(4 AS DOUBLE) * CAST(m AS DOUBLE)
                            * CAST(m AS DOUBLE)), 6)
            ELSE 0.0 END AS q
FROM am, bstat"""
    )


TRIANGLE_CTES = """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
degs AS (SELECT v, count(*) AS dg
         FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) t
         GROUP BY v),
orient AS (SELECT CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                       THEN u.a ELSE u.b END AS lo,
                  CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                       THEN u.b ELSE u.a END AS hi
           FROM und u JOIN degs da ON u.a = da.v JOIN degs db ON u.b = db.v),
wedge AS (SELECT e1.lo AS piv, e1.hi AS x, e2.hi AS y
          FROM orient e1 JOIN orient e2 ON e1.lo = e2.lo
          WHERE e1.hi < e2.hi),
closing AS (SELECT least(lo, hi) AS x, greatest(lo, hi) AS y FROM orient),
tris AS (SELECT w.piv, w.x, w.y
         FROM wedge w JOIN closing c ON w.x = c.x AND w.y = c.y)
"""


def triangles_total_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}{TRIANGLE_CTES}"
        "SELECT count(*) AS n_triangles FROM tris"
    )


def triangles_per_vertex_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}{TRIANGLE_CTES}"
        """,
corners AS (SELECT piv AS v_id FROM tris
            UNION ALL SELECT x FROM tris
            UNION ALL SELECT y FROM tris),
cnt AS (SELECT v_id, count(*) AS triangles FROM corners GROUP BY v_id)
SELECT v.v AS v_id, coalesce(c.triangles, 0) AS triangles
FROM verts v LEFT JOIN cnt c ON v.v = c.v_id"""
    )


CLUSTER_STATS_CTES = """,
corners AS (SELECT piv AS v_id FROM tris
            UNION ALL SELECT x FROM tris
            UNION ALL SELECT y FROM tris),
cnt AS (SELECT v_id, count(*) AS triangles FROM corners GROUP BY v_id),
cstats AS (SELECT v.v AS v_id,
                  CAST(coalesce(d.dg, 0) AS BIGINT) AS degree,
                  CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles
           FROM verts v LEFT JOIN degs d ON v.v = d.v
                        LEFT JOIN cnt c ON v.v = c.v_id)
"""


def clustering_local_oracle_sql() -> str:
    """Per-vertex local clustering coefficient — matches
    :func:`cminer_spark.operators.clustering.clustering_coefficients`
    (same single-expression double arithmetic, so values are
    bit-identical)."""
    return _materialize(
        f"WITH {EDGES_CTE}{TRIANGLE_CTES}{CLUSTER_STATS_CTES}"
        """
SELECT v_id, degree, triangles,
       CASE WHEN degree >= 2
            THEN (2.0 * triangles)
                 / (CAST(degree AS DOUBLE) * (CAST(degree AS DOUBLE) - 1.0))
            ELSE 0.0 END AS lcc
FROM cstats"""
    )


def clustering_global_oracle_sql() -> str:
    """Global transitivity summary — integer corner/wedge sums with one
    final double division, so the value is engine-order independent
    (matches ``global_clustering``; ``avg_clustering`` is deliberately
    not gated — a float mean's summation order differs across engines
    — and is pytest-verified against networkx instead)."""
    return _materialize(
        f"WITH {EDGES_CTE}{TRIANGLE_CTES}{CLUSTER_STATS_CTES}"
        """,
agg AS (SELECT CAST(sum(triangles) AS BIGINT) AS tc,
               CAST(sum(CASE WHEN degree >= 2
                             THEN degree * (degree - 1) / 2
                             ELSE 0 END) AS BIGINT) AS nw,
               count(*) AS n_vertices
        FROM cstats)
SELECT CASE WHEN nw > 0 THEN CAST(tc AS DOUBLE) / CAST(nw AS DOUBLE)
            ELSE 0.0 END AS transitivity,
       n_vertices,
       CAST(tc / 3 AS BIGINT) AS n_triangles,
       nw AS n_wedges
FROM agg"""
    )


def edge_extract_oracle_sql() -> str:
    return (
        f"WITH {TRANSCRIPTS_CTE}"
        """
SELECT conv_id || '#' || CAST(turn_idx AS STRING) AS src_key,
       conv_id || '#' || CAST(turn_idx - 1 AS STRING) AS dst_key,
       'replies_to' AS type
FROM tr WHERE turn_idx > 0
UNION ALL
SELECT conv_id || '#' || CAST(turn_idx AS STRING) AS src_key,
       'tool:' || tool AS dst_key,
       'invokes' AS type
FROM tr WHERE tool IS NOT NULL"""
    )


def match_wedge_oracle_sql() -> str:
    """Pattern a-replies_to->b, a-invokes->t (injective nodes; the two
    query edges have different types so edge injectivity is free)."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        """
SELECT e1.src AS n_a, e1.dst AS n_b, e2.dst AS n_t
FROM edges e1 JOIN edges e2 ON e1.src = e2.src
WHERE e1.type = 'replies_to' AND e2.type = 'invokes'
  AND e1.dst <> e2.dst AND e1.src <> e1.dst AND e1.src <> e2.dst"""
    )


def match_path3_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}"
        """
SELECT e1.src AS n_a, e1.dst AS n_b, e2.dst AS n_c
FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
WHERE e1.type = 'replies_to' AND e2.type = 'replies_to'
  AND e1.src <> e2.dst AND e1.src <> e1.dst AND e2.src <> e2.dst"""
    )


def match_props_oracle_sql() -> str:
    """F4 attribute-containment gate: the Spark side materializes real
    ``map<string,string>`` props (bucket = src%3 on edges, parity =
    v_id%2 on vertices) and matches through the F4 predicate path; the
    oracle replicates the derived props as plain arithmetic."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        """
SELECT DISTINCT e.src AS n_u, e.dst AS n_v
FROM edges e
WHERE e.type = 'replies_to' AND e.src <> e.dst
  AND e.src % 3 = 1 AND e.src % 2 = 0"""
    )


def match_parallel_sym_oracle_sql() -> str:
    """G4 edge-key symmetry breaking: the Spark side duplicates every
    edge with keys {0, 1} and matches TWO interchangeable parallel
    ``replies_to`` query edges with ``break_symmetry=True`` — exactly
    one representative per embedding survives, with ascending keys.
    replies_to (src, dst) pairs are unique in the gate graph, so the
    oracle is one row per edge with the forced (0, 1) assignment."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        """
SELECT e.src AS n_u, e.dst AS n_v, 0 AS k0, 1 AS k1
FROM edges e
WHERE e.type = 'replies_to' AND e.src <> e.dst"""
    )


def jaccard_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}"
        """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
nbr AS (SELECT a AS v, b AS nb FROM und UNION ALL SELECT b AS v, a AS nb FROM und),
deg AS (SELECT v, count(*) AS dg FROM nbr GROUP BY v),
wdg AS (SELECT e1.v AS a, e2.v AS b, count(*) AS shared_cnt
        FROM nbr e1 JOIN nbr e2 ON e1.nb = e2.nb
        WHERE e1.v < e2.v
        GROUP BY e1.v, e2.v)
SELECT w.a, w.b,
       round(CAST(w.shared_cnt AS DOUBLE) / (da.dg + db.dg - w.shared_cnt), 6) AS jaccard
FROM wdg w JOIN deg da ON w.a = da.v JOIN deg db ON w.b = db.v"""
    )


def k_hop_oracle_sql(k: int = KHOP_K, seed: int = KHOP_SEED) -> str:
    """G2 BFS k-hop neighborhood (reference ``Graph.py:184-210``):
    visited set unrolled k rounds — vis_i = vis_{i-1} ∪ N(vis_{i-1})
    over the symmetric simple projection (UNION dedups)."""
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
vis0 AS (SELECT CAST({seed} AS BIGINT) AS v_id)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
vis{i} AS (SELECT v_id FROM vis{i-1}
           UNION
           SELECT s.v AS v_id FROM sym s JOIN vis{i-1} f ON s.u = f.v_id)"""
        )
    parts.append(f"\nSELECT v_id FROM vis{k}")
    return _materialize("".join(parts))


# Deterministically corrupted transcripts for the validation gate:
# event_id % 97 shifts turn_idx (creating duplicates AND gaps),
# % 89 injects an out-of-vocabulary role, % 83 nulls conv_id.
CORRUPT_CTE = (
    TRANSCRIPTS_CTE
    + """,
vt AS (
  SELECT CASE WHEN event_id % 83 = 0 THEN NULL ELSE conv_id END AS conv_id,
         CASE WHEN event_id % 97 = 0 THEN turn_idx + 1 ELSE turn_idx END AS turn_idx,
         CASE WHEN event_id % 89 = 0 THEN 'robot' ELSE role END AS role,
         ts
  FROM tr
)
"""
)


def rank_churn_oracle_sql(k: int = 50) -> str:
    """Top-k |position| movers between the base ((src+dst)%3 != 0) and
    full in-degree rankings — mirrors ``stats.rank_churn`` (row_number
    by score desc then v_id asc; side-absent vertices sort first)."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        f""",
d0 AS (SELECT dst AS v_id, count(*) AS s FROM edges WHERE (src + dst) % 3 <> 0 GROUP BY dst),
d1 AS (SELECT dst AS v_id, count(*) AS s FROM edges GROUP BY dst),
p0 AS (SELECT v_id, s, row_number() OVER (ORDER BY s DESC, v_id ASC) AS pos FROM d0),
p1 AS (SELECT v_id, s, row_number() OVER (ORDER BY s DESC, v_id ASC) AS pos FROM d1)
SELECT coalesce(p0.v_id, p1.v_id) AS v_id,
       p0.pos AS pos_prev,
       p1.pos AS pos_cur,
       p0.pos - p1.pos AS pos_delta,
       p0.s AS score_prev,
       p1.s AS score_cur
FROM p0 FULL JOIN p1 ON p0.v_id = p1.v_id
ORDER BY coalesce(abs(p0.pos - p1.pos), 2147483647) DESC,
         coalesce(p0.v_id, p1.v_id) ASC
LIMIT {k}"""
    )


def validate_oracle_sql() -> str:
    """Violation counts over the corrupted frame — mirrors
    ``sources/validate.py`` exactly (same window order, same
    dense-from-0 predicate)."""
    return _materialize(
        f"WITH {CORRUPT_CTE}"
        """,
keyed AS (SELECT * FROM vt WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL),
pr AS (SELECT conv_id, turn_idx,
              (ts < lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts)) AS regr
       FROM keyed),
pc AS (SELECT conv_id, count(*) AS n, count(DISTINCT turn_idx) AS nd,
              max(turn_idx) AS mx, min(turn_idx) AS mn,
              sum(CASE WHEN regr THEN 1 ELSE 0 END) AS regrs
       FROM pr GROUP BY conv_id),
cs AS (SELECT count(*) AS n_convs, sum(n - nd) AS n_dup_turns,
              sum(CASE WHEN mn <> 0 OR nd <> mx + 1 THEN 1 ELSE 0 END) AS n_gap_convs,
              sum(regrs) AS n_ts_regressions
       FROM pc),
rs AS (SELECT count(*) AS n_rows,
              sum(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS n_null_conv_id,
              sum(CASE WHEN turn_idx IS NULL THEN 1 ELSE 0 END) AS n_null_turn_idx,
              sum(CASE WHEN role IS NULL
                         OR role NOT IN ('user','assistant','system','tool')
                       THEN 1 ELSE 0 END) AS n_bad_role
       FROM vt)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_convs AS BIGINT) AS n_convs,
       CAST(n_null_conv_id AS BIGINT) AS n_null_conv_id,
       CAST(n_null_turn_idx AS BIGINT) AS n_null_turn_idx,
       CAST(coalesce(n_dup_turns, 0) AS BIGINT) AS n_dup_turns,
       CAST(coalesce(n_gap_convs, 0) AS BIGINT) AS n_gap_convs,
       CAST(coalesce(n_ts_regressions, 0) AS BIGINT) AS n_ts_regressions,
       CAST(n_bad_role AS BIGINT) AS n_bad_role
FROM rs, cs"""
    )


def louvain_planted_edges(spark: SparkSession) -> DataFrame:
    """Deterministic ring-of-cliques edge table (src, dst) for the
    Louvain gate: LOUVAIN_CLIQUES cliques of LOUVAIN_CLIQUE_SIZE
    vertices, vertex ids dense from 0, one bridge
    (size*c, size*((c+1) % n)) per clique."""
    size, nc = LOUVAIN_CLIQUE_SIZE, LOUVAIN_CLIQUES
    v = spark.range(nc * size).select(F.col("id").alias("v"))
    intra = (
        v.crossJoin(v.select(F.col("v").alias("u")))
        .where(
            (F.col("v") < F.col("u"))
            & (F.floor(F.col("v") / size) == F.floor(F.col("u") / size))
        )
    )
    bridges = spark.range(nc).select(
        (F.col("id") * size).alias("v"),
        (((F.col("id") + 1) % nc) * size).alias("u"),
    )
    return intra.union(bridges).select(
        F.col("v").alias("src"), F.col("u").alias("dst")
    )


def louvain_oracle_sql() -> str:
    """Closed-form certificate for the planted ring-of-cliques: the
    modularity-optimal partition is the cliques themselves (see the
    LOUVAIN_CLIQUES comment), and the engine canonicalizes community
    labels to the minimum member id = size * (v div size)."""
    n = LOUVAIN_CLIQUES * LOUVAIN_CLIQUE_SIZE
    s = LOUVAIN_CLIQUE_SIZE
    return f"""
SELECT CAST(range AS BIGINT) AS v_id,
       CAST((range // {s}) * {s} AS BIGINT) AS community
FROM range({n})
"""


NEG_K = 3
NEG_BUCKETS = 64
NEG_SEED = 0


def negative_samples_oracle_sql(
    k: int = NEG_K, b: int = NEG_BUCKETS, seed: int = NEG_SEED
) -> str:
    """Replays the bucket-representative negative sampler: bucket =
    first-8-hex of md5(v) mod b, representative = min (md5(v), v) per
    bucket, candidate j of src = representative of
    md5('src:j:seed') mod b, minus self-pairs and real edges."""
    hx = "CAST('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 8) AS BIGINT)"
    vb = hx.format(x="v") + f" % {b}"
    cb = (
        "CAST('0x' || substr(md5(CAST(s.v AS VARCHAR) || ':' || "
        f"CAST(j AS VARCHAR) || ':{seed}'), 1, 8) AS BIGINT) % {b}"
    )
    return _materialize(
        f"""WITH {EDGES_CTE},
pos AS (SELECT DISTINCT src, dst FROM edges),
reps AS (
  SELECT bucket, v AS dst FROM (
    SELECT {vb} AS bucket, v, md5(CAST(v AS VARCHAR)) AS h,
           row_number() OVER (
             PARTITION BY {vb}
             ORDER BY md5(CAST(v AS VARCHAR)) ASC, v ASC) AS rn
    FROM verts
  ) WHERE rn = 1
),
cand AS (
  SELECT DISTINCT s.v AS src, {cb} AS bucket
  FROM verts s, range(1, {k + 1}) r(j)
),
neg AS (
  SELECT c.src, r.dst FROM cand c JOIN reps r USING (bucket)
  WHERE c.src <> r.dst
),
negf AS (
  SELECT n.src, n.dst FROM neg n
  LEFT JOIN pos p ON n.src = p.src AND n.dst = p.dst
  WHERE p.src IS NULL
)
SELECT src, dst, CAST(1 AS BIGINT) AS label FROM pos
UNION ALL
SELECT src, dst, CAST(0 AS BIGINT) AS label FROM negf"""
    )


DS_ROUNDS = 3
DS_EPS = 0.01


def densest_oracle_sql(k: int = DS_ROUNDS, eps: float = DS_EPS) -> str:
    """Unrolled (1+ε)-peeling: per round, density = |E|/|V| of the
    surviving undirected simple graph, peel degrees ≤ (2·(1+ε)·|E|)/|V|
    (the identical double expression the engine inlines), best round =
    max density with ties to the earliest; output = the vertex set
    entering the best round. Matches
    :func:`cminer_spark.operators.densest.densest_subgraph` with
    ``max_rounds=k`` exactly."""
    parts = [
        f"WITH {EDGES_CTE}",
        ",\ne0 AS (SELECT u AS a, v AS b FROM sym WHERE u < v)",
    ]
    for i in range(0, k + 1):
        parts.append(
            f""",
vx{i} AS (SELECT a AS v FROM e{i} UNION SELECT b AS v FROM e{i}),
st{i} AS (SELECT (SELECT count(*) FROM e{i}) AS ec,
                 (SELECT count(*) FROM vx{i}) AS vc)"""
        )
        if i < k:
            parts.append(
                f""",
peel{i} AS (
  SELECT v FROM (
    SELECT v, count(*) AS d
    FROM (SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i}) t
    GROUP BY v
  ) dd, st{i} s
  WHERE dd.d <= (2.0 * (1.0 + {eps}) * s.ec) / s.vc
),
e{i + 1} AS (
  SELECT e.a, e.b FROM e{i} e
  LEFT JOIN peel{i} pa ON e.a = pa.v
  LEFT JOIN peel{i} pb ON e.b = pb.v
  WHERE pa.v IS NULL AND pb.v IS NULL
)"""
            )
    dens_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS r, CASE WHEN vc > 0 THEN ec * 1.0 / vc END AS density"
        f" FROM st{i}"
        for i in range(0, k + 1)
    )
    set_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS r, v FROM vx{i}" for i in range(0, k + 1)
    )
    parts.append(
        f""",
dens AS ({dens_rows}),
best AS (SELECT r FROM dens WHERE density IS NOT NULL
         ORDER BY density DESC, r ASC LIMIT 1),
sets AS ({set_rows})
SELECT s.v AS v_id FROM sets s JOIN best b ON s.r = b.r"""
    )
    return _materialize("".join(parts))


MSF_CLIQUES = 8
MSF_CLIQUE_SIZE = 6


def msf_planted_edges(spark: SparkSession) -> DataFrame:
    """Weighted ring-of-cliques for the Borůvka gate: vertex ids dense
    from 0, intra-clique edge (v, u), v < u, weight v*1000 + u (unique;
    the clique MST is therefore the star around the min member), one
    ring bridge per clique with weight 1e6 + c (unique, all heavier
    than every intra edge; the ring cycle drops exactly its heaviest
    bridge). MSF closed form = msf_oracle_sql."""
    size, nc = MSF_CLIQUE_SIZE, MSF_CLIQUES
    v = spark.range(nc * size).select(F.col("id").alias("v"))
    intra = (
        v.crossJoin(v.select(F.col("v").alias("u")))
        .where(
            (F.col("v") < F.col("u"))
            & (F.floor(F.col("v") / size) == F.floor(F.col("u") / size))
        )
        .select(
            F.col("v").alias("src"),
            F.col("u").alias("dst"),
            (F.col("v") * 1000 + F.col("u")).cast("double").alias("weight"),
        )
    )
    bridges = spark.range(nc).select(
        (F.col("id") * size).alias("src"),
        (((F.col("id") + 1) % nc) * size).alias("dst"),
        (F.lit(1_000_000) + F.col("id")).cast("double").alias("weight"),
    )
    return intra.union(bridges)


def msf_oracle_sql() -> str:
    """Closed-form MSF of the planted weighted ring-of-cliques:
    per-clique stars around each min member + every ring bridge except
    the heaviest (cycle property on the unique-weight ring). Bridges
    are emitted canonically (lo, hi) to match the engine's
    src < dst convention."""
    n = MSF_CLIQUES * MSF_CLIQUE_SIZE
    s = MSF_CLIQUE_SIZE
    nc = MSF_CLIQUES
    return f"""
SELECT CAST((v // {s}) * {s} AS BIGINT) AS src,
       CAST(v AS BIGINT) AS dst,
       CAST(((v // {s}) * {s}) * 1000 + v AS DOUBLE) AS weight
FROM range({n}) r(v) WHERE v % {s} <> 0
UNION ALL
SELECT CAST(least(c * {s}, ((c + 1) % {nc}) * {s}) AS BIGINT) AS src,
       CAST(greatest(c * {s}, ((c + 1) % {nc}) * {s}) AS BIGINT) AS dst,
       CAST(1000000 + c AS DOUBLE) AS weight
FROM range({nc - 1}) r(c)
"""


def anf_exact_oracle_sql() -> str:
    """Exact neighborhood function N(h), h = 1..2, on the gate graph:
    ordered pairs (u, v), u != v, within h hops of each other over the
    symmetric simple projection. Gates the exact path of the ANF
    operator (``operators/anf.py``); the FM-sketch scale path is
    pytest-toleranced against it."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        """,
r2 AS (
  SELECT DISTINCT a.u, b.v
  FROM sym a JOIN sym b ON a.v = b.u
  WHERE a.u <> b.v
  UNION
  SELECT u, v FROM sym
)
SELECT CAST(1 AS INT) AS h, count(*) AS n_pairs FROM sym
UNION ALL
SELECT CAST(2 AS INT) AS h, count(*) AS n_pairs FROM r2"""
    )


def induced_subgraph_oracle_sql() -> str:
    """G1 induced subgraph (reference ``Graph.py:607-623``): edges with
    BOTH endpoints in the vertex set {v : v % 3 = 0} — the Spark side
    runs the double semi-join against that set materialized as a
    DataFrame; set membership reduces to the defining predicate."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        """
SELECT src, dst, type FROM edges WHERE src % 3 = 0 AND dst % 3 = 0"""
    )


def mine_edge_patterns_oracle_sql(min_support: int = MINE_MINSUP) -> str:
    """Full mining loop (G5/A1/A2) gate, SQL-expressible fragment: on
    the per-conversation transactional DB (one graph per conv_id,
    turn vertices labeled by role, tool vertices labeled 'tool'),
    every frequent single-edge pattern is exactly a frequent
    (src_label, edge_type, dst_label) triple; support = #distinct
    graphs, frequency = #embeddings = #matching edges (no self-loops
    in this DB, so injectivity is free)."""
    return _materialize(
        f"WITH {TRANSCRIPTS_CTE}"
        f""",
e_lab AS (
  SELECT a.conv_id AS g, a.role AS src_label,
         'replies_to' AS etype, b.role AS dst_label
  FROM tr a JOIN tr b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx + 1
  UNION ALL
  SELECT conv_id AS g, role AS src_label, 'invokes' AS etype,
         'tool' AS dst_label
  FROM tr WHERE tool IS NOT NULL
)
SELECT src_label, etype, dst_label,
       count(DISTINCT g) AS support, count(*) AS frequency
FROM e_lab
GROUP BY src_label, etype, dst_label
HAVING count(DISTINCT g) >= {min_support}"""
    )


def verify_solutions_oracle_sql(min_support: int = MINE_MINSUP) -> str:
    """Independent recomputation of the verify_solutions gate: the
    actual support/frequency of every frequent single-edge pattern is
    the mine_edge_patterns aggregate itself; a correct round-trip
    (mine → sink → parse → re-match) claims exactly those counts, so
    claimed == actual and verified = true on every row."""
    return _materialize(
        f"WITH {TRANSCRIPTS_CTE}"
        f""",
e_lab AS (
  SELECT a.conv_id AS g, a.role AS src_label,
         'replies_to' AS etype, b.role AS dst_label
  FROM tr a JOIN tr b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx + 1
  UNION ALL
  SELECT conv_id AS g, role AS src_label, 'invokes' AS etype,
         'tool' AS dst_label
  FROM tr WHERE tool IS NOT NULL
),
agg AS (
  SELECT src_label, etype, dst_label,
         count(DISTINCT g) AS support, count(*) AS frequency
  FROM e_lab
  GROUP BY src_label, etype, dst_label
  HAVING count(DISTINCT g) >= {min_support}
)
SELECT src_label, etype, dst_label,
       support AS claimed_support, support AS actual_support,
       frequency AS claimed_frequency, frequency AS actual_frequency,
       TRUE AS verified
FROM agg"""
    )


def degrees_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}"
        """,
outd AS (SELECT src AS v_id, count(*) AS out_deg FROM edges GROUP BY src),
ind  AS (SELECT dst AS v_id, count(*) AS in_deg  FROM edges GROUP BY dst)
SELECT v.v AS v_id,
       coalesce(o.out_deg, 0) AS out_deg,
       coalesce(i.in_deg, 0)  AS in_deg,
       coalesce(o.out_deg, 0) + coalesce(i.in_deg, 0) AS tot_deg
FROM verts v
LEFT JOIN outd o ON v.v = o.v_id
LEFT JOIN ind  i ON v.v = i.v_id"""
    )


WALK_LEN = 6
WALK_START_MOD = 101
BETW_ROUNDS = 4


def betweenness_oracle_sql(k: int = BETW_ROUNDS) -> str:
    """Brandes with landmark sources (tool hubs), unrolled: forward
    BFS levels carrying σ path counts, then a level-by-level backward
    dependency sweep over the shortest-path DAG — matches
    :func:`cminer_spark.operators.paths.landmark_betweenness` with
    ``max_rounds=k`` (same truncation; compared on
    ``round(betweenness, 6)``)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
seeds AS (SELECT DISTINCT dst AS v FROM edges WHERE type = 'invokes'),
vis0 AS (SELECT v AS lm, v AS v_id, CAST(0 AS BIGINT) AS dist,
                CAST(1 AS BIGINT) AS sigma
         FROM seeds),
f0 AS (SELECT * FROM vis0)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
f{i} AS (SELECT c.lm, c.vv AS v_id, CAST({i} AS BIGINT) AS dist,
                CAST(sum(c.sigma) AS BIGINT) AS sigma
         FROM (SELECT x.lm AS lm, s.v AS vv, x.sigma AS sigma
               FROM f{i-1} x JOIN sym s ON x.v_id = s.u) c
         LEFT JOIN vis{i-1} p ON p.lm = c.lm AND p.v_id = c.vv
         WHERE p.v_id IS NULL
         GROUP BY c.lm, c.vv),
vis{i} AS (SELECT * FROM vis{i-1} UNION ALL SELECT * FROM f{i})"""
        )
    parts.append(
        f""",
dag AS (SELECT su.lm, su.v_id AS u, sv.v_id AS v,
               su.sigma AS sig_u, sv.sigma AS sig_v, sv.dist AS dv
        FROM sym s
        JOIN vis{k} su ON su.v_id = s.u
        JOIN vis{k} sv ON sv.v_id = s.v AND sv.lm = su.lm
                      AND sv.dist = su.dist + 1),
dl{k} AS (SELECT lm, v_id, CAST(0 AS DOUBLE) AS delta
          FROM vis{k} WHERE dist = {k})"""
    )
    for lvl in range(k - 1, -1, -1):
        parts.append(
            f""",
dl{lvl} AS (SELECT b.lm, b.v_id, coalesce(ct.c, CAST(0 AS DOUBLE)) AS delta
            FROM (SELECT lm, v_id FROM vis{k} WHERE dist = {lvl}) b
            LEFT JOIN (SELECT d.lm, d.u AS v_id,
                              sum(CAST(d.sig_u AS DOUBLE) / d.sig_v
                                  * (CAST(1 AS DOUBLE) + x.delta)) AS c
                       FROM dag d
                       JOIN dl{lvl+1} x ON x.lm = d.lm AND x.v_id = d.v
                       WHERE d.dv = {lvl + 1}
                       GROUP BY d.lm, d.u) ct
              ON ct.lm = b.lm AND ct.v_id = b.v_id)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM dl{lvl}" for lvl in range(0, k + 1)
    )
    parts.append(
        f"""
SELECT v_id, round(sum(delta), 6) AS betweenness
FROM ({union}) t
WHERE v_id <> lm
GROUP BY v_id"""
    )
    return _materialize("".join(parts))


def random_walks_oracle_sql(k: int = WALK_LEN) -> str:
    """Step-unrolled replay of the hash-argmin walks — DuckDB picks
    each step's neighbor by the identical ``md5('0:walk:step:dst')``
    ranking, so the walks match row-for-row (see
    :func:`cminer_spark.operators.walks.random_walks`)."""
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
e2 AS (SELECT DISTINCT src AS u, dst AS v FROM edges),
w0 AS (SELECT v AS walk_id, v AS v_id FROM verts
       WHERE v % {WALK_START_MOD} = 0 AND v < 1000000000)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
w{i} AS (SELECT walk_id, v_id FROM (
  SELECT c.walk_id, c.v AS v_id,
         row_number() OVER (
           PARTITION BY c.walk_id
           ORDER BY md5('0:' || CAST(c.walk_id AS VARCHAR)
                        || ':{i}:' || CAST(c.v AS VARCHAR)), c.v) AS rn
  FROM (SELECT w.walk_id, e.v FROM w{i-1} w JOIN e2 e ON w.v_id = e.u) c
) t WHERE rn = 1)"""
        )
    selects = [
        f"SELECT walk_id, CAST({i} AS BIGINT) AS step, v_id FROM w{i}"
        for i in range(0, k + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return _materialize("".join(parts))


SSSP_ROUNDS = 4


def sssp_oracle_sql(k: int = SSSP_ROUNDS) -> str:
    """k rounds of WEIGHTED multi-source min-plus relaxation
    (undirected, deterministic integer weights ``(u + v) % 7 + 1``)
    from the tool-hub vertices — matches
    :func:`cminer_spark.operators.paths.shortest_paths` with
    ``weight_col=, directed=False, max_rounds=k`` (the ≤k-edge-path
    minimum; engine self-loops and parallel edges cannot change a
    min-plus state, so the simple-projection oracle is exact)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
wsym AS (SELECT u, v, CAST((u + v) % 7 + 1 AS DOUBLE) AS w FROM sym),
seeds AS (SELECT DISTINCT dst AS v FROM edges WHERE type = 'invokes'),
d0 AS (SELECT v, CAST(0 AS DOUBLE) AS dist FROM seeds)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
rx{i} AS (SELECT s.v AS v, d.dist + s.w AS dist
          FROM d{i-1} d JOIN wsym s ON d.v = s.u),
d{i} AS (SELECT v, min(dist) AS dist
         FROM (SELECT * FROM d{i-1} UNION ALL SELECT * FROM rx{i}) t
         GROUP BY v)"""
        )
    parts.append(f"\nSELECT v AS v_id, dist FROM d{k}")
    return _materialize("".join(parts))


def diameter_oracle_sql(k: int = BFS_ROUNDS) -> str:
    """Two unrolled k-round BFS sweeps (min-id start → farthest →
    eccentricity) — matches
    :func:`cminer_spark.operators.paths.diameter_estimate` with
    ``max_rounds=k`` (same truncation)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
seed1 AS (SELECT min(v) AS v FROM verts),
a0 AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM seed1)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
arx{i} AS (SELECT s.v AS v, d.dist + 1 AS dist
           FROM a{i-1} d JOIN sym s ON d.v = s.u),
a{i} AS (SELECT v, min(dist) AS dist
         FROM (SELECT * FROM a{i-1} UNION ALL SELECT * FROM arx{i}) t
         GROUP BY v)"""
        )
    parts.append(
        f""",
farv AS (SELECT v FROM a{k} ORDER BY dist DESC, v ASC LIMIT 1),
b0 AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM farv)"""
    )
    for i in range(1, k + 1):
        parts.append(
            f""",
brx{i} AS (SELECT s.v AS v, d.dist + 1 AS dist
           FROM b{i-1} d JOIN sym s ON d.v = s.u),
b{i} AS (SELECT v, min(dist) AS dist
         FROM (SELECT * FROM b{i-1} UNION ALL SELECT * FROM brx{i}) t
         GROUP BY v)"""
        )
    parts.append(
        f"""
SELECT (SELECT min(v) FROM verts) AS start_v,
       (SELECT v FROM farv) AS peripheral_v,
       (SELECT coalesce(max(dist), 0) FROM b{k}) AS diameter_lb"""
    )
    return _materialize("".join(parts))


TRUSS_K = 3
TRUSS_ROUNDS = 3


def ktruss_oracle_sql(k: int = TRUSS_K, rounds: int = TRUSS_ROUNDS) -> str:
    """``rounds`` unrolled peel iterations — each recomputes per-edge
    triangle support on the survivors (degree-ordered orientation,
    same shape as the triangle oracle) and drops edges below k−2.
    Stable within ``rounds`` on the gate graph, so this equals the
    converged :func:`cminer_spark.operators.truss.ktruss_edges`."""
    need = k - 2
    parts = [
        f"WITH {EDGES_CTE}",
        """,
e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM edges WHERE src <> dst)""",
    ]
    for i in range(rounds):
        parts.append(
            f""",
d{i} AS (SELECT v, count(*) AS dg
         FROM (SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i}) t
         GROUP BY v),
o{i} AS (SELECT CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                     THEN u.a ELSE u.b END AS lo,
                CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
                     THEN u.b ELSE u.a END AS hi
         FROM e{i} u JOIN d{i} da ON u.a = da.v JOIN d{i} db ON u.b = db.v),
wg{i} AS (SELECT e1.lo AS piv, e1.hi AS x, e2.hi AS y
          FROM o{i} e1 JOIN o{i} e2 ON e1.lo = e2.lo WHERE e1.hi < e2.hi),
cg{i} AS (SELECT least(lo, hi) AS x, greatest(lo, hi) AS y FROM o{i}),
tg{i} AS (SELECT w.piv, w.x, w.y
          FROM wg{i} w JOIN cg{i} c ON w.x = c.x AND w.y = c.y),
te{i} AS (SELECT least(piv, x) AS a, greatest(piv, x) AS b FROM tg{i}
          UNION ALL SELECT least(piv, y), greatest(piv, y) FROM tg{i}
          UNION ALL SELECT x, y FROM tg{i}),
sp{i} AS (SELECT a, b, count(*) AS sup FROM te{i} GROUP BY a, b),
e{i + 1} AS (SELECT e.a, e.b
             FROM e{i} e JOIN sp{i} s ON e.a = s.a AND e.b = s.b
             WHERE s.sup >= {need})"""
        )
    parts.append(f"\nSELECT a, b FROM e{rounds}")
    return _materialize("".join(parts))


SAMPLE_FANOUTS = (3, 2)
SAMPLE_SEED_MOD = 211


def sample_neighborhoods_oracle_sql(
    fanouts: tuple[int, ...] = SAMPLE_FANOUTS,
) -> str:
    """Hop-unrolled replay of the fixed-fanout neighborhood sampler —
    DuckDB reproduces the md5 ranking, per-seed visited exclusion, and
    per-(seed, src) fanout cut (see
    :func:`cminer_spark.operators.sampling.sample_neighborhoods`)."""
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
fr0 AS (SELECT v AS seed_id, v AS v_id FROM verts
        WHERE v % {SAMPLE_SEED_MOD} = 0 AND v < 1000000000),
vis0 AS (SELECT * FROM fr0)""",
    ]
    for h, f in enumerate(fanouts, start=1):
        parts.append(
            f""",
s{h} AS (SELECT seed_id, src, dst FROM (
  SELECT c.seed_id, c.src, c.dst,
         row_number() OVER (
           PARTITION BY c.seed_id, c.src
           ORDER BY md5('0:' || CAST(c.seed_id AS VARCHAR) || ':{h}:'
                        || CAST(c.src AS VARCHAR) || ':'
                        || CAST(c.dst AS VARCHAR)), c.dst) AS rn
  FROM (SELECT fr.seed_id, fr.v_id AS src, s.v AS dst
        FROM fr{h-1} fr JOIN sym s ON fr.v_id = s.u) c
  LEFT JOIN vis{h-1} p ON p.seed_id = c.seed_id AND p.v_id = c.dst
  WHERE p.v_id IS NULL
) t WHERE rn <= {f}),
fr{h} AS (SELECT DISTINCT seed_id, dst AS v_id FROM s{h}),
vis{h} AS (SELECT * FROM vis{h-1} UNION SELECT * FROM fr{h})"""
        )
    selects = [
        f"SELECT seed_id, CAST({h} AS BIGINT) AS hop, src, dst FROM s{h}"
        for h in range(1, len(fanouts) + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return _materialize("".join(parts))


N2V_WR, N2V_WC, N2V_WF = 1, 4, 2


def node2vec_oracle_sql(
    k: int = WALK_LEN,
    wr: int = N2V_WR,
    wc: int = N2V_WC,
    wf: int = N2V_WF,
) -> str:
    """Step-unrolled replay of the second-order biased walks — DuckDB
    rebuilds the (return / common-neighbor / far) integer weights and
    the replica-argmin ``md5(seed:walk:step:dst:j)`` choice, so the
    walks match row-for-row (see
    :func:`cminer_spark.operators.walks.node2vec_walks`)."""
    max_w = max(wr, wc, wf)
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
e2 AS (SELECT DISTINCT src AS u, dst AS v FROM edges),
reps AS (SELECT unnest(range(1, {max_w + 1})) AS j),
n0 AS (SELECT v AS walk_id, CAST(NULL AS BIGINT) AS prev, v AS v_id
       FROM verts WHERE v % {WALK_START_MOD} = 0 AND v < 1000000000)""",
    ]
    for s in range(1, k + 1):
        parts.append(
            f""",
n{s} AS (SELECT walk_id, prev, v_id FROM (
  SELECT c.walk_id, c.cur AS prev, c.dst AS v_id,
         row_number() OVER (
           PARTITION BY c.walk_id
           ORDER BY md5('0:' || CAST(c.walk_id AS VARCHAR) || ':{s}:'
                        || CAST(c.dst AS VARCHAR) || ':'
                        || CAST(r.j AS VARCHAR)), c.dst, r.j) AS rn
  FROM (SELECT n.walk_id, n.v_id AS cur, e.v AS dst,
               CASE WHEN e.v = n.prev THEN {wr}
                    WHEN cm.v IS NOT NULL THEN {wc}
                    ELSE {wf} END AS w
        FROM n{s-1} n
        JOIN e2 e ON n.v_id = e.u
        LEFT JOIN e2 cm ON cm.u = n.prev AND cm.v = e.v) c
  JOIN reps r ON r.j <= c.w
) t WHERE rn = 1)"""
        )
    selects = [
        f"SELECT walk_id, CAST({s} AS BIGINT) AS step, v_id FROM n{s}"
        for s in range(0, k + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return _materialize("".join(parts))


SCC_K = 8

# Gate graph for SCC: conversation chains truncated to turn_idx < 8,
# with cycle-closing back edges turn_{t-3} -> turn_t at t in {3, 7}
# (the replies_to chain already provides t -> t-3), so nontrivial
# SCCs are the 4-turn segments {t-3..t} and everything else —
# tool sinks, short chains — is a singleton. The truncation bounds
# every pairwise directed distance by 7, so the k=8 unrolled
# closure oracle below is the TRUE transitive closure.
SCC_EDGES_CTE = (
    TRANSCRIPTS_CTE
    + """,
edges8 AS (
  SELECT user_id * 100000 + turn_idx     AS src,
         user_id * 100000 + turn_idx - 1 AS dst
  FROM tr WHERE turn_idx > 0 AND turn_idx < 8
  UNION ALL
  SELECT user_id * 100000 + turn_idx - 3 AS src,
         user_id * 100000 + turn_idx     AS dst
  FROM tr WHERE turn_idx IN (3, 7)
  UNION ALL
  SELECT user_id * 100000 + turn_idx AS src,
         1000000000 + (event_id % 7) AS dst
  FROM tr WHERE tool IS NOT NULL AND turn_idx < 8
)
"""
)


def scc_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_events(spark, sf_dir)
    return spark.sql(f"WITH {SCC_EDGES_CTE} SELECT src, dst FROM edges8")


def scc_oracle_sql(k: int = SCC_K) -> str:
    """SCC labels via k-bounded transitive closure: scc(v) =
    min{u : v →≤k u AND u →≤k v}. Exact on the truncated gate graph
    (every directed distance ≤ 7 < k), matching
    :func:`cminer_spark.operators.scc.strongly_connected_components`'s
    canonical min-member labels."""
    parts = [
        f"WITH {SCC_EDGES_CTE}",
        """,
vertsS AS (SELECT src AS v FROM edges8 UNION SELECT dst AS v FROM edges8),
r0 AS (SELECT v AS s, v AS t FROM vertsS)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
r{i} AS (SELECT s, t FROM r{i-1}
         UNION
         SELECT r.s, e.dst AS t FROM r{i-1} r JOIN edges8 e ON r.t = e.src)"""
        )
    parts.append(
        f"""
SELECT a.s AS v_id, min(a.t) AS scc
FROM r{k} a JOIN r{k} b ON a.t = b.s AND b.t = a.s
GROUP BY a.s"""
    )
    return _materialize("".join(parts))


DEGREES_CTES = """,
outd AS (SELECT src AS v_id, count(*) AS out_deg FROM edges GROUP BY src),
ind  AS (SELECT dst AS v_id, count(*) AS in_deg  FROM edges GROUP BY dst),
alldeg AS (SELECT v.v AS v_id,
                  coalesce(o.out_deg, 0) AS out_deg,
                  coalesce(i.in_deg, 0)  AS in_deg,
                  coalesce(o.out_deg, 0) + coalesce(i.in_deg, 0) AS tot_deg
           FROM verts v
           LEFT JOIN outd o ON v.v = o.v_id
           LEFT JOIN ind  i ON v.v = i.v_id)
"""


def graph_summary_oracle_sql() -> str:
    """One-row summary — integer sufficient statistics + one final
    double expression per derived column, matching
    :func:`cminer_spark.operators.stats.graph_summary` bit-for-bit."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        """,
rowstats AS (SELECT count(*) AS n_edges,
                    CAST(coalesce(sum(CASE WHEN src = dst THEN 1 ELSE 0 END), 0)
                         AS BIGINT) AS n_self_loops
             FROM edges),
nv AS (SELECT count(DISTINCT v) AS n_vertices FROM verts),
pd AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
up AS (SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
              count(*) AS dirs
       FROM pd GROUP BY least(src, dst), greatest(src, dst)),
ps AS (SELECT CAST(coalesce(sum(dirs), 0) AS BIGINT) AS n_pairs,
              CAST(coalesce(sum(CASE WHEN dirs = 2 THEN 2 ELSE 0 END), 0)
                   AS BIGINT) AS n_reciprocal
       FROM up)
SELECT n_vertices, n_edges, n_self_loops, n_pairs, n_reciprocal,
       CASE WHEN n_pairs > 0
            THEN n_reciprocal / CAST(n_pairs AS DOUBLE) ELSE 0.0 END
         AS reciprocity,
       CASE WHEN n_vertices > 1
            THEN n_pairs / (CAST(n_vertices AS DOUBLE)
                            * (CAST(n_vertices AS DOUBLE) - 1.0))
            ELSE 0.0 END AS density
FROM rowstats, nv, ps"""
    )


def degree_histogram_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}{DEGREES_CTES}"
        """
SELECT CAST(tot_deg AS BIGINT) AS tot_deg, count(*) AS n_vertices
FROM alldeg GROUP BY tot_deg"""
    )


def assortativity_oracle_sql() -> str:
    """Directed out–in Pearson r from six integer moment sums with one
    closed-form double expression — matches
    :func:`cminer_spark.operators.stats.degree_assortativity` (gate
    compares ``round(r, 6)``)."""
    return _materialize(
        f"WITH {EDGES_CTE}{DEGREES_CTES}"
        """,
j AS (SELECT dx.out_deg AS x, dy.in_deg AS y
      FROM edges e
      JOIN alldeg dx ON e.src = dx.v_id
      JOIN alldeg dy ON e.dst = dy.v_id),
s AS (SELECT count(*) AS m,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(y * y) AS HUGEINT) AS syy
      FROM j)
SELECT m,
       CASE WHEN m > 0 AND m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
            THEN round((m * sxy - sx * sy)
                       / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                              * CAST(m * syy - sy * sy AS DOUBLE)), 6)
       END AS assortativity
FROM s"""
    )


def closeness_oracle_sql(k: int = BFS_ROUNDS) -> str:
    """k rounds of landmark-tagged BFS from the tool-hub vertices,
    rolled up to harmonic closeness — matches
    :func:`cminer_spark.operators.paths.harmonic_closeness` with the
    same landmark set and ``max_rounds=k`` (compared on
    ``round(closeness, 6)``: each group sums ≤7 doubles, so
    engine-order noise is ~1e-16 against a 1e-6 grid)."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
seeds AS (SELECT DISTINCT dst AS v FROM edges WHERE type = 'invokes'),
d0 AS (SELECT v AS lm, v, CAST(0 AS BIGINT) AS dist FROM seeds)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
rx{i} AS (SELECT d.lm, s.v AS v, d.dist + 1 AS dist
          FROM d{i-1} d JOIN sym s ON d.v = s.u),
d{i} AS (SELECT lm, v, min(dist) AS dist
         FROM (SELECT * FROM d{i-1} UNION ALL SELECT * FROM rx{i}) t
         GROUP BY lm, v)"""
        )
    parts.append(
        f"""
SELECT v AS v_id,
       CAST(sum(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
       round(coalesce(sum(CASE WHEN dist > 0
                               THEN CAST(1 AS DOUBLE) / dist END), 0.0), 6)
         AS closeness
FROM d{k} GROUP BY v"""
    )
    return _materialize("".join(parts))


def degrees_by_type_oracle_sql() -> str:
    return _materialize(
        f"WITH {EDGES_CTE}"
        """,
outd AS (SELECT src AS v_id, type, count(*) AS t_out_deg FROM edges GROUP BY src, type),
ind  AS (SELECT dst AS v_id, type, count(*) AS t_in_deg  FROM edges GROUP BY dst, type)
SELECT coalesce(o.v_id, i.v_id) AS v_id,
       coalesce(o.type, i.type) AS type,
       coalesce(o.t_out_deg, 0) AS t_out_deg,
       coalesce(i.t_in_deg, 0)  AS t_in_deg
FROM outd o
FULL OUTER JOIN ind i ON o.v_id = i.v_id AND o.type = i.type"""
    )


EIG_ITERS = 5


def eigenvector_oracle_sql(k: int = EIG_ITERS) -> str:
    """Unrolled power iteration ``x ← Aᵀx / ‖Aᵀx‖₂`` from the uniform
    unit vector — matches
    :func:`cminer_spark.operators.eigen.eigenvector_centrality` in
    fixed-k mode (compared on ``round(score, 6)``). Each step divides
    the PREVIOUS vector's elements first and then multiply-sums,
    exactly the engine's operation order."""
    parts = [
        f"WITH {EDGES_CTE}",
        """,
adjw AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM edges GROUP BY src, dst),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
x0 AS (SELECT v, 1.0 / sqrt(nv.n) AS x FROM verts CROSS JOIN nv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
m{i} AS (SELECT a.dst AS v, sum(a.w * x.x) AS m
         FROM adjw a JOIN x{i-1} x ON a.src = x.v GROUP BY a.dst),
n{i} AS (SELECT sqrt(sum(m * m)) AS nrm FROM m{i}),
x{i} AS (SELECT v.v, coalesce(m.m, 0.0) / n.nrm AS x
         FROM verts v LEFT JOIN m{i} m ON v.v = m.v CROSS JOIN n{i} n)"""
        )
    parts.append(f"\nSELECT v AS v_id, round(x, 6) AS score FROM x{k}")
    return _materialize("".join(parts))


LINKPRED_CAP = 10


def link_pred_oracle_sql(cap: int = LINKPRED_CAP) -> str:
    """Wedge-aggregated link-prediction scores with the pivot-degree
    cap — matches :func:`cminer_spark.operators.linkpred
    .link_prediction_scores` (``min_shared=1``,
    ``max_pivot_degree=cap``, existing edges excluded; floats compared
    on ``round(·, 6)``)."""
    return _materialize(
        f"WITH {EDGES_CTE}"
        + f""",
deg AS (SELECT u AS v, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
piv AS (SELECT s.u AS pivot, s.v, d.deg AS pdeg
        FROM sym s JOIN deg d ON s.u = d.v
        WHERE d.deg <= {cap}),
pairs AS (SELECT e1.v AS a, e2.v AS b,
                 CAST(count(*) AS BIGINT) AS common_neighbors,
                 round(sum(1.0 / ln(CAST(e1.pdeg AS DOUBLE))), 6) AS adamic_adar,
                 round(sum(1.0 / CAST(e1.pdeg AS DOUBLE)), 6) AS resource_allocation
          FROM piv e1 JOIN piv e2 ON e1.pivot = e2.pivot AND e1.v < e2.v
          GROUP BY e1.v, e2.v),
cand AS (SELECT p.* FROM pairs p
         WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.u = p.a AND s.v = p.b))
SELECT c.a, c.b, c.common_neighbors, c.adamic_adar, c.resource_allocation,
       CAST(da.deg * db.deg AS BIGINT) AS pref_attachment
FROM cand c JOIN deg da ON c.a = da.v JOIN deg db ON c.b = db.v"""
    )


def conductance_oracle_sql(k: int = LPA_ROUNDS) -> str:
    """Per-community conductance of the k-round LPA partition —
    integer cut/volume statistics, one final double expression
    (matches :func:`cminer_spark.operators.stats.conductance`)."""
    return _materialize(
        _lpa_ctes(k)
        + f""",
und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        FROM edges WHERE src <> dst),
elab AS (SELECT la.label AS c_lo, lb.label AS c_hi
         FROM und u
         JOIN lab{k} la ON u.lo = la.v_id
         JOIN lab{k} lb ON u.hi = lb.v_id),
contrib AS (
  SELECT c_lo AS c,
         CASE WHEN c_lo = c_hi THEN 1 ELSE 0 END AS intra,
         CASE WHEN c_lo <> c_hi THEN 1 ELSE 0 END AS cut
  FROM elab
  UNION ALL
  SELECT c_hi AS c, 0 AS intra, 1 AS cut FROM elab WHERE c_lo <> c_hi
),
perc AS (SELECT c, CAST(sum(intra) AS BIGINT) AS i,
                CAST(sum(cut) AS BIGINT) AS cutc
         FROM contrib GROUP BY c),
tot AS (SELECT CAST(sum(i) + sum(cutc) / 2 AS BIGINT) AS m FROM perc)
SELECT p.c AS community,
       p.cutc AS cut_edges,
       CAST(2 * p.i + p.cutc AS BIGINT) AS volume,
       CASE WHEN least(2 * p.i + p.cutc, 2 * t.m - (2 * p.i + p.cutc)) > 0
            THEN round(CAST(p.cutc AS DOUBLE)
                       / CAST(least(2 * p.i + p.cutc,
                                    2 * t.m - (2 * p.i + p.cutc)) AS DOUBLE), 6)
            ELSE 0.0 END AS conductance
FROM perc p CROSS JOIN tot t"""
    )


# ----------------------------------------------------------------------
# r4 wave-3 gates: weighted PageRank, dyad census, feature
# propagation, top-k edge sparsification
# ----------------------------------------------------------------------

# deterministic per-edge weight both engines derive identically from
# the edge key — exercises the weighted stochastic matrix (w/sum(w))
WEIGHT_EXPR = "CAST(1 + (src % 5) AS DOUBLE)"


def weighted_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate graph with the deterministic non-uniform edge weight."""
    _register_events(spark, sf_dir)
    return spark.sql(
        f"WITH {EDGES_CTE} "
        f"SELECT src, dst, type, {WEIGHT_EXPR} AS weight FROM edges"
    )


def pagerank_weighted_oracle_sql(k: int = PR_ITERS, d: float = DAMPING) -> str:
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
adjw AS (SELECT src, dst, CAST(sum({WEIGHT_EXPR}) AS DOUBLE) AS w
         FROM edges GROUP BY src, dst),
outw AS (SELECT src, sum(w) AS ow FROM adjw GROUP BY src),
adj  AS (SELECT a.src, a.dst, a.w / o.ow AS p FROM adjw a JOIN outw o ON a.src = o.src),
nv   AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
dangf AS (SELECT v.v, CASE WHEN o.src IS NULL THEN 1 ELSE 0 END AS dang
          FROM verts v LEFT JOIN outw o ON v.v = o.src),
r0 AS (SELECT v.v, 1.0 / nv.n AS r FROM verts v CROSS JOIN nv)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
m{i} AS (SELECT a.dst AS v, sum(a.p * r.r) AS mass
         FROM adj a JOIN r{i-1} r ON a.src = r.v GROUP BY a.dst),
dg{i} AS (SELECT coalesce(sum(r.r), 0.0) AS dmass
          FROM r{i-1} r JOIN dangf f ON r.v = f.v WHERE f.dang = 1),
r{i} AS (SELECT v.v,
                (1.0 - {d}) / nv.n + {d} * (coalesce(m.mass, 0.0) + dg.dmass / nv.n) AS r
         FROM verts v CROSS JOIN nv CROSS JOIN dg{i} dg
         LEFT JOIN m{i} m ON v.v = m.v)"""
        )
    parts.append(
        f"""
SELECT r.v AS v_id, round(r.r * nv.n, 6) AS rank_x_n
FROM r{k} r CROSS JOIN nv"""
    )
    return _materialize("".join(parts))


# dyad census runs on the gate graph plus a deterministic reversed
# subset (the reply DAG alone has zero mutual dyads — reversing the
# src % 3 = 0 edges plants a known-nonzero reciprocity)
DYAD_EDGES_CTE = (
    EDGES_CTE
    + """,
dedges AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges WHERE src % 3 = 0
)
"""
)


def dyad_census_oracle_sql() -> str:
    return _materialize(
        f"""WITH {DYAD_EDGES_CTE},
e AS (SELECT DISTINCT src, dst FROM dedges WHERE src <> dst),
mm AS (SELECT count(*) AS me
       FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
tt AS (SELECT count(*) AS n_edges FROM e)
SELECT CAST(floor(mm.me / 2.0) AS BIGINT) AS mutual,
       CAST(tt.n_edges - mm.me AS BIGINT) AS asym,
       CAST(tt.n_edges AS BIGINT) AS edges,
       round(CASE WHEN tt.n_edges > 0
                  THEN CAST(mm.me AS DOUBLE) / tt.n_edges
                  ELSE 0.0 END, 6) AS reciprocity
FROM mm CROSS JOIN tt"""
    )


# feature propagation: dim-4 closed-form x0, k=2 damped rounds
PROP_DIM = 4
PROP_ROUNDS = 2
PROP_ALPHA = 0.5


def feature_propagation_oracle_sql(
    k: int = PROP_ROUNDS, alpha: float = PROP_ALPHA, dim: int = PROP_DIM
) -> str:
    vals = ", ".join(f"({p})" for p in range(dim))
    parts = [
        f"WITH {EDGES_CTE}",
        f""",
x0 AS (SELECT v.v, p.pos,
              CAST((v.v % (7 + p.pos)) + 1 AS DOUBLE) AS val
       FROM verts v CROSS JOIN (VALUES {vals}) AS p(pos))""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
nm{i} AS (SELECT s.u AS v, x.pos, avg(x.val) AS nm
          FROM sym s JOIN x{i-1} x ON s.v = x.v
          GROUP BY s.u, x.pos),
x{i} AS (SELECT x.v, x.pos,
                {alpha} * x.val
                + {1.0 - alpha} * coalesce(n.nm, x.val) AS val
         FROM x{i-1} x
         LEFT JOIN nm{i} n ON x.v = n.v AND x.pos = n.pos)"""
        )
    parts.append(
        f"""
SELECT v AS v_id, pos, round(val, 6) AS val FROM x{k}"""
    )
    return _materialize("".join(parts))


TOPK_OUT_K = 3


def topk_out_edges_oracle_sql(k: int = TOPK_OUT_K) -> str:
    # runs on the REVERSED gate graph (tool/turn sinks become heavy
    # sources) with the deterministic weight keyed by the ORIGINAL src
    return _materialize(
        f"""WITH {EDGES_CTE},
rev AS (SELECT dst AS src, src AS dst, {WEIGHT_EXPR} AS weight FROM edges),
coll AS (SELECT src, dst, CAST(sum(weight) AS DOUBLE) AS w
         FROM rev GROUP BY src, dst),
rk AS (SELECT src, dst, w,
              row_number() OVER (PARTITION BY src
                                 ORDER BY w DESC, dst ASC) AS rk
       FROM coll)
SELECT src, dst, w, CAST(rk AS BIGINT) AS rk FROM rk WHERE rk <= {k}"""
    )


# dialogue (context, response) training pairs over the transcript view
PAIRS_HISTORY = 3


def training_pairs_oracle_sql(history: int = PAIRS_HISTORY) -> str:
    return _materialize(
        f"""WITH {TRANSCRIPTS_CTE},
ctx AS (
  SELECT conv_id, turn_idx, role,
         coalesce(text, '') AS response,
         string_agg(role || ': ' || coalesce(text, ''), chr(10))
           OVER (PARTITION BY conv_id
                 ORDER BY turn_idx, role || ': ' || coalesce(text, '')
                 ROWS BETWEEN {history} PRECEDING AND 1 PRECEDING)
           AS context,
         count(*)
           OVER (PARTITION BY conv_id
                 ORDER BY turn_idx, role || ': ' || coalesce(text, '')
                 ROWS BETWEEN {history} PRECEDING AND 1 PRECEDING)
           AS n_context_turns
  FROM tr
)
SELECT conv_id, turn_idx,
       CAST(n_context_turns AS BIGINT) AS n_context_turns,
       coalesce(context, '') AS context,
       response
FROM ctx WHERE role = 'assistant'"""
    )


def graph_diff_oracle_sql() -> str:
    """Mirror of operators.stats.graph_diff over the gate graph's two
    deterministic snapshots: old = (src+dst) % 3 != 0 edges,
    new = (src+dst) % 4 != 0 edges (overlapping subsets, so both the
    added and removed paths carry rows)."""
    return f"""
WITH {EDGES_CTE},
o AS (SELECT DISTINCT src, dst FROM edges WHERE (src + dst) % 3 <> 0),
n AS (SELECT DISTINCT src, dst FROM edges WHERE (src + dst) % 4 <> 0),
added AS (SELECT src, dst, 1 AS a FROM n ANTI JOIN o USING (src, dst)),
removed AS (SELECT src, dst, 0 AS a FROM o ANTI JOIN n USING (src, dst)),
delta AS (SELECT * FROM added UNION ALL SELECT * FROM removed),
perv AS (
  SELECT src AS v_id, a AS ao, 1 - a AS ro, 0 AS ai, 0 AS ri FROM delta
  UNION ALL
  SELECT dst AS v_id, 0 AS ao, 0 AS ro, a AS ai, 1 - a AS ri FROM delta
)
SELECT v_id,
       CAST(sum(ao) AS BIGINT) AS added_out,
       CAST(sum(ro) AS BIGINT) AS removed_out,
       CAST(sum(ai) AS BIGINT) AS added_in,
       CAST(sum(ri) AS BIGINT) AS removed_in,
       CAST(sum(ao) - sum(ro) + sum(ai) - sum(ri) AS BIGINT) AS degree_delta
FROM perv GROUP BY v_id
"""
