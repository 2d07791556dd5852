"""Whole-graph summary statistics: size, density, reciprocity,
degree histogram, degree assortativity.

The reference keeps per-graph metadata as driver-side counters
(``/root/reference/src/Graph/Graph.py:225-288`` exposes degree
aggregates; ``src/CMiner/CMiner.py:174-227`` consumes graph-level
counts for support) — here the same numbers are distributed
aggregates over the edge table.

Determinism design (these feed hash-compared oracle gates): every
statistic is assembled from INTEGER sufficient statistics (counts and
sums of ``bigint`` degrees — exact in any aggregation order on both
Spark and DuckDB) with at most one final double expression per output
column, so values are bit-identical across engines rather than
"close".

Scale design: one shuffle per independent grain —

* ``graph_summary``: a distinct-pair aggregate (the only required
  dedup shuffle; reciprocity rides the same ``(lo, hi)`` grouping as
  a direction count, so NO self-join of the pair table) plus a
  distinct-vertex count; everything else folds into those two maps.
* ``degree_histogram`` / ``degree_assortativity``: the per-vertex
  degree aggregate, then a re-aggregate to histogram buckets /
  six scalar moment sums. The assortativity edge join broadcasts
  nothing and shuffles the (already per-vertex) degree table twice —
  the same plan shape as one PageRank superstep, so it survives the
  same scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cminer_spark.operators.graph import degrees


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row graph summary.

    Columns::

        n_vertices        distinct endpoints
        n_edges           multigraph edge rows
        n_self_loops      rows with src = dst
        n_pairs           distinct ordered (src, dst) pairs, loops out
        n_reciprocal      ordered non-loop pairs whose reverse exists
        reciprocity       n_reciprocal / n_pairs          (0 if empty)
        density           n_pairs / (n_vertices·(n_vertices-1))

    Reciprocity follows the simple-digraph convention (networkx
    ``overall_reciprocity`` restricted to non-loop edges): a mutual
    (u,v)/(v,u) pair contributes 2 to ``n_reciprocal``.

    Plan: the non-loop distinct pairs are grouped once on the
    unordered ``(lo, hi)`` key counting directions present (1 or 2) —
    reciprocity without joining the pair table to itself.
    """
    row_stats = edges.select(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_self_loops"),
    )
    n_verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .agg(F.countDistinct("v").alias("n_vertices"))
    )
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src"), F.col("dst"))
        .distinct()
        .groupBy(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .agg(F.count(F.lit(1)).alias("dirs"))
        .agg(
            F.coalesce(F.sum("dirs"), F.lit(0)).alias("n_pairs"),
            F.coalesce(
                F.sum(F.when(F.col("dirs") == 2, F.lit(2)).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("n_reciprocal"),
        )
    )
    return (
        row_stats.crossJoin(n_verts)
        .crossJoin(und)
        .select(
            "n_vertices",
            "n_edges",
            F.coalesce("n_self_loops", F.lit(0)).alias("n_self_loops"),
            "n_pairs",
            "n_reciprocal",
            F.when(
                F.col("n_pairs") > 0,
                F.col("n_reciprocal") / F.col("n_pairs").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("reciprocity"),
            F.when(
                F.col("n_vertices") > 1,
                F.col("n_pairs")
                / (
                    F.col("n_vertices").cast("double")
                    * (F.col("n_vertices").cast("double") - 1.0)
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("density"),
        )
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """``(tot_deg, n_vertices)`` — how many vertices carry each total
    (in+out, multigraph) degree. Two aggregates: per-vertex degrees,
    then a tiny re-aggregate on the degree value."""
    return (
        degrees(edges)
        .groupBy("tot_deg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a vertex partition over the SIMPLE
    undirected projection (parallel edges collapsed, self-loops
    dropped): one row ``(m, q)`` with
    ``q = Σ_c [ in_c/m − (d_c / 2m)² ]``.

    ``labels`` is ``(v_id, community)`` — typically the output of
    :func:`cminer_spark.operators.lpa.label_propagation` or
    :func:`cminer_spark.operators.components.connected_components`.
    Vertices missing from ``labels`` form the implicit community of
    their own id.

    Determinism: the community sums are folded into two INTEGER
    totals — ``A = Σ_c in_c`` (intra-community edges) and
    ``B = Σ_c d_c²`` (squared degree sums, accumulated in
    decimal(38,0) so a giant community cannot wrap int64) — and
    ``q = A/m − B/(4m²)`` is one closed-form double expression, so
    Spark and a SQL oracle agree bit-for-bit. networkx parity:
    ``nx.algorithms.community.modularity(Graph, parts,
    weight=None)``.

    Plan shape: the pair dedup shuffle, two label joins against the
    (broadcast-size or shuffle) label table, a per-community
    aggregate, and scalar folds — no step wider than one PageRank
    superstep.
    """
    lab = labels.select("v_id", "community")
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .distinct()
    )
    llo = lab.select(F.col("v_id").alias("lo"), F.col("community").alias("c_lo"))
    lhi = lab.select(F.col("v_id").alias("hi"), F.col("community").alias("c_hi"))
    e_lab = (
        und.join(llo, "lo", "left")
        .join(lhi, "hi", "left")
        .select(
            F.coalesce("c_lo", F.col("lo")).alias("c_lo"),
            F.coalesce("c_hi", F.col("hi")).alias("c_hi"),
        )
    )
    am = e_lab.agg(
        F.count(F.lit(1)).alias("m"),
        F.coalesce(
            F.sum((F.col("c_lo") == F.col("c_hi")).cast("long")), F.lit(0)
        ).alias("a"),
    )
    deg = (
        und.select(F.col("lo").alias("v_id"))
        .union(und.select(F.col("hi").alias("v_id")))
        .groupBy("v_id")
        .agg(F.count(F.lit(1)).alias("d"))
        .join(lab, "v_id", "left")
        .select(F.coalesce("community", F.col("v_id")).alias("c"), "d")
        .groupBy("c")
        .agg(F.sum("d").alias("dc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("dc").cast("decimal(38,0)")
                    * F.col("dc").cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("b")
        )
    )
    md = F.col("m").cast("double")
    return am.crossJoin(deg).select(
        "m",
        F.when(
            F.col("m") > 0,
            F.col("a") / md
            - F.col("b").cast("double") / (F.lit(4.0) * md * md),
        )
        .otherwise(F.lit(0.0))
        .alias("q"),
    )


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance over the SIMPLE undirected
    projection: ``φ(c) = cut(c) / min(vol(c), 2m − vol(c))``.

    The community-quality twin of :func:`modularity` at the
    per-community grain — low conductance = few edges leave the
    community relative to its volume. ``labels`` is ``(v_id,
    community)``; vertices missing from it form the implicit
    community of their own id (same convention as :func:`modularity`).

    Returns ``(community, cut_edges, volume, conductance)`` —
    ``cut_edges``/``volume`` are exact integers; ``conductance`` is
    one closed-form double over them (engine-deterministic, gate
    ``conductance_lpa``). Communities spanning the whole graph
    (``min(vol, 2m − vol) = 0``) get 0.0 by convention.

    Plan shape: the pair-dedup shuffle, two label joins, then ONE
    per-community aggregate over an exploded 2-rows-per-cut-edge
    contribution frame — ``vol = 2·in_c + cut_c`` needs no separate
    degree pass.
    """
    lab = labels.select("v_id", "community")
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .distinct()
    )
    llo = lab.select(F.col("v_id").alias("lo"), F.col("community").alias("c_lo"))
    lhi = lab.select(F.col("v_id").alias("hi"), F.col("community").alias("c_hi"))
    e_lab = (
        und.join(llo, "lo", "left")
        .join(lhi, "hi", "left")
        .select(
            F.coalesce("c_lo", F.col("lo")).alias("c_lo"),
            F.coalesce("c_hi", F.col("hi")).alias("c_hi"),
        )
    )
    contrib = e_lab.select(
        F.explode(
            F.when(
                F.col("c_lo") == F.col("c_hi"),
                F.array(
                    F.struct(
                        F.col("c_lo").alias("c"),
                        F.lit(1).alias("intra"),
                        F.lit(0).alias("cut"),
                    )
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.col("c_lo").alias("c"),
                        F.lit(0).alias("intra"),
                        F.lit(1).alias("cut"),
                    ),
                    F.struct(
                        F.col("c_hi").alias("c"),
                        F.lit(0).alias("intra"),
                        F.lit(1).alias("cut"),
                    ),
                )
            )
        ).alias("t")
    )
    per_c = contrib.groupBy(F.col("t.c").alias("community")).agg(
        F.sum("t.intra").cast("long").alias("in_c"),
        F.sum("t.cut").cast("long").alias("cut_edges"),
    )
    # total m recovered from the community-grain aggregate itself —
    # every edge contributed either one intra row or two cut rows, so
    # m = Σ in_c + Σ cut_c / 2; the unpartitioned window runs over
    # |communities| rows (not |E|), keeping e_lab to ONE scan
    from pyspark.sql import Window

    wall = Window.partitionBy()
    per_c = per_c.withColumn(
        "_m",
        (F.sum("in_c").over(wall) + F.sum("cut_edges").over(wall) / F.lit(2))
        .cast("long"),
    )
    vol = (F.lit(2) * F.col("in_c") + F.col("cut_edges")).cast("long")
    denom = F.least(vol, F.lit(2) * F.col("_m") - vol)
    return per_c.select(
        "community",
        "cut_edges",
        vol.alias("volume"),
        F.when(
            denom > 0, F.col("cut_edges").cast("double") / denom.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Directed out–in degree assortativity (Newman 2002 Pearson r):
    over multigraph edge rows (u, v), the correlation of
    ``x = out_deg(u)`` with ``y = in_deg(v)``.

    Returns one row ``(m, assortativity)`` with ``m`` the edge count.
    ``r`` is computed from six integer sums (m, Σx, Σy, Σxy, Σx²,
    Σy²) in a single closed-form double expression — deterministic
    across engines. The moment sums are carried as ``decimal(38,0)``
    (exact to 10³⁸, matching DuckDB's 128-bit HUGEINT sums) so the
    Σx² · m products cannot silently wrap int64 on skewed 10¹²-edge
    graphs; a graph pathological enough to exceed 10³⁸ yields NULL,
    never garbage.

    networkx parity: ``nx.degree_assortativity_coefficient(g,
    x="out", y="in")`` on a simple digraph.
    """
    deg = degrees(edges)
    out_d = deg.select(F.col("v_id").alias("src"), F.col("out_deg").alias("x"))
    in_d = deg.select(F.col("v_id").alias("dst"), F.col("in_deg").alias("y"))
    joined = edges.select("src", "dst").join(out_d, "src").join(in_d, "dst")

    def dec(c):  # exact 128-bit-class integer accumulation
        return c.cast("decimal(38,0)")

    s = joined.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    md = dec(F.col("m"))
    num = md * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = md * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = md * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "m",
        F.when(
            (F.col("m") > 0) & (varx > 0) & (vary > 0),
            num.cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double")),
        ).alias("assortativity"),
    )


def rank_churn(
    prev: DataFrame,
    cur: DataFrame,
    k: int = 100,
    score_col: str = "rank",
) -> DataFrame:
    """Top-k rank movers between two scorings of the same graph — the
    monitoring companion to the incremental ingest path (compare
    yesterday's PageRank/Katz table to today's).

    Returns ``(v_id, pos_prev, pos_cur, pos_delta, score_prev,
    score_cur)`` for the k largest |position change| (ties broken by
    v_id), where position is the dense 1-based rank by descending
    score (deterministic: ties within a score break by v_id). Vertices
    present on only one side get position NULL there and sort as the
    largest movers.

    Scale shape: two global sort-based windows (unavoidable for exact
    positions — each is one range-partitioned sort, the same cost
    class as any global top-k) + one join on v_id + one top-k. For
    score-delta-only monitoring at 10^12 vertices, filter on
    |score_cur - score_prev| instead and skip the windows.
    """
    from pyspark.sql import Window

    def positioned(df: DataFrame, tag: str) -> DataFrame:
        w = Window.orderBy(F.col(score_col).desc(), F.col("v_id").asc())
        return df.select(
            "v_id",
            F.col(score_col).alias(f"score_{tag}"),
            F.row_number().over(w).alias(f"pos_{tag}"),
        )

    joined = positioned(prev, "prev").join(
        positioned(cur, "cur"), "v_id", "full_outer"
    )
    out = joined.select(
        "v_id",
        "pos_prev",
        "pos_cur",
        (F.col("pos_prev") - F.col("pos_cur")).alias("pos_delta"),
        "score_prev",
        "score_cur",
    )
    mover = F.coalesce(
        F.abs("pos_delta"), F.lit(2_147_483_647)
    )
    return out.orderBy(mover.desc(), F.col("v_id").asc()).limit(k)


def dyad_census(edges: DataFrame) -> DataFrame:
    """Directed dyad census + reciprocity (Holland & Leinhardt 1970).

    Over the directed SIMPLE projection of ``edges(src, dst)``
    (parallel edges collapse, self-loops excluded): counts mutual
    dyads (both directions present), asymmetric dyads (exactly one),
    and ``reciprocity = mutual directed edges / directed edges`` —
    the standard one-number answer to "how conversational is this
    link graph" (a reply graph where tools answer back vs a pure
    broadcast graph).

    Returns one row ``(mutual, asym, edges, reciprocity)``.

    Scale shape: one ``distinct`` shuffle on the pair key, then ONE
    self-join of the simple edge set onto its own reversal
    (shuffle-hash, same key) and a combinable global aggregate — no
    per-vertex state, no window.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mut_edges = e.join(rev.hint("shuffle_hash"), ["src", "dst"], "left_semi")
    # The result is two scalar counts — compute them eagerly so the
    # persisted simple-edge set can be released here instead of
    # leaking cached partitions for the session lifetime. The derived
    # row goes back through Spark expressions (not Python arithmetic)
    # so the round() semantics match the SQL oracle exactly.
    n_edges = e.count()
    n_me = mut_edges.count()
    e.unpersist()
    out = (
        e.sparkSession.createDataFrame(
            [(n_edges, n_me)], "edges long, me long"
        )
        .select(
            (F.col("me") / 2).cast("long").alias("mutual"),
            (F.col("edges") - F.col("me")).cast("long").alias("asym"),
            F.col("edges").cast("long").alias("edges"),
            F.round(
                F.when(F.col("edges") > 0, F.col("me") / F.col("edges"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("reciprocity"),
        )
    )
    return out


def graph_diff(
    old_edges: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Snapshot diff between two edge tables: one row per vertex whose
    incident edge set changed — ``(v_id, added_out, removed_out,
    added_in, removed_in, degree_delta)`` — the monitoring companion
    to the incremental-ingest family (which vertices churned between
    yesterday's and today's graph, and by how much).

    Added/removed edge sets come from two distinct+anti-joins (both
    equi-joins on (src, dst), no all-pairs anything); the per-vertex
    rollup is one combinable aggregate over their union. Multigraph
    note: edge MULTIPLICITY changes are invisible by design — the diff
    is over the distinct edge set (document upstream if parallel-edge
    counts matter).
    """
    o = old_edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    n = new_edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    added = n.join(o, ["src", "dst"], "anti").withColumn("_a", F.lit(1))
    removed = o.join(n, ["src", "dst"], "anti").withColumn("_a", F.lit(0))
    delta = added.unionByName(removed)
    per_v = delta.select(
        F.col("src").alias("v_id"),
        F.col("_a").alias("ao"),
        (1 - F.col("_a")).alias("ro"),
        F.lit(0).alias("ai"),
        F.lit(0).alias("ri"),
    ).unionByName(
        delta.select(
            F.col("dst").alias("v_id"),
            F.lit(0).alias("ao"),
            F.lit(0).alias("ro"),
            F.col("_a").alias("ai"),
            (1 - F.col("_a")).alias("ri"),
        )
    )
    return per_v.groupBy("v_id").agg(
        F.sum("ao").cast("long").alias("added_out"),
        F.sum("ro").cast("long").alias("removed_out"),
        F.sum("ai").cast("long").alias("added_in"),
        F.sum("ri").cast("long").alias("removed_in"),
        (
            F.sum("ao") - F.sum("ro") + F.sum("ai") - F.sum("ri")
        ).cast("long").alias("degree_delta"),
    )
