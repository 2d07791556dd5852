"""Subgraph pattern matching as a generated multi-way join pipeline.

The reference's matcher (``/root/reference/src/CMiner/MultiGraphMatch.py``)
is a backtracking engine over per-edge candidate lists with bitmap
pruning (J1/J2), degree-based domain filtering (J3) and injectivity
checks (J4/J5, SURVEY §2.3). In Spark the same semantics are one
LEFT-DEEP JOIN PIPELINE: each query edge joins the
embeddings-so-far with the (pre-filtered) target edge table; Catalyst
plans the hash joins, AQE handles skew — the manual posting-list
machinery of the reference is subsumed by the join itself (SURVEY §4).

Semantics mirrored from the reference:

* node-label containment — a target node must carry ALL query node
  labels (``MultiGraphMatch.py:214-223``, ``Graph.py:87-88``);
* edge label equality with ``""`` = wildcard
  (``MultiGraphMatch.py:336-340``, ``Graph.py:18``);
* injective embeddings — no target node reused across query nodes, no
  target edge reused across query edges (``MultiGraphMatch.py:289-301``);
* multigraph identity triple (src, dst, key) (``Graph.py:44-54``);
* transactional DBs — when a ``graph_id`` column is present every
  join stays within one graph, so one ``match`` call embeds the
  pattern in EVERY graph of the DB at once (the reference loops
  graphs one by one, ``CMiner.py:477-488``).

Join ordering is the reference's greedy connected-first heuristic
(``Ordering.py:49-87``) simplified: always extend from already-bound
endpoints (cf-maximal), most-selective first edge — at 100 TB scale
the bound-endpoint rule is what keeps every step an equi-join instead
of a cross product.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WILDCARD = ""  # reference NULL_LABEL (Graph.py:18)


@dataclass(frozen=True)
class PatternEdge:
    src: str
    dst: str
    type: str = WILDCARD
    # required attrs as a sorted tuple of (key, value) string pairs —
    # item-subset containment (reference Graph.edge_contains_attributes,
    # src/Graph/Graph.py:404-419)
    props: tuple = ()


def _props_tuple(props: dict | None) -> tuple:
    return tuple(sorted((str(k), str(v)) for k, v in (props or {}).items()))


@dataclass
class Pattern:
    """Tiny query graph: node id → required labels + required attrs,
    plus typed (optionally attributed) edges."""

    nodes: dict[str, list[str]] = field(default_factory=dict)
    edges: list[PatternEdge] = field(default_factory=list)
    node_props: dict[str, tuple] = field(default_factory=dict)

    def add_node(
        self,
        node_id: str,
        labels: list[str] | None = None,
        props: dict | None = None,
    ) -> "Pattern":
        self.nodes[node_id] = sorted(labels or [])
        if props:
            self.node_props[node_id] = _props_tuple(props)
        return self

    def add_edge(
        self,
        src: str,
        dst: str,
        type: str = WILDCARD,
        props: dict | None = None,
    ) -> "Pattern":
        for n in (src, dst):
            if n not in self.nodes:
                self.nodes[n] = []
        self.edges.append(PatternEdge(src, dst, type, _props_tuple(props)))
        return self


def _pattern_jaccard(pattern: Pattern, a: str, b: str) -> float:
    """Jaccard similarity of two query nodes' neighbor sets in the
    PATTERN graph (reference ``Graph.py:149-163``)."""

    def nbrs(n: str) -> set[str]:
        return {e.dst for e in pattern.edges if e.src == n} | {
            e.src for e in pattern.edges if e.dst == n
        }

    na, nb = nbrs(a), nbrs(b)
    union = na | nb
    return len(na & nb) / len(union) if union else 0.0


def _order_edges(
    pattern: Pattern, domain_card: dict[int, float] | None = None
) -> list[PatternEdge]:
    """Greedy connected-first join ordering.

    Default (``domain_card=None``, lazy — no target statistics): start
    from the edge with the most label/attr/type constraints, then
    always extend from a bound endpoint, preferring more constraints
    (reference Ordering.py:49-87 simplified).

    With ``domain_card`` (per-pattern-edge-index domain-cardinality
    estimates, see :func:`edge_domain_estimates`), uses the
    reference's O1 scores (``Ordering.py:13-47``): maximize
    ``(cf, score)`` where ``cf`` = #already-bound endpoints and

    * cf=0: ``deg(qi)·deg(qj)·(1+jaccard(qi,qj)) / |domain|``
    * cf=1: ``deg(free)·(1+jaccard(qi,qj)) / |domain|``
    * cf≥2: ``1 / |domain|``

    (``deg``/``jaccard`` over the PATTERN graph, Graph.py:149-163,
    225-232). One deliberate divergence: the reference multiplies by
    the bare jaccard, which is 0 for EVERY edge of a tree-shaped
    pattern — collapsing its first pick to input order; smoothing to
    ``1 + jaccard`` keeps the domain estimate decisive there while
    preserving the reference's ranking whenever jaccard
    discriminates."""
    if not pattern.edges:
        return []

    if domain_card is None:

        def selectivity(e: PatternEdge) -> int:
            s = len(pattern.nodes[e.src]) + len(pattern.nodes[e.dst])
            s += len(pattern.node_props.get(e.src) or ())
            s += len(pattern.node_props.get(e.dst) or ())
            s += len(e.props)
            return s + (2 if e.type != WILDCARD else 0)

        remaining = list(pattern.edges)
        first = max(remaining, key=selectivity)
        order = [first]
        remaining.remove(first)
        bound = {first.src, first.dst}
        while remaining:
            connected = [
                e for e in remaining if e.src in bound or e.dst in bound
            ]
            pick = max(connected or remaining, key=selectivity)
            order.append(pick)
            remaining.remove(pick)
            bound.update((pick.src, pick.dst))
        return order

    deg = {n: 0 for n in pattern.nodes}
    for e in pattern.edges:
        deg[e.src] += 1
        deg[e.dst] += 1
    remaining_i = list(range(len(pattern.edges)))
    bound: set[str] = set()
    order = []
    while remaining_i:

        def score(i: int) -> tuple:
            e = pattern.edges[i]
            cf = int(e.src in bound) + int(e.dst in bound)
            dom = max(float(domain_card.get(i, 1.0)), 1e-9)
            jac = 1.0 + _pattern_jaccard(pattern, e.src, e.dst)
            if cf == 0:
                s = deg[e.src] * deg[e.dst] * jac / dom
            elif cf == 1:
                free = e.src if e.src not in bound else e.dst
                s = deg[free] * jac / dom
            else:
                s = 1.0 / dom
            return (cf, s, -i)  # -i: deterministic first-listed tiebreak

        best = max(remaining_i, key=score)
        remaining_i.remove(best)
        e = pattern.edges[best]
        order.append(e)
        bound.update((e.src, e.dst))
    return order


def edge_domain_estimates(
    pattern: Pattern, edges: DataFrame, vertices: DataFrame | None = None
) -> dict[int, float]:
    """O1 domain-cardinality estimates, one per pattern-edge index:
    ``|domain(e)| ≈ count(type) × sel(labels(src)) × sel(labels(dst))``
    — the label-frequency × type-frequency proxy for the reference's
    per-edge compatibility-domain cardinality
    (``CompatibilityDomain.py:17-48``). Costs two tiny catalog
    aggregates (distinct-type counts; per-label counts) collected once
    at planning time — broadcast-sized statistics, never data-sized."""
    type_counts = {
        r["type"]: int(r["c"])
        for r in edges.groupBy("type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    total_edges = sum(type_counts.values())
    label_frac: dict[str, float] = {}
    if vertices is not None:
        n_v = vertices.count()
        label_frac = {
            r["l"]: int(r["c"]) / max(n_v, 1)
            for r in vertices.select(F.explode("labels").alias("l"))
            .groupBy("l")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
    out: dict[int, float] = {}
    for i, e in enumerate(pattern.edges):
        # WILDCARD matches EVERY edge, so its domain is total_edges even
        # when ""-typed edges also exist in the data (JSON loads encode
        # untyped edges as "") — looking "" up in type_counts would
        # drastically underestimate the wildcard's domain and order the
        # unselective edge first.
        if e.type == WILDCARD:
            dom = float(total_edges)
        else:
            dom = float(type_counts.get(e.type, 0.0))
        for node in (e.src, e.dst):
            for lbl in pattern.nodes.get(node) or []:
                dom *= label_frac.get(lbl, 0.0) if label_frac else 1.0
        out[i] = dom
    return out


def _props_pred(col: str, props: tuple) -> F.Column | None:
    """Attribute item-subset containment (F4): every required (k, v)
    must be present with string-equal value in the ``map<string,
    string>`` attrs column (reference Graph.py:390-419).
    ``try_element_at`` keeps missing keys NULL (→ row filtered) instead
    of raising under Spark 4 ANSI map access."""
    pred = None
    for k, v in props:
        p = F.try_element_at(F.col(col), F.lit(k)) == F.lit(v)
        pred = p if pred is None else pred & p
    return pred


def _label_filter(
    vertices: DataFrame, labels: list[str], props: tuple = ()
) -> DataFrame:
    if labels:
        req = F.array(*[F.lit(x) for x in labels])
        vertices = vertices.where(
            F.size(F.array_except(req, F.col("labels"))) == 0
        )
    if props:
        vertices = vertices.where(_props_pred("props", props))
    return vertices


def match(
    pattern: Pattern,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    graph_col: str | None = None,
    include_edges: bool = False,
    break_symmetry: bool = False,
    degree_filter: bool | None = None,
    prefilter_catalog: bool = False,
    order_stats: bool = False,
) -> DataFrame:
    """All injective embeddings of ``pattern``.

    ``edges``: (src, dst, type[, key][, graph_id]); ``vertices``:
    (v_id, labels[, graph_id]) — required only when the pattern
    constrains node labels. Output: one row per embedding with a
    ``n_<node>`` column per pattern node (+ ``graph_id``).
    ``include_edges=True`` keeps one ``e_<i>`` (src,dst,key) struct
    per query edge — full multigraph Mappings (reference
    ``MultiGraphMatch.py:7-15`` node_mapping + edge_mapping); the
    default projects distinct node embeddings.
    ``break_symmetry=True`` applies the safe single-orbit anchor
    condition (G4; see :mod:`cminer_spark.operators.orbits`) plus the
    parallel-edge key conditions (reference
    ``BreakingConditions.py:98-119``) — keeps ≥1 representative per
    automorphism class, dropping within-orbit relabelings and
    parallel-edge key swaps. The reference ships this disabled
    (``BreakingConditions.py`` call sites commented out), so it is
    opt-in here too.
    ``degree_filter`` — J3 degree-domain prefilter (reference
    ``CompatibilityDomain.py:17-48``): a pattern node with several
    incident edges can only bind target vertices of sufficient
    out/in degree, so its candidate scans semi-join against
    degree-qualified vertex sets (semantics-preserving, pure
    pruning). ``None`` auto-enables when some pattern node has ≥2
    incident edges.
    ``prefilter_catalog`` — F1 early-abort label-catalog check
    (reference ``MultiGraphMatch.py:233-240``): collect the target's
    tiny distinct edge-type / node-label catalogs (one small
    aggregate each) and, if the pattern requires a type or label the
    target has nowhere, return the empty embeddings frame WITHOUT
    building or running the join pipeline. Opt-in because it makes
    ``match`` eager (it runs the catalog jobs at call time); the lazy
    path gets the same pruning from the label-selective scans, just
    not the abort.
    ``order_stats`` — O1 statistics-driven join ordering (reference
    ``Ordering.py:13-47``): collect the target's tiny type/label
    catalogs and order query edges by the reference's
    ``deg·jaccard/|domain|`` score shape (see
    :func:`edge_domain_estimates`) instead of the lazy
    constraint-count heuristic. Opt-in for the same reason as
    ``prefilter_catalog`` (eager catalog jobs at call time); pure
    join-order performance, zero semantics.
    """
    if graph_col is None and "graph_id" in edges.columns:
        graph_col = "graph_id"
    if prefilter_catalog and _catalog_miss(pattern, edges, vertices):
        return _empty_embeddings(pattern, edges, graph_col, include_edges)
    key = F.col("key") if "key" in edges.columns else F.lit(0)
    needs_edge_props = any(e.props for e in pattern.edges)
    if needs_edge_props and "props" not in edges.columns:
        raise ValueError("pattern has edge attr predicates but edges has no 'props'")
    base = edges.select(
        "src",
        "dst",
        F.col("type"),
        key.alias("key"),
        *([F.col("props")] if needs_edge_props else []),
        *([F.col(graph_col).alias("_g")] if graph_col else []),
    )

    # J3 degree-domain prefilter: per-node (out, in) degree minima
    # from the pattern's incident-edge counts; vertices below them can
    # never host the node (reference CompatibilityDomain.py:17-48 —
    # per-direction totals here, the per-label refinement is the label
    # semi-join below)
    incident: dict[str, list[int]] = {}
    for e in pattern.edges:
        incident.setdefault(e.src, [0, 0])[0] += 1
        incident.setdefault(e.dst, [0, 0])[1] += 1
    if degree_filter is None:
        degree_filter = any(o + i >= 2 for o, i in incident.values())
    deg_qualified: dict[str, DataFrame] = {}
    if degree_filter:
        gcols = ["_g"] if graph_col else []
        out_tot = base.groupBy(*gcols, F.col("src").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        in_tot = base.groupBy(*gcols, F.col("dst").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        for node, (n_out, n_in) in incident.items():
            if n_out + n_in < 2:
                continue  # a single incident edge is its own witness
            q = None
            if n_out >= 1:
                f = out_tot.where(F.col("c") >= n_out).select(*gcols, "v")
                q = f
            if n_in >= 1:
                f = in_tot.where(F.col("c") >= n_in).select(*gcols, "v")
                q = f if q is None else q.join(f, [*gcols, "v"], "left_semi")
            deg_qualified[node] = q

    def candidates(qe: PatternEdge, idx: int) -> DataFrame:
        c = base
        if qe.type != WILDCARD:
            c = c.where(F.col("type") == qe.type)
        if qe.props:  # F4: edge attr containment, pushed into the scan
            c = c.where(_props_pred("props", qe.props))
        if qe.src == qe.dst:  # self-loop: one binding column
            c = c.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias(f"n_{qe.src}"),
                F.struct("src", "dst", "key").alias(f"e_{idx}"),
                *([F.col("_g")] if graph_col else []),
            )
        else:
            # distinct query nodes can never bind one target vertex —
            # drops data self-loops here so injectivity also holds for
            # the FIRST ordered edge, which sees no later n_x != n_y
            # filters (reference mapping check MultiGraphMatch.py:289-301)
            c = c.where(F.col("src") != F.col("dst")).select(
                F.col("src").alias(f"n_{qe.src}"),
                F.col("dst").alias(f"n_{qe.dst}"),
                F.struct("src", "dst", "key").alias(f"e_{idx}"),
                *([F.col("_g")] if graph_col else []),
            )
        # node-label/attr containment via semi-joins against the
        # filtered vertex sets (F2+F4; the reference's bitmap prefilter
        # J1/J2 collapses into these label-selective scans)
        if vertices is not None:
            for node in (qe.src, qe.dst):
                labels = pattern.nodes.get(node) or []
                nprops = pattern.node_props.get(node) or ()
                if labels or nprops:
                    vs = _label_filter(vertices, labels, nprops).select(
                        F.col("v_id").alias(f"n_{node}"),
                        *(
                            [F.col(graph_col).alias("_g")]
                            if graph_col and graph_col in vertices.columns
                            else []
                        ),
                    )
                    on = [f"n_{node}"] + (
                        ["_g"] if graph_col and "_g" in vs.columns else []
                    )
                    c = c.join(vs, on, "left_semi")
        for node in {qe.src, qe.dst}:
            dq = deg_qualified.get(node)
            if dq is not None:
                c = c.join(
                    dq.withColumnRenamed("v", f"n_{node}"),
                    [f"n_{node}", *(["_g"] if graph_col else [])],
                    "left_semi",
                )
        return c

    order = _order_edges(
        pattern,
        edge_domain_estimates(pattern, edges, vertices) if order_stats else None,
    )
    if not order:
        # node-only pattern: bind nodes from the vertex table (J8)
        if vertices is None:
            raise ValueError("node-only pattern needs a vertices frame")
        emb = None
        for node, labels in pattern.nodes.items():
            vs = _label_filter(
                vertices, labels, pattern.node_props.get(node) or ()
            ).select(
                F.col("v_id").alias(f"n_{node}"),
                *(
                    [F.col(graph_col).alias("_g")]
                    if graph_col and graph_col in vertices.columns
                    else []
                ),
            )
            if emb is None:
                emb = vs
            else:
                emb = emb.join(vs, ["_g"] if graph_col else None, "inner") if (
                    graph_col
                ) else emb.crossJoin(vs)
                prev_nodes = [c for c in emb.columns if c.startswith("n_") and c != f"n_{node}"]
                for p in prev_nodes:
                    emb = emb.where(F.col(p) != F.col(f"n_{node}"))
        if break_symmetry:
            from cminer_spark.operators.orbits import symmetry_breaking_predicate

            cond = symmetry_breaking_predicate(pattern)
            if cond is not None:
                anchor, others = cond
                for o in others:
                    emb = emb.where(F.col(f"n_{anchor}") < F.col(f"n_{o}"))
        return _finalize(emb, pattern, graph_col, 0, include_edges=False)

    emb = candidates(order[0], 0)
    bound_nodes = {order[0].src, order[0].dst}
    for idx, qe in enumerate(order[1:], start=1):
        c = candidates(qe, idx)
        join_keys = sorted(
            {f"n_{n}" for n in (qe.src, qe.dst) if n in bound_nodes}
        )
        if graph_col:
            join_keys.append("_g")
        if join_keys:
            emb = emb.join(c, join_keys, "inner")
        else:  # disconnected component of the pattern
            emb = emb.crossJoin(c)
        # injectivity: new node ≠ every previously bound node (J4)
        for n in (qe.src, qe.dst):
            if n not in bound_nodes:
                for b in bound_nodes:
                    emb = emb.where(F.col(f"n_{n}") != F.col(f"n_{b}"))
                bound_nodes.add(n)
        # edge injectivity: new edge ≠ every previously bound edge
        for prev in range(idx):
            emb = emb.where(F.col(f"e_{idx}") != F.col(f"e_{prev}"))

    # isolated pattern nodes (no incident edges)
    isolated = [n for n in pattern.nodes if n not in bound_nodes]
    for n in isolated:
        if vertices is None:
            raise ValueError(f"isolated pattern node {n!r} needs a vertices frame")
        vs = _label_filter(
            vertices, pattern.nodes.get(n) or [], pattern.node_props.get(n) or ()
        ).select(
            F.col("v_id").alias(f"n_{n}"),
            *(
                [F.col(graph_col).alias("_g")]
                if graph_col and graph_col in vertices.columns
                else []
            ),
        )
        emb = emb.join(vs, ["_g"] if graph_col else None, "inner") if graph_col else emb.crossJoin(vs)
        for b in bound_nodes:
            emb = emb.where(F.col(f"n_{n}") != F.col(f"n_{b}"))
        bound_nodes.add(n)

    if break_symmetry:
        from cminer_spark.operators.orbits import (
            parallel_edge_symmetry_groups,
            symmetry_breaking_predicate,
        )

        cond = symmetry_breaking_predicate(pattern)
        if cond is not None:
            anchor, others = cond
            for o in others:
                emb = emb.where(F.col(f"n_{anchor}") < F.col(f"n_{o}"))
        # edge-key conditions (BreakingConditions.py:98-119): within a
        # group of interchangeable parallel edges, force ascending
        # target-edge bindings — both endpoints bind the same target
        # vertices, so the struct comparison reduces to the key
        for ge in parallel_edge_symmetry_groups(pattern):
            pos = [i for i, oe in enumerate(order) if oe == ge]
            for a, b in zip(pos, pos[1:]):
                emb = emb.where(F.col(f"e_{a}") < F.col(f"e_{b}"))
    return _finalize(emb, pattern, graph_col, len(order), include_edges)


def _catalog_miss(
    pattern: Pattern, edges: DataFrame, vertices: DataFrame | None
) -> bool:
    """True when the pattern requires an edge type or node label the
    target carries NOWHERE — the reference's abort-early prefilter
    (``MultiGraphMatch.py:233-240``). Both catalogs are tiny distinct
    aggregates (label cardinality, not data cardinality)."""
    req_types = {e.type for e in pattern.edges if e.type != WILDCARD}
    if req_types:
        have = {
            r["type"]
            for r in edges.select("type").where(
                F.col("type").isin(sorted(req_types))
            ).distinct().collect()
        }
        if req_types - have:
            return True
    req_labels = {l for ls in pattern.nodes.values() for l in ls}
    if req_labels and vertices is not None:
        have = {
            r["label"]
            for r in vertices.select(F.explode("labels").alias("label"))
            .where(F.col("label").isin(sorted(req_labels)))
            .distinct()
            .collect()
        }
        if req_labels - have:
            return True
    return False


def _empty_embeddings(
    pattern: Pattern,
    edges: DataFrame,
    graph_col: str | None,
    include_edges: bool,
) -> DataFrame:
    """Empty frame with the exact schema ``match`` would produce."""
    spark = edges.sparkSession
    dt = dict(edges.dtypes)
    v_t = dt.get("src", "long")
    k_t = dt.get("key", "int")
    fields = []
    if graph_col:
        fields.append(f"{graph_col} {dt.get(graph_col, 'string')}")
    fields += [f"n_{n} {v_t}" for n in pattern.nodes]
    if include_edges:
        fields += [
            f"e_{i} struct<src:{v_t},dst:{v_t},key:{k_t}>"
            for i in range(len(pattern.edges))
        ]
    return spark.createDataFrame([], ", ".join(fields))


def _finalize(
    emb: DataFrame,
    pattern: Pattern,
    graph_col: str | None,
    n_edges: int,
    include_edges: bool,
) -> DataFrame:
    cols = [F.col(f"n_{n}") for n in pattern.nodes]
    if graph_col:
        cols = [F.col("_g").alias(graph_col)] + cols
    if include_edges:
        cols += [F.col(f"e_{i}") for i in range(n_edges)]
        return emb.select(*cols)
    return emb.select(*cols).distinct()


def support(
    embeddings: DataFrame, graph_col: str = "graph_id", min_support: int | None = None
) -> DataFrame:
    """Transactional support = #distinct graphs containing ≥1 embedding
    (reference PatternMappings.support, CMiner.py:251-255; A1 HAVING
    filter CMiner.py:205-227)."""
    agg = embeddings.agg(F.countDistinct(graph_col).alias("support"))
    if min_support is not None:
        agg = agg.where(F.col("support") >= min_support)
    return agg
