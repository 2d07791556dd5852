"""Pattern orbits + symmetry breaking (SURVEY §2.7 G3/G4).

Driver-side: patterns are tiny (≤8 nodes), so this mirrors the
reference's driver-side computation rather than inventing a
distributed one.

* :func:`node_orbits` / :func:`edge_orbits` — reference-parity LOCAL
  equivalence orbits (same label set + same sorted in/out edge-type
  multisets; ``/root/reference/src/Graph/Graph.py:290-347``). Note:
  this is a heuristic — locally equivalent nodes need not be
  automorphic (one reason the reference ships its symmetry breaking
  disabled, ``BreakingConditions.py`` call sites commented out).
* :func:`automorphism_node_orbits` — EXACT orbits from the brute-force
  automorphism group (the same ≤8-node exhaustive strategy as
  ``mining.canonical_code``): safe to break symmetry on.
* ``match(..., break_symmetry=True)`` consumes
  :func:`symmetry_breaking_predicate`: for the first non-trivial exact
  orbit, require the smallest-id member to bind the smallest target
  vertex of the orbit's image. Single-orbit anchoring is the provably
  safe fragment (orbit-transitivity guarantees a representative per
  automorphism class survives); chaining conditions across orbits
  needs stabilizer reasoning the reference also avoids.
"""

from __future__ import annotations

import itertools

from cminer_spark.operators.matching import Pattern


def _local_sig(pattern: Pattern, n: str) -> tuple:
    out_types = sorted(e.type for e in pattern.edges if e.src == n)
    in_types = sorted(e.type for e in pattern.edges if e.dst == n)
    return (tuple(pattern.nodes[n]), tuple(out_types), tuple(in_types))


def node_orbits(pattern: Pattern) -> list[set[str]]:
    """Reference-parity node orbits: nodes with equal label sets and
    equal sorted out/in edge-type multisets (Graph.py:290-334)."""
    orbits: list[set[str]] = []
    unvisited = set(pattern.nodes)
    while unvisited:
        start = min(unvisited)  # deterministic (reference pops arbitrarily)
        unvisited.discard(start)
        orbit = {start}
        sig = _local_sig(pattern, start)
        for n in sorted(unvisited):
            if _local_sig(pattern, n) == sig:
                orbit.add(n)
                unvisited.discard(n)
        orbits.append(orbit)
    return orbits


def edge_orbits(pattern: Pattern) -> list[set[tuple]]:
    """Reference-parity edge orbits: edges whose endpoints carry equal
    label sets and whose types match (Graph.py:336-347,369-388).
    Edges are identified as (src, dst, index-within-parallel)."""
    keyed = []
    seen: dict[tuple, int] = {}
    for e in pattern.edges:
        k = seen.get((e.src, e.dst), 0)
        seen[(e.src, e.dst)] = k + 1
        keyed.append((e.src, e.dst, k, e.type))
    orbits: list[set[tuple]] = []
    unvisited = set(keyed)
    while unvisited:
        start = min(unvisited)
        unvisited.discard(start)
        orbit = {start[:3]}

        def sig(t):
            return (
                tuple(pattern.nodes[t[0]]),
                tuple(pattern.nodes[t[1]]),
                t[3],
            )

        s0 = sig(start)
        for t in sorted(unvisited):
            if sig(t) == s0:
                orbit.add(t[:3])
                unvisited.discard(t)
        orbits.append(orbit)
    return orbits


def _automorphisms(pattern: Pattern) -> list[dict]:
    """All automorphisms of the pattern (label- and type-preserving
    node bijections mapping the edge multiset onto itself). Brute
    force over ≤8-node patterns, like mining.canonical_code."""
    nodes = list(pattern.nodes)
    edge_ms = {}
    for e in pattern.edges:
        edge_ms[(e.src, e.dst, e.type)] = edge_ms.get((e.src, e.dst, e.type), 0) + 1
    autos = []
    for perm in itertools.permutations(nodes):
        m = dict(zip(nodes, perm))
        if any(pattern.nodes[n] != pattern.nodes[m[n]] for n in nodes):
            continue
        mapped = {}
        for (s, d, t), c in edge_ms.items():
            mapped[(m[s], m[d], t)] = mapped.get((m[s], m[d], t), 0) + c
        if mapped == edge_ms:
            autos.append(m)
    return autos


def automorphism_node_orbits(pattern: Pattern) -> list[set[str]]:
    """Exact automorphism orbits (node n ~ m iff some automorphism maps
    n to m) — the sound basis for symmetry breaking."""
    autos = _automorphisms(pattern)
    orbits: list[set[str]] = []
    unvisited = set(pattern.nodes)
    while unvisited:
        start = min(unvisited)
        orbit = {m[start] for m in autos}
        unvisited -= orbit
        orbits.append(orbit)
    return sorted(orbits, key=lambda o: min(o))


def parallel_edge_symmetry_groups(pattern: Pattern) -> list:
    """Edge-key symmetry groups (reference edge breaking conditions,
    ``BreakingConditions.py:98-119``): parallel pattern edges with the
    same endpoints, type AND attrs are interchangeable by an
    automorphism that fixes every node, so their target-edge bindings
    can be forced into ascending order. Returns one representative
    ``PatternEdge`` per group of size ≥ 2 (PatternEdge is a frozen
    dataclass — equal fields ⇒ equal edge). Safe to compose with the
    single-node-orbit anchor: the edge permutations act on edge
    bindings with all nodes fixed (a direct product with the node
    symmetry), so each combined automorphism class keeps ≥1
    representative."""
    from collections import Counter

    counts = Counter(pattern.edges)
    return [e for e, n in sorted(counts.items(), key=lambda kv: repr(kv[0])) if n >= 2]


def symmetry_breaking_predicate(pattern: Pattern) -> tuple[str, list[str]] | None:
    """The safe single-orbit anchor condition: ``(anchor, others)``
    where the anchor (smallest-id member of the first non-trivial
    exact orbit) must bind a target vertex smaller than every other
    member's — each automorphism class keeps ≥1 representative and
    loses the |orbit|× duplicates that differ only by relabeling
    within the orbit. None when the pattern has no symmetry."""
    for orbit in automorphism_node_orbits(pattern):
        if len(orbit) > 1:
            anchor = min(orbit)
            return anchor, sorted(orbit - {anchor})
    return None
