"""G3 orbits + G4 symmetry breaking + J3 degree prefilter."""

from __future__ import annotations

from cminer_spark.operators.matching import Pattern, match
from cminer_spark.operators.orbits import (
    automorphism_node_orbits,
    edge_orbits,
    node_orbits,
    symmetry_breaking_predicate,
)

from tests.conftest import edges_df


def _wedge():
    # v -> u, v -> w with equal types and labels: u ~ w
    return (
        Pattern()
        .add_node("u", ["a"])
        .add_node("v", ["b"])
        .add_node("w", ["a"])
        .add_edge("v", "u", "t")
        .add_edge("v", "w", "t")
    )


def test_node_orbits_local_equivalence():
    p = _wedge()
    orbits = {frozenset(o) for o in node_orbits(p)}
    assert frozenset({"u", "w"}) in orbits and frozenset({"v"}) in orbits
    # different edge types split the orbit (Graph.py:294-307 checks
    # sorted in/out type multisets)
    p2 = (
        Pattern()
        .add_node("u", ["a"])
        .add_node("v", ["b"])
        .add_node("w", ["a"])
        .add_edge("v", "u", "t")
        .add_edge("v", "w", "s")
    )
    assert frozenset({"u", "w"}) not in {frozenset(o) for o in node_orbits(p2)}


def test_edge_orbits():
    p = _wedge()
    orbits = edge_orbits(p)
    assert len(orbits) == 1 and len(orbits[0]) == 2


def test_automorphism_orbits_cycle_and_path():
    cyc = (
        Pattern()
        .add_edge("a", "b", "t")
        .add_edge("b", "c", "t")
        .add_edge("c", "a", "t")
    )
    assert automorphism_node_orbits(cyc) == [{"a", "b", "c"}]
    path = Pattern().add_edge("a", "b", "t").add_edge("b", "c", "t")
    assert all(len(o) == 1 for o in automorphism_node_orbits(path))
    # local-equivalence heuristic ALSO groups nothing here, but on a
    # directed 4-cycle locals agree while automorphism is exact
    assert symmetry_breaking_predicate(path) is None
    assert symmetry_breaking_predicate(cyc) == ("a", ["b", "c"])


def test_symmetry_breaking_match_wedge(spark):
    # data: hub 0 -> 1..4 (type t)
    e = spark.createDataFrame(
        [(0, i, "t") for i in range(1, 5)], "src long, dst long, type string"
    )
    p = Pattern().add_edge("v", "u", "t").add_edge("v", "w", "t")
    full = {(r.n_v, r.n_u, r.n_w) for r in match(p, e).collect()}
    broken = {(r.n_v, r.n_u, r.n_w) for r in match(p, e, break_symmetry=True).collect()}
    # u/w swap halves the embeddings; every class keeps a representative
    assert len(broken) == len(full) / 2
    assert {frozenset((u, w)) for _v, u, w in broken} == {
        frozenset((u, w)) for _v, u, w in full
    }


def test_symmetry_breaking_cyclic_group_is_safe(spark):
    """Cyclic automorphism groups over-prune under naive total-order
    breaking; the single-orbit min-anchor rule must keep exactly one
    rotation of the data 3-cycle."""
    e = spark.createDataFrame(
        [(10, 30, "t"), (30, 20, "t"), (20, 10, "t")],
        "src long, dst long, type string",
    )
    p = (
        Pattern()
        .add_edge("a", "b", "t")
        .add_edge("b", "c", "t")
        .add_edge("c", "a", "t")
    )
    full = {(r.n_a, r.n_b, r.n_c) for r in match(p, e).collect()}
    assert len(full) == 3  # the three rotations
    broken = {(r.n_a, r.n_b, r.n_c) for r in match(p, e, break_symmetry=True).collect()}
    assert len(broken) == 1 and next(iter(broken))[0] == 10


def test_degree_filter_preserves_semantics(spark):
    import random

    rng = random.Random(5)
    rows = [
        (rng.randrange(12), rng.randrange(12), rng.choice(["t", "s"]))
        for _ in range(40)
    ]
    e = spark.createDataFrame(
        [(s, d, t) for s, d, t in rows if s != d], "src long, dst long, type string"
    )
    p = Pattern().add_edge("a", "b", "t").add_edge("b", "c", "s").add_edge("b", "d", "t")
    on = {tuple(r) for r in match(p, e, degree_filter=True).collect()}
    off = {tuple(r) for r in match(p, e, degree_filter=False).collect()}
    assert on == off and len(on) > 0


def test_parallel_edge_symmetry_groups():
    from cminer_spark.operators.orbits import parallel_edge_symmetry_groups

    p = (
        Pattern()
        .add_edge("u", "v", "w")
        .add_edge("u", "v", "w")
        .add_edge("u", "v", "x")
    )
    groups = parallel_edge_symmetry_groups(p)
    assert len(groups) == 1 and groups[0].type == "w"
    # attr-bearing duplicates group only with equal attrs
    p2 = (
        Pattern()
        .add_edge("u", "v", "w", props={"k": "1"})
        .add_edge("u", "v", "w", props={"k": "2"})
    )
    assert parallel_edge_symmetry_groups(p2) == []
