"""Mining-solution re-verification + solution-set diff (reference
test/checker.py:57-125, test/comparator.py:8-110)."""

from __future__ import annotations

import pytest

from cminer_spark.operators.mining import (
    mine_frequent_patterns,
    pattern_block_text,
    patterns_to_df,
)
from cminer_spark.operators.verify import (
    compare_solutions,
    parse_solutions_text,
    verify_solutions,
)
from cminer_spark.sources.data_format import write_patterns_text


@pytest.fixture(scope="module")
def db(spark):
    """Tiny 6-graph transactional DB with a planted frequent
    a-x->b edge (5/6 graphs) and a rarer b-y->c (2/6)."""
    v_rows, e_rows = [], []
    for g in range(6):
        gid = f"g{g}"
        v_rows += [(gid, 0, ["a"]), (gid, 1, ["b"]), (gid, 2, ["c"])]
        if g < 5:
            e_rows.append((gid, 0, 1, 0, "x"))
        if g < 2:
            e_rows.append((gid, 1, 2, 0, "y"))
    v = spark.createDataFrame(
        v_rows, "graph_id string, v_id long, labels array<string>"
    )
    e = spark.createDataFrame(
        e_rows, "graph_id string, src long, dst long, key int, type string"
    )
    return v, e


def _mine(db, min_support=2):
    v, e = db
    return mine_frequent_patterns(
        v, e, min_support=min_support, max_edges=1, min_nodes=2, max_nodes=2
    )


def test_roundtrip_all_verified(spark, db):
    v, e = db
    mined = _mine(db)
    assert mined
    text_df = write_patterns_text(patterns_to_df(spark, mined))
    out = verify_solutions(v, e, text_df).collect()
    assert len(out) == len(mined)
    assert all(r.support_ok and r.frequency_ok for r in out)
    assert all(r.claimed_support == r.actual_support for r in out)


def test_corrupted_support_is_caught(spark, db):
    """A deliberately corrupted solution file must be flagged, not
    silently accepted (reference checker.py's whole purpose)."""
    v, e = db
    mined = _mine(db)
    text = "\n".join(
        pattern_block_text(mp, i) for i, mp in enumerate(mined)
    )
    corrupted = text.replace(f"s {mined[0].support}", f"s {mined[0].support + 3}", 1)
    out = {r.pattern_id: r for r in verify_solutions(v, e, corrupted).collect()}
    bad = out["0"]
    assert not bad.support_ok
    assert bad.claimed_support == mined[0].support + 3
    assert bad.actual_support == mined[0].support
    # the untouched solutions still verify
    assert all(r.support_ok for pid, r in out.items() if pid != "0")


def test_parse_handles_x_lines_and_ids(spark):
    text = "t # 7\nv 0 a\nv 1 b\ne 0 1 x\ns 5\nf 9\nx (g0, 3) (g1, 2)\n"
    sols = parse_solutions_text(text)
    assert len(sols) == 1
    s = sols[0]
    assert (s.pattern_id, s.support, s.frequency) == ("7", 5, 9)
    assert s.pattern.nodes == {"0": ["a"], "1": ["b"]}


def test_compare_solutions_isomorphic_alignment(spark, db):
    """The diff aligns by canonical code: node renaming / emission
    order must not produce spurious diffs (comparator.py semantics)."""
    mined = _mine(db)
    text_a = "\n".join(pattern_block_text(mp, i) for i, mp in enumerate(mined))
    # same patterns, reversed order and shifted node ids
    blocks = []
    for i, mp in enumerate(reversed(mined)):
        node_ids = {n: j + 10 for j, n in enumerate(mp.pattern.nodes)}
        lines = [f"t # {100 + i}"]
        lines += [
            f"v {node_ids[n]} " + " ".join(mp.pattern.nodes[n])
            for n in mp.pattern.nodes
        ]
        lines += [
            f"e {node_ids[e.src]} {node_ids[e.dst]} {e.type}"
            for e in mp.pattern.edges
        ]
        lines += [f"s {mp.support}", f"f {mp.frequency}"]
        blocks.append("\n".join(lines))
    text_b = "\n".join(blocks)
    diff = compare_solutions(text_a, text_b)
    assert len(diff) == len(mined)
    assert all(d["in_a"] and d["in_b"] and d["support_match"] for d in diff)

    # drop one solution from b and corrupt another's support
    sols_b = parse_solutions_text(text_b)
    sols_b[0].support += 1
    dropped = sols_b.pop()
    diff2 = compare_solutions(text_a, sols_b)
    assert sum(1 for d in diff2 if d["in_a"] and not d["in_b"]) == 1
    assert sum(1 for d in diff2 if d["in_a"] and d["in_b"] and not d["support_match"]) == 1
