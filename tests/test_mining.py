"""Frequent-pattern miner vs hand-computed expectations on a
reference-format fixture DB (reference brute-force strategy:
test/brute_force/main.py plants a known pattern and asserts it is
found)."""

from __future__ import annotations

from cminer_spark.operators.mining import (
    canonical_code,
    mine_frequent_patterns,
    patterns_to_df,
)
from cminer_spark.operators.matching import Pattern
from cminer_spark.sources import read_data_db

DB = """t # 0 g0
v 0 blue
v 1 yellow
v 2 red
e 0 1 white
e 1 2 white
t # 1 g1
v 0 blue
v 1 yellow
e 0 1 white
t # 2 g2
v 0 blue
v 1 green
e 0 1 black
"""


def _mine(spark, tmp_path, **kw):
    p = tmp_path / "db.data"
    p.write_text(DB)
    v, e = read_data_db(spark, str(p))
    return mine_frequent_patterns(v, e, **kw)


def test_one_node_patterns(spark, tmp_path):
    mined = _mine(spark, tmp_path, min_support=2, max_edges=0)
    by_labels = {
        tuple(next(iter(m.pattern.nodes.values()))): m for m in mined
    }
    assert by_labels[("blue",)].support == 3
    assert by_labels[("blue",)].frequency == 3
    assert by_labels[("yellow",)].support == 2
    assert ("red",) not in by_labels  # support 1 < 2 (anti-monotone)


def test_edge_pattern_growth(spark, tmp_path):
    mined = _mine(spark, tmp_path, min_support=2, max_edges=1, min_nodes=2)
    # frequent: blue -white-> yellow (g0, g1); nothing else reaches 2
    assert len(mined) == 1
    m = mined[0]
    assert m.support == 2 and m.frequency == 2
    labels = sorted(tuple(v) for v in m.pattern.nodes.values())
    assert labels == [("blue",), ("yellow",)]
    assert m.pattern.edges[0].type == "white"


def test_two_edge_chain(spark, tmp_path):
    mined = _mine(spark, tmp_path, min_support=1, max_edges=2, min_nodes=3)
    codes = {m.code for m in mined}
    want = canonical_code(
        Pattern()
        .add_node("a", ["blue"])
        .add_node("b", ["yellow"])
        .add_node("c", ["red"])
        .add_edge("a", "b", "white")
        .add_edge("b", "c", "white")
    )
    assert want in codes
    chain = [m for m in mined if m.code == want][0]
    assert chain.support == 1 and chain.frequency == 1


def test_no_duplicate_isomorphic_patterns(spark, tmp_path):
    mined = _mine(spark, tmp_path, min_support=1, max_edges=2)
    codes = [m.code for m in mined]
    assert len(codes) == len(set(codes))


def test_relative_support(spark, tmp_path):
    # 0.5 of 3 graphs → min_support 1 (reference CMiner.py:616-628)
    mined = _mine(spark, tmp_path, min_support=0.5, max_edges=0)
    sups = {m.support for m in mined}
    assert 1 in sups  # red/green singletons kept at relative 0.5→1


def test_patterns_to_df_sink_roundtrip(spark, tmp_path):
    mined = _mine(spark, tmp_path, min_support=2, max_edges=1, min_nodes=2)
    df = patterns_to_df(spark, mined)
    from cminer_spark.sources import write_patterns_text

    text = write_patterns_text(df).collect()[0].value
    assert "s 2" in text and "f 2" in text and "white" in text


def test_canonical_code_isomorphism_invariance():
    p1 = (
        Pattern()
        .add_node("x", ["a"])
        .add_node("y", ["b"])
        .add_edge("x", "y", "t")
    )
    p2 = (
        Pattern()
        .add_node("m", ["b"])
        .add_node("n", ["a"])
        .add_edge("n", "m", "t")
    )
    assert canonical_code(p1) == canonical_code(p2)
    p3 = Pattern().add_node("x", ["a"]).add_node("y", ["b"]).add_edge("y", "x", "t")
    assert canonical_code(p1) != canonical_code(p3)
