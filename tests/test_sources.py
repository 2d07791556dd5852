"""Reference-format sources: .data DB, CSV dirs, JSON node-link,
pattern text, result sink — fixture strings written in the reference's
formats (test/Datasets/small-size-db style, NOT copied files)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cminer_spark.operators.matching import Pattern, match, support
from cminer_spark.sources import (
    parse_pattern_text,
    read_csv_graph_db,
    read_data_db,
    read_json_graph,
    write_patterns_text,
)

DB1 = """t # 0 g0
v 0 blue
v 1 yellow red
v 2 purple
e 0 1 white
e 0 1 white
e 1 2 gray
t # 1 g1
v 0 blue
v 1 yellow
e 0 1 white
t # 2
v 0 blue
v 1 red yellow
e 0 1
"""


def test_read_data_db(spark, tmp_path):
    p = tmp_path / "db.data"
    p.write_text(DB1)
    v, e = read_data_db(spark, str(p))
    vv = {(r.graph_id, r.v_id): r.labels for r in v.collect()}
    assert vv[("g0", 1)] == ["red", "yellow"]  # sorted multi-label
    assert vv[("2", 1)] == ["red", "yellow"]  # unnamed graph → idx id
    ee = {(r.graph_id, r.src, r.dst, r.key): r.type for r in e.collect()}
    assert ee[("g0", 0, 1, 0)] == "white"
    assert ee[("g0", 0, 1, 1)] == "white"  # parallel edge got key 1
    assert ee[("2", 0, 1, 0)] == ""  # missing label → wildcard ""


def test_read_data_db_single_file_split_parallel(spark, tmp_path):
    """A single huge .data file must parse identically whether it is
    read as one input split or many (the split-parallel forward fill:
    headers carry across split boundaries via the per-split carry)."""
    import random

    rng = random.Random(3)
    blocks = []
    for g in range(120):
        blocks.append(f"t # {g} g{g}")
        n = rng.randint(3, 9)
        for i in range(n):
            blocks.append(f"v {i} {rng.choice('abc')}")
        for _ in range(rng.randint(2, 10)):
            s, d = rng.randrange(n), rng.randrange(n)
            blocks.append(f"e {s} {d} {rng.choice('xy')}")
    p = tmp_path / "big.data"
    p.write_text("\n".join(blocks) + "\n")

    def snapshot():
        v, e = read_data_db(spark, str(p))
        return (
            {(r.graph_id, r.v_id, tuple(r.labels)) for r in v.collect()},
            {(r.graph_id, r.src, r.dst, r.key, r.type) for r in e.collect()},
        )

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        v1, e1 = snapshot()  # default: single split
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        n_splits = (
            spark.read.text(str(p))
            .select(F.col("_metadata.file_block_start").alias("blk"))
            .distinct()
            .count()
        )
        assert n_splits > 4, "test setup must force multiple input splits"
        v2, e2 = snapshot()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)
    assert v1 == v2
    assert e1 == e2


def test_data_db_with_matcher_support(spark, tmp_path):
    p = tmp_path / "db.data"
    p.write_text(DB1)
    v, e = read_data_db(spark, str(p))
    pat = (
        Pattern()
        .add_node("a", ["blue"])
        .add_node("b", ["yellow"])
        .add_edge("a", "b", "white")
    )
    emb = match(pat, e, v)
    # g0 and g1 have blue -white-> yellow; graph "2" edge is unlabeled
    assert {r.graph_id for r in emb.collect()} == {"g0", "g1"}
    assert support(emb).collect()[0]["support"] == 2
    # wildcard pattern edge matches all three graphs
    pat2 = Pattern().add_node("a", ["blue"]).add_edge("a", "b", "")
    assert support(match(pat2, e, v)).collect()[0]["support"] == 3


def test_pattern_text_roundtrip():
    pats = parse_pattern_text("v 0 blue\nv 1 yellow\ne 0 1 white\n-\nv 0 red\n")
    assert len(pats) == 2
    assert pats[0].nodes == {"0": ["blue"], "1": ["yellow"]}
    assert pats[0].edges[0].type == "white"
    assert pats[1].nodes == {"0": ["red"]}


def test_result_sink_format(spark):
    rows = [
        (
            0,
            [(0, ["blue"]), (1, ["yellow"])],
            [(0, 1, "white")],
            2,
            5,
        )
    ]
    df = spark.createDataFrame(
        rows,
        "pattern_id long, vertices array<struct<v_id:long,labels:array<string>>>, "
        "edges array<struct<src:long,dst:long,type:string>>, support long, frequency long",
    )
    text = write_patterns_text(df).collect()[0].value
    assert text.splitlines() == [
        "t # 0",
        "v 0 blue",
        "v 1 yellow",
        "e 0 1 white",
        "s 2",
        "f 5",
    ]


def test_csv_graph_db(spark, tmp_path):
    root = tmp_path / "csvdb"
    for g in ("net1",):
        os.makedirs(root / g / "nodes")
        os.makedirs(root / g / "edges")
        (root / g / "nodes" / "n.csv").write_text(
            "id,labels,color\n0,blue,azure\n1,yellow red,sun\n"
        )
        (root / g / "edges" / "e.csv").write_text(
            "source,target,type,w\n0,1,white,2\n0,1,white,3\n"
        )
    v, e = read_csv_graph_db(spark, str(root))
    vrows = {r.v_id: r for r in v.collect()}
    assert vrows[1].labels == ["red", "yellow"]
    assert vrows[0].props["color"] == "azure"
    erows = sorted(e.collect(), key=lambda r: r.key)
    assert [r.key for r in erows] == [0, 1]
    assert erows[0].props["w"] in {"2", "3"}


def test_json_node_link(spark, tmp_path):
    doc = {
        "directed": True,
        "multigraph": True,
        "nodes": [
            {"id": 0, "labels": ["blue"]},
            {"id": 1, "labels": ["yellow"]},
        ],
        "links": [{"source": 0, "target": 1, "type": "white"}],
    }
    p = tmp_path / "g.json"
    p.write_text(json.dumps(doc))
    v, e = read_json_graph(spark, str(p))
    assert v.count() == 2
    row = e.collect()[0]
    assert (row.src, row.dst, row.type) == (0, 1, "white")


def test_json_node_link_props_matchable(spark, tmp_path):
    """JSON attrs ride into props (reference node-link load carries
    every attr, NetworksLoading.py:173-178) and are queryable by the
    F4 attribute-containment matcher."""
    from cminer_spark.operators.matching import Pattern, match

    doc = {
        "directed": True,
        "multigraph": True,
        "nodes": [
            {"id": 0, "labels": ["person"], "age": 30, "city": "x"},
            {"id": 1, "labels": ["person"], "age": 41},
            {"id": 2, "labels": ["person"], "age": 30},
        ],
        "links": [
            {"source": 0, "target": 1, "type": "knows", "since": 2020},
            {"source": 2, "target": 1, "type": "knows", "since": 1999},
        ],
    }
    p = tmp_path / "gp.json"
    p.write_text(json.dumps(doc))
    v, e = read_json_graph(spark, str(p))
    vrows = {r.v_id: r for r in v.collect()}
    assert vrows[0].props["age"] == "30" and vrows[0].props["city"] == "x"
    erows = sorted(e.collect(), key=lambda r: (r.src, r.dst))
    assert erows[0].props["since"] == "2020"

    pat = (
        Pattern()
        .add_node("a", ["person"], props={"age": "30"})
        .add_node("b", ["person"])
        .add_edge("a", "b", "knows", props={"since": "2020"})
    )
    emb = match(pat, e, v, graph_col="graph_id")
    rows = emb.collect()
    assert len(rows) == 1 and (rows[0].n_a, rows[0].n_b) == (0, 1)


def test_data_roundtrip_through_sink(spark, tmp_path):
    """Write with the sink, re-read with the source (reference checker
    re-parses its own output the same way, test/parser.py:102-207)."""
    rows = [
        (7, [(0, ["a"]), (1, ["b"])], [(0, 1, "t"), (1, 0, "u")], 3, 9)
    ]
    df = spark.createDataFrame(
        rows,
        "pattern_id long, vertices array<struct<v_id:long,labels:array<string>>>, "
        "edges array<struct<src:long,dst:long,type:string>>, support long, frequency long",
    )
    out = tmp_path / "solutions"
    write_patterns_text(df, str(out))
    v, e = read_data_db(spark, str(out))
    assert {r.v_id for r in v.collect()} == {0, 1}
    assert {(r.src, r.dst, r.type) for r in e.collect()} == {(0, 1, "t"), (1, 0, "u")}


def test_data_db_non_numeric_id_raises(spark, tmp_path):
    """Non-numeric node ids raise an explicit error (documented format
    restriction) rather than an opaque ANSI CAST failure."""
    import pytest
    from pyspark.errors import PySparkException

    p = tmp_path / "bad.data"
    p.write_text("t # 0 g0\nv abc blue\n")
    v, _e = read_data_db(spark, str(p))
    with pytest.raises(PySparkException, match="non-numeric node id"):
        v.collect()


def test_read_data_db_single_text_scan(spark, tmp_path):
    """The raw text parse must run ONCE: the carry collect
    materializes the (file, blk, rid, line, hdr) projection, and the
    returned frames read the materialized blocks — their plans must
    not contain a second scan of the .data file."""
    p = tmp_path / "db_scan.data"
    p.write_text(DB1)
    v, e = read_data_db(spark, str(p))
    for df in (v, e):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "db_scan.data" not in plan, plan
