"""1-WL color refinement: isomorphism invariance, non-isomorphic
separation, the classic C6-vs-2xC3 1-WL blind spot, label
sensitivity, and oracle gate parity."""

from __future__ import annotations

import duckdb

from cminer_spark.operators.wl import wl_colors, wl_fingerprints


def _db(spark, graphs):
    """graphs: {gid: (labels_by_vid, edge_pairs)} -> (v_df, e_df)."""
    vrows, erows = [], []
    for gid, (labels, pairs) in graphs.items():
        for vid, lab in labels.items():
            vrows.append((gid, vid, [lab]))
        for s, d in pairs:
            erows.append((gid, s, d))
    v = spark.createDataFrame(
        vrows, "graph_id string, v_id long, labels array<string>"
    )
    e = spark.createDataFrame(erows, "graph_id string, src long, dst long")
    return v, e


def _fps(spark, graphs, rounds=3):
    v, e = _db(spark, graphs)
    return {
        r.graph_id: r.fingerprint
        for r in wl_fingerprints(v, e, rounds=rounds).collect()
    }


def test_isomorphic_relabelings_match(spark):
    path = [(0, 1), (1, 2), (2, 3)]
    shuffled = [(10, 30), (30, 20), (20, 40)]  # same P4 shape
    fp = _fps(
        spark,
        {
            "a": ({i: "x" for i in range(4)}, path),
            "b": ({i: "x" for i in (10, 20, 30, 40)}, shuffled),
        },
    )
    assert fp["a"] == fp["b"]


def test_non_isomorphic_trees_separate(spark):
    path4 = [(0, 1), (1, 2), (2, 3)]
    star4 = [(0, 1), (0, 2), (0, 3)]
    fp = _fps(
        spark,
        {
            "p": ({i: "x" for i in range(4)}, path4),
            "s": ({i: "x" for i in range(4)}, star4),
        },
    )
    assert fp["p"] != fp["s"]


def test_c6_vs_two_triangles_is_the_known_blind_spot(spark):
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    two_c3 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    fp = _fps(
        spark,
        {
            "c6": ({i: "x" for i in range(6)}, c6),
            "t2": ({i: "x" for i in range(6)}, two_c3),
        },
    )
    # both 2-regular with uniform labels: 1-WL cannot separate them —
    # documents the operator's (standard) expressiveness bound
    assert fp["c6"] == fp["t2"]


def test_labels_change_colors(spark):
    path = [(0, 1), (1, 2)]
    fp = _fps(
        spark,
        {
            "plain": ({0: "x", 1: "x", 2: "x"}, path),
            "marked": ({0: "x", 1: "y", 2: "x"}, path),
        },
    )
    assert fp["plain"] != fp["marked"]


def test_colors_refine_monotonically(spark):
    # distinct color count never decreases with rounds
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4)]
    v, e = _db(spark, {"g": ({i: "x" for i in range(5)}, pairs)})
    counts = [
        wl_colors(v, e, rounds=k).select("color").distinct().count()
        for k in (0, 1, 2, 3)
    ]
    assert counts == sorted(counts)


def test_gate_parity_vs_duckdb(spark):
    import __spark_entry__ as E
    from cminer_spark import gate

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.graph_id, r.fingerprint)
        for r in E.queries()["wl_fingerprints"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        (a, b)
        for a, b in con.execute(gate.wl_fingerprint_oracle_sql()).fetchall()
    )
    assert got == want
