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


def test_start_pattern_mining(spark, tmp_path):
    """Reference brute-force strategy (test/brute_force/main.py:24-68):
    localize a user start pattern with the matcher and grow from its
    embeddings (CMiner.py:469-490)."""
    start = Pattern().add_node("a", ["blue"]).add_node("b", ["yellow"]).add_edge(
        "a", "b", "white"
    )
    mined = _mine(
        spark, tmp_path, min_support=2, max_edges=2, start_patterns=[start]
    )
    # the start pattern itself is frequent (g0, g1) and reported
    start_code = canonical_code(start)
    assert any(m.code == start_code and m.support == 2 for m in mined)
    # it can only grow in g0 (the 3-node chain), support 1 < 2 → no children
    assert all(len(m.pattern.edges) <= 1 for m in mined)
    # growth from a start pattern with lower support floor finds the chain
    mined1 = _mine(
        spark, tmp_path, min_support=1, max_edges=2, start_patterns=[start]
    )
    chain = canonical_code(
        Pattern()
        .add_node("a", ["blue"])
        .add_node("b", ["yellow"])
        .add_node("c", ["red"])
        .add_edge("a", "b", "white")
        .add_edge("b", "c", "white")
    )
    assert chain in {m.code for m in mined1}
    # infrequent start pattern is dropped entirely
    rare = Pattern().add_node("a", ["green"]).add_node("b", []).add_edge("a", "b", "")
    assert _mine(spark, tmp_path, min_support=2, start_patterns=[rare]) == []


def test_three_copies_recover_whole_graph(spark, tmp_path):
    """DB of 3 copies of one random graph, minsup 3 ⇒ the whole graph
    itself is among the mined patterns (mirrors reference
    test/brute_force/main.py)."""
    import random

    rng = random.Random(4)
    n, m = 4, 5
    nodes = {i: rng.choice(["a", "b"]) for i in range(n)}
    edges = set()
    while len(edges) < m:
        s, d = rng.randrange(n), rng.randrange(n)
        if s != d:
            edges.add((s, d))
    blocks = []
    for g in range(3):
        blocks.append(f"t # {g} g{g}")
        for i, lbl in nodes.items():
            blocks.append(f"v {i} {lbl}")
        for s, d in sorted(edges):
            blocks.append(f"e {s} {d} t")
    p = tmp_path / "db3.data"
    p.write_text("\n".join(blocks) + "\n")
    v, e = read_data_db(spark, str(p))
    mined = mine_frequent_patterns(
        v, e, min_support=3, max_edges=m, max_nodes=n, min_nodes=1
    )
    whole = Pattern()
    for i, lbl in nodes.items():
        whole.add_node(str(i), [lbl])
    for s, d in sorted(edges):
        whole.add_edge(str(s), str(d), "t")
    assert canonical_code(whole) in {mp.code for mp in mined}
    # every mined pattern is frequent in all 3 copies
    assert all(mp.support == 3 for mp in mined)


def test_graph_counts_and_x_lines(spark, tmp_path):
    mined = _mine(
        spark, tmp_path, min_support=2, max_edges=1, min_nodes=2,
        with_graph_counts=True,
    )
    assert len(mined) == 1
    assert mined[0].graph_counts == {"g0": 1, "g1": 1}
    df = patterns_to_df(spark, mined)
    from cminer_spark.sources import write_patterns_text

    text = write_patterns_text(df).collect()[0].value
    assert "x (g0, 1) (g1, 1)" in text


def test_show_mappings_output(spark, tmp_path):
    mined = _mine(
        spark, tmp_path, min_support=2, max_edges=1, min_nodes=2,
        keep_embeddings=True,
    )
    from cminer_spark.sources import write_mappings_text

    lines = {r.value for r in write_mappings_text(mined[0].embeddings).collect()}
    # blue(0) -white-> yellow(1) in g0 and g1
    assert any(l.startswith("g0 {") and "0" in l for l in lines)
    assert len(lines) == 2
    spark.catalog.clearCache()


def test_mining_driver_actions_linear_in_patterns(spark, tmp_path, monkeypatch):
    """Regression for the round-1 driver job storm: driver actions
    (collect/count round-trips) per (pattern, level) must be O(1) —
    one unified aggregation — not O(#nodes·2 + #node-pairs +
    2·#children). Raw Spark-job counts are NOT a proxy (AQE splits one
    action into a job per shuffle stage), so count actions directly."""
    p = tmp_path / "db.data"
    p.write_text(DB)
    v, e = read_data_db(spark, str(p))

    # patch the RUNTIME class (Spark 4's classic DataFrame overrides
    # collect/count — patching the pyspark.sql.DataFrame base is a
    # no-op, which made this guard vacuous in round 2)
    cls = type(v)
    actions = {"n": 0}
    orig_collect, orig_count = cls.collect, cls.count

    def counting_collect(self):
        actions["n"] += 1
        return orig_collect(self)

    def counting_count(self):
        actions["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(cls, "collect", counting_collect)
    monkeypatch.setattr(cls, "count", counting_count)
    mined = mine_frequent_patterns(v, e, min_support=1, max_edges=2)
    assert actions["n"] > 0, "action counter never fired — vacuous guard"
    # actions: 1 (n_graphs count) + 1 (seed agg) + 1 per pattern that
    # reaches extension (4 seeds + every 1-edge pattern)
    n_extended = 4 + len([m for m in mined if len(m.pattern.edges) == 1])
    budget = 2 + n_extended
    assert actions["n"] <= budget, (
        f"{actions['n']} driver actions > budget {budget} (storm regression)"
    )


def test_self_loop_edge_extension(spark, tmp_path):
    """Growth must reach patterns containing SELF-LOOP edges: the
    reference draws edge-extension candidates from the induced
    subgraph over mapped vertices (CMiner.py:285-296 via
    Graph.py:607-623), which includes self-loops."""
    db = ""
    for g in range(3):
        db += f"t # {g} g{g}\nv 0 a\nv 1 b\ne 0 0 s\ne 0 1 w\n"
    p = tmp_path / "selfloop.data"
    p.write_text(db)
    v, e = read_data_db(spark, str(p))
    mined = mine_frequent_patterns(v, e, min_support=3, max_edges=2, max_nodes=2)
    selfloops = [
        m for m in mined if any(pe.src == pe.dst for pe in m.pattern.edges)
    ]
    assert selfloops, "no self-loop pattern reached by growth"
    one = [m for m in selfloops if len(m.pattern.edges) == 1]
    assert one and one[0].support == 3 and one[0].frequency == 3
    assert list(one[0].pattern.nodes.values())[0] == ["a"]
    # growth also composes the self-loop with the outgoing edge
    assert any(len(m.pattern.edges) == 2 for m in selfloops)
    # and the matcher's self-loop branch binds the embeddings
    from cminer_spark.operators.matching import match

    emb = match(one[0].pattern, e, v, graph_col="graph_id")
    assert emb.count() == 3


def test_seed_collect_is_o_frequent_codes(spark, tmp_path, monkeypatch):
    """The seed stage must collect O(frequent label-set codes) rows,
    never the raw (codes × graphs) grain — on a 10^7-graph
    transactional DB that grain is a driver-side collect bomb."""
    blocks = []
    for g in range(40):
        blocks.append(f"t # {g} g{g}")
        blocks.append("v 0 a")  # frequent in every graph
        blocks.append(f"v 1 u{g}")  # unique per graph → infrequent
    p = tmp_path / "many.data"
    p.write_text("\n".join(blocks) + "\n")
    v, e = read_data_db(spark, str(p))

    # patch the RUNTIME class (Spark 4's classic DataFrame overrides
    # collect — patching the pyspark.sql.DataFrame base is a no-op)
    cls = type(v)
    sizes: list[int] = []
    orig_collect = cls.collect

    def measuring_collect(self):
        out = orig_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(cls, "collect", measuring_collect)
    mined = mine_frequent_patterns(v, e, min_support=40, max_edges=0)
    assert len(mined) == 1 and mined[0].support == 40
    # 41 distinct label-set codes exist, 1 is frequent: the old
    # (lcode, graph) grain collected 80 rows; the HAVING-filtered
    # aggregate collects exactly the frequent codes
    assert sizes and max(sizes) <= 4, f"seed collect too large: {sizes}"


def test_streamed_emission_matches_batch(spark, tmp_path):
    """on_pattern streams each qualifying pattern AS EMITTED (reference
    CMiner.py:503-516 appends per pattern) and pattern_block_text
    renders byte-identically to the batch sink — including the 0-edge
    empty-block and empty-labels concat_ws quirks."""
    from cminer_spark.operators.mining import pattern_block_text
    from cminer_spark.sources import write_patterns_text

    emitted = []
    mined = _mine(
        spark, tmp_path, min_support=2, max_edges=1,
        with_graph_counts=True, on_pattern=emitted.append,
    )
    assert emitted and [m.code for m in emitted] == [m.code for m in mined]
    df = patterns_to_df(spark, mined)
    want = [r.value for r in write_patterns_text(df).collect()]
    got = [pattern_block_text(mp, i) for i, mp in enumerate(mined)]
    assert got == want


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


def test_mine_cli(spark, tmp_path, capsys):
    """CLI parity with the reference (main.py:30-47): db support -l -u
    -o -p, plus x info lines in the sink output."""
    db = tmp_path / "db.data"
    db.write_text(DB)
    pats = tmp_path / "start.txt"
    pats.write_text("v 0 blue\nv 1 yellow\ne 0 1 white\n")
    from cminer_spark.__main__ import main

    rc = main(["mine", str(db), "2", "-l", "2", "-u", "3", "-p", str(pats)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "s 2" in out and "f 2" in out and "x (g0, 1) (g1, 1)" in out
    # in-process CLI must NOT stop a session it joined but didn't create
    # (regression: it stopped the shared fixture session and every
    # later spark-using test failed on a stopped SparkContext)
    assert spark.range(1).count() == 1


def test_miner_complete_vs_enumeration_oracle(spark):
    """Completeness + correctness on a random tiny DB: enumerate EVERY
    connected pattern over the data's label/type alphabet (≤2 nodes,
    ≤2 edges — including self-loops and parallel edges), score each
    with the independently brute-force-verified matcher, and require
    the miner's output to be exactly the frequent subset with equal
    support AND frequency (the reference's brute-force test strategy,
    test/brute_force/main.py, generalized from one planted pattern to
    the whole pattern space)."""
    import random
    from itertools import combinations_with_replacement, product

    from cminer_spark.operators.matching import Pattern, match

    rng = random.Random(20260817)
    labels_alpha, types_alpha = ["a", "b"], ["x"]
    vrows, erows = [], []
    for g in range(4):
        gid = f"g{g}"
        n = rng.randint(3, 5)
        for i in range(n):
            vrows.append((gid, i, [rng.choice(labels_alpha)]))
        seen = {}
        for _ in range(rng.randint(4, 7)):
            s = rng.randrange(n)
            d = rng.randrange(n) if rng.random() > 0.25 else s  # self-loops
            k = seen.get((s, d), 0)
            seen[(s, d)] = k + 1
            erows.append((gid, s, d, k, "x"))
    v = spark.createDataFrame(
        vrows, "graph_id string, v_id long, labels array<string>"
    )
    e = spark.createDataFrame(
        erows, "graph_id string, src long, dst long, key int, type string"
    )

    def connected(p: Pattern) -> bool:
        nodes = list(p.nodes)
        if len(nodes) <= 1:
            return True
        parent = {x: x for x in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pe in p.edges:
            parent[find(pe.src)] = find(pe.dst)
        return len({find(x) for x in nodes}) == 1

    enumerated: dict[str, Pattern] = {}
    for n in (1, 2):
        ids = [f"q{i}" for i in range(n)]
        all_edges = [
            (i, j, t) for i in range(n) for j in range(n) for t in types_alpha
        ]
        for labeling in product(labels_alpha, repeat=n):
            for m in (0, 1, 2):
                for combo in combinations_with_replacement(all_edges, m):
                    p = Pattern()
                    for i, l in enumerate(labeling):
                        p.add_node(ids[i], [l])
                    for (i, j, t) in combo:
                        p.add_edge(ids[i], ids[j], t)
                    if connected(p):
                        enumerated.setdefault(canonical_code(p), p)

    min_sup = 2
    want: dict[str, tuple[int, int]] = {}
    for code, p in enumerated.items():
        emb = match(p, e, v, graph_col="graph_id", include_edges=bool(p.edges))
        rows = emb.groupBy("graph_id").count().collect()
        sup = len(rows)
        if sup >= min_sup:
            want[code] = (sup, int(sum(r["count"] for r in rows)))

    mined = mine_frequent_patterns(
        v, e, min_support=min_sup, max_edges=2, max_nodes=2
    )
    got = {m.code: (m.support, m.frequency) for m in mined}
    assert got == want, (
        f"mined {len(got)} vs oracle {len(want)}; "
        f"missing={set(want) - set(got)}; extra={set(got) - set(want)}"
    )
    # the space genuinely exercises the new growth branches
    assert any(
        pe.src == pe.dst for m in mined for pe in m.pattern.edges
    ), "fixture produced no frequent self-loop pattern"
