"""Edge extraction kernel: pairing correctness, batch-boundary carry,
text-equality invariant, id stability, vertex labeling."""

from __future__ import annotations

from pyspark.sql import functions as F

from cminer_spark.operators import (
    extract_edges,
    passthrough_turns,
    vertices_from_transcripts,
)
from cminer_spark.operators.edges import _conv_stream_kernel, _edges_from_batch
from cminer_spark.synth import synth_transcripts


def test_edge_counts_match_closed_form(spark):
    t = synth_transcripts(spark, n_convs=150, seed=42).persist()
    edges = extract_edges(t).persist()
    n_turns = t.count()
    n_convs = t.select("conv_id").distinct().count()
    n_tool_turns = t.where(F.col("tool").isNotNull()).count()
    n_replies = edges.where(F.col("type") == "replies_to").count()
    n_invokes = edges.where(F.col("type") == "invokes").count()
    assert n_replies == n_turns - n_convs  # one per consecutive pair
    assert n_invokes == n_tool_turns


def test_pairing_matches_window_lag(spark):
    """Differential test: the Arrow kernel must equal the declarative
    lag-window formulation."""
    t = synth_transcripts(spark, n_convs=120, seed=7)
    got = (
        extract_edges(t)
        .where(F.col("type") == "replies_to")
        .select("src_key", "dst_key")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    want = (
        t.withColumn("prev_idx", F.lag("turn_idx").over(w))
        .where(F.col("prev_idx").isNotNull())
        .select(
            F.concat_ws("#", "conv_id", "turn_idx").alias("src_key"),
            F.concat_ws("#", "conv_id", "prev_idx").alias("dst_key"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_kernel_carries_conversations_across_batches():
    """Unit test of the batch-boundary carry: tiny batches that split
    conversations must still produce every consecutive pair."""
    import pandas as pd

    rows = []
    for conv in ["a", "b", "c"]:
        for i in range(5):
            rows.append({"conv_id": conv, "turn_idx": i, "tool": None})
    pdf = pd.DataFrame(rows)
    batches = [pdf.iloc[i : i + 2] for i in range(0, len(pdf), 2)]  # splits convs
    out = pd.concat(list(_conv_stream_kernel(_edges_from_batch)(iter(batches))))
    assert len(out) == 3 * 4
    assert out["tool"].isna().all()  # compact form: NULL tool == replies_to
    pairs = set(zip(out["conv_id"], out["src_turn"], out["dst_turn"]))
    assert ("a", 1, 0) in pairs and ("c", 4, 3) in pairs
    assert pairs == {(c, i, i - 1) for c in "abc" for i in range(1, 5)}


def test_arrow_kernel_matches_pandas_kernel():
    """The mapInArrow production kernel and the pandas reference kernel
    must emit identical edge sets, including across batch splits,
    gappy turn indices, and tool calls."""
    import pandas as pd
    import pyarrow as pa

    from cminer_spark.operators.edges import (
        _conv_stream_kernel_arrow,
        _edges_from_arrow,
    )

    rows = []
    for conv, turns in [("a", [0, 2, 5]), ("b", [1]), ("c", [0, 1, 2, 3])]:
        for i in turns:
            rows.append(
                {"conv_id": conv, "turn_idx": i,
                 "tool": "t1" if (i % 2 == 0 and conv != "b") else None}
            )
    pdf = pd.DataFrame(rows)
    pd_batches = [pdf.iloc[i : i + 2] for i in range(0, len(pdf), 2)]
    want = pd.concat(
        list(_conv_stream_kernel(_edges_from_batch)(iter(pd_batches)))
    )
    pa_batches = [
        pa.RecordBatch.from_pandas(b, preserve_index=False) for b in pd_batches
    ]
    got = pa.Table.from_batches(
        list(_conv_stream_kernel_arrow(_edges_from_arrow)(iter(pa_batches)))
    ).to_pandas()

    key = lambda df: sorted(
        (r.conv_id, r.src_turn, -1 if pd.isna(r.dst_turn) else int(r.dst_turn),
         r.tool if isinstance(r.tool, str) else None)
        for r in df.itertuples()
    )
    assert key(got) == key(want) and len(got) == len(want)


def test_arrow_kernel_matches_pandas_kernel_null_conv_id():
    """NULL conv_ids form ONE conversation in both kernels — whether
    the null run sits at the head (Spark sorts nulls first) or at the
    tail (exercising the pending-carry split on a null last id)."""
    import pandas as pd
    import pyarrow as pa

    from cminer_spark.operators.edges import (
        _conv_stream_kernel_arrow,
        _edges_from_arrow,
    )

    cases = [
        [{"conv_id": None, "turn_idx": i, "tool": None} for i in (0, 1, 2)]
        + [
            {"conv_id": "a", "turn_idx": i, "tool": "t" if i == 1 else None}
            for i in (0, 1)
        ],
        [{"conv_id": "a", "turn_idx": i, "tool": None} for i in (0, 1)]
        + [
            {"conv_id": None, "turn_idx": i, "tool": "t" if i == 2 else None}
            for i in (0, 1, 2)
        ],
    ]
    schema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int64()), ("tool", pa.string())]
    )
    for rows in cases:
        pdf = pd.DataFrame(rows)
        pd_batches = [pdf.iloc[i : i + 2] for i in range(0, len(pdf), 2)]
        want = pd.concat(
            list(_conv_stream_kernel(_edges_from_batch)(iter(pd_batches)))
        )
        pa_batches = [
            pa.RecordBatch.from_pandas(b, schema=schema, preserve_index=False)
            for b in pd_batches
        ]
        got = pa.Table.from_batches(
            list(_conv_stream_kernel_arrow(_edges_from_arrow)(iter(pa_batches)))
        ).to_pandas()

        key = lambda df: sorted(
            (
                r.conv_id if isinstance(r.conv_id, str) else "\0null",
                int(r.src_turn),
                -1 if pd.isna(r.dst_turn) else int(r.dst_turn),
                r.tool if isinstance(r.tool, str) else None,
            )
            for r in df.itertuples()
        )
        assert key(got) == key(want) and len(got) == len(want)
        # the null run itself pairs: 3 null turns → 2 replies_to edges
        n_null_replies = sum(
            1
            for r in got.itertuples()
            if not isinstance(r.conv_id, str) and pd.isna(r.tool)
        )
        assert n_null_replies == 2


def test_text_equality_invariant(spark):
    """BASELINE.json input_hint: per-turn text equality under stable
    turn ordering must survive the edge-extraction path."""
    t = synth_transcripts(spark, n_convs=100, seed=42)
    src = t.select("conv_id", "turn_idx", F.sha2("text", 256).alias("sha"))
    out = passthrough_turns(t).select(
        "conv_id", "turn_idx", F.sha2("text", 256).alias("sha")
    )
    assert src.exceptAll(out).count() == 0
    assert out.exceptAll(src).count() == 0
    assert out.count() == t.count()


def test_ids_stable_across_partitioning(spark):
    t = synth_transcripts(spark, n_convs=60, seed=42)
    e1 = {
        (r.src, r.dst, r.type)
        for r in extract_edges(t, partitions=2).collect()
    }
    e2 = {
        (r.src, r.dst, r.type)
        for r in extract_edges(t, partitions=13).collect()
    }
    assert e1 == e2


def test_vertices_multilabel(spark):
    t = synth_transcripts(spark, n_convs=40, seed=42)
    v = vertices_from_transcripts(t)
    row = v.where(F.array_contains("labels", "turn")).first()
    assert any(lbl.startswith("role:") for lbl in row.labels)
    assert v.select("v_id").distinct().count() == v.count()


def test_synth_deterministic(spark):
    a = synth_transcripts(spark, n_convs=50, seed=42)
    b = synth_transcripts(spark, n_convs=50, seed=42)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = synth_transcripts(spark, n_convs=50, seed=43)
    assert c.exceptAll(a).count() > 0


def test_delta_extraction_equals_full(spark):
    from cminer_spark.operators import extract_edges_delta
    from pyspark.sql import functions as F

    t = synth_transcripts(spark, n_convs=120, seed=13).persist()
    # previous snapshot: conv hash % 4 == 0 conversations are missing
    # turns >= 2 (grown since), % 4 == 1 are entirely new
    h = F.pmod(F.xxhash64("conv_id"), F.lit(4))
    prev_t = t.where(
        ((h != 0) & (h != 1)) | ((h == 0) & (F.col("turn_idx") < 2))
    )
    prev_edges = extract_edges(prev_t)
    changed = t.where(h.isin(0, 1)).select("conv_id").distinct()
    got = extract_edges_delta(t, prev_edges, changed)
    want = extract_edges(t)
    cols = ["src", "dst", "type", "key", "src_key", "dst_key"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    # no stale rows for grown conversations survive the anti-join
    stale = got.join(
        changed, F.get(F.split("src_key", "#", 2), 0) == changed.conv_id
    )
    fresh = want.join(
        changed, F.get(F.split("src_key", "#", 2), 0) == changed.conv_id
    )
    assert stale.count() == fresh.count()
    t.unpersist()


def test_delta_extraction_noop_when_nothing_changed(spark):
    from cminer_spark.operators import extract_edges_delta

    t = synth_transcripts(spark, n_convs=40, seed=3)
    prev = extract_edges(t)
    empty = spark.createDataFrame([], "conv_id string")
    got = extract_edges_delta(t, prev, empty)
    assert got.count() == prev.count()


def test_sql_twin_matches_arrow_full_contract(spark):
    """extract_edges_sql must reproduce the Arrow kernel's FULL output
    (all columns, both edge types, parallel keys) on the synthetic
    corpus and on crafted gappy/empty-tool fixtures."""
    from cminer_spark.operators import extract_edges_sql

    t = synth_transcripts(spark, n_convs=120, seed=3)
    a = extract_edges(t, with_parallel_keys=True)
    s = extract_edges_sql(t, with_parallel_keys=True)
    assert a.exceptAll(s).count() == 0
    assert s.exceptAll(a).count() == 0

    rows = [
        # gappy turn indices, empty-string tool (no invokes edge),
        # single-turn conversation, NULL conv_id conversation
        ("c1", 0, None), ("c1", 2, ""), ("c1", 7, "search"),
        ("c2", 5, "wiki"),
        (None, 0, None), (None, 3, None),
    ]
    fx = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    a2 = extract_edges(fx)
    s2 = extract_edges_sql(fx)
    assert a2.exceptAll(s2).count() == 0
    assert s2.exceptAll(a2).count() == 0
    # empty-string tool emits no invokes edge in either path
    assert s2.where(F.col("dst_key") == "tool:").count() == 0


def test_sql_twin_plan_has_no_python_stage(spark):
    """The SQL twin's physical plan must contain zero Python/Arrow
    eval nodes (the whole point: isolate the Python-worker cost)."""
    from cminer_spark.operators import extract_edges_sql

    t = synth_transcripts(spark, n_convs=10, seed=1)
    plan = extract_edges_sql(t)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInArrow" not in plan and "FlatMapGroupsInPandas" not in plan
