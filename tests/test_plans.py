"""Physical-plan regressions: the optimizations BENCH/BASELINE.md
credits must stay visible in explain() output.

* parquet scans under pipeline operators keep PushedFilters +
  pruned ReadSchema (Catalyst pushdown is free only while the plan
  stays declarative);
* iterative superstep joins stay shuffle-hash (a silent fallback to
  SortMergeJoin re-sorts the cached adjacency every superstep — the
  round-1 1.7× regression).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushed_to_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id")
    plan = _plan(q)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1].split("\n")[0]
    # projection pruning: the scan must not read the text column
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema


def test_pagerank_superstep_uses_shuffle_hash_join(spark):
    """Build one superstep's plan shape by hand (adjacency ⋈ state
    from a freshly-scanned checkpoint) and assert no SortMergeJoin."""
    from cminer_spark.operators import extract_edges, pagerank
    from cminer_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=40, seed=2)
    edges = extract_edges(t)
    ranks, _info = pagerank(edges, tol=1e-6, max_iter=3)
    # the returned frame reads the final superstep state; join shape is
    # checked on a reconstructed superstep:
    adj = edges.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    state = ranks.select(F.col("v_id").alias("src"), "rank").hint("shuffle_hash")
    step = adj.join(state, "src").groupBy("dst").agg(
        F.sum(F.col("w") * F.col("rank")).alias("m")
    )
    plan = _plan(step)
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
