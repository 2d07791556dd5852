"""End-to-end CLI drive of the incremental ingest flow: delta
extraction + warm-start PageRank + incremental components through
``python -m cminer_spark``-style main() invocations on parquet
artifacts, matching their full-recompute twins."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cminer_spark.__main__ import main
from cminer_spark.operators import extract_edges
from cminer_spark.synth import synth_transcripts


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_incremental_flow(spark, tmp_path, capsys):
    base = str(tmp_path)
    t = synth_transcripts(spark, n_convs=80, seed=19)
    t.write.parquet(f"{base}/tr_full")
    h = F.pmod(F.xxhash64("conv_id"), F.lit(4))
    t.where((h != 0) | (F.col("turn_idx") < 2)).write.parquet(
        f"{base}/tr_prev"
    )
    t.where(h == 0).select("conv_id").distinct().write.parquet(
        f"{base}/changed"
    )
    extract_edges(spark.read.parquet(f"{base}/tr_prev")).write.parquet(
        f"{base}/edges_prev"
    )

    # full runs: pagerank + components over the full corpus
    meta_full = _run(
        capsys,
        ["--transcripts", f"{base}/tr_full", "--algorithm", "pagerank",
         "--tol", "1e-8", "--output", f"{base}/ranks_full"],
    )
    _run(
        capsys,
        ["--transcripts", f"{base}/tr_full", "--algorithm", "components",
         "--output", f"{base}/cc_full"],
    )
    # previous-day artifacts to warm from
    _run(
        capsys,
        ["--edges", f"{base}/edges_prev", "--algorithm", "pagerank",
         "--tol", "1e-8", "--output", f"{base}/ranks_prev"],
    )
    _run(
        capsys,
        ["--edges", f"{base}/edges_prev", "--algorithm", "components",
         "--output", f"{base}/cc_prev"],
    )

    # incremental runs: delta extraction + warm start / label splice
    meta_warm = _run(
        capsys,
        ["--transcripts", f"{base}/tr_full",
         "--prev-edges", f"{base}/edges_prev",
         "--changed-convs", f"{base}/changed",
         "--algorithm", "pagerank", "--tol", "1e-8",
         "--init-ranks", f"{base}/ranks_prev",
         "--output", f"{base}/ranks_warm"],
    )
    # the delta edge table for incremental components
    full_e = extract_edges(t)
    changed = spark.read.parquet(f"{base}/changed")
    full_e.join(
        F.broadcast(changed),
        F.get(F.split("src_key", "#", 2), 0) == changed.conv_id,
    ).select("src", "dst").write.parquet(f"{base}/edges_delta")
    _run(
        capsys,
        ["--edges", f"{base}/edges_delta", "--algorithm", "components",
         "--prev-labels", f"{base}/cc_prev",
         "--output", f"{base}/cc_incr"],
    )

    # warm pagerank reached the same fixpoint in fewer supersteps
    full = {r.v_id: r.rank for r in spark.read.parquet(f"{base}/ranks_full").collect()}
    warm = {r.v_id: r.rank for r in spark.read.parquet(f"{base}/ranks_warm").collect()}
    assert set(full) == set(warm)
    assert max(abs(full[k] - warm[k]) for k in full) < 1e-6
    assert meta_warm["iterations"] < meta_full["iterations"]

    # incremental components match the full recompute exactly
    cf = {r.v_id: r.component for r in spark.read.parquet(f"{base}/cc_full").collect()}
    ci = {r.v_id: r.component for r in spark.read.parquet(f"{base}/cc_incr").collect()}
    assert cf == ci


def test_cli_katz_and_louvain(spark, tmp_path, capsys):
    base = str(tmp_path)
    t = synth_transcripts(spark, n_convs=40, seed=6)
    extract_edges(t).write.parquet(f"{base}/edges")
    mk = _run(
        capsys,
        ["--edges", f"{base}/edges", "--algorithm", "katz",
         "--alpha", "0.02", "--tol", "1e-8",
         "--output", f"{base}/katz_out"],
    )
    assert mk["converged"] and mk["iterations"] > 0
    kdf = spark.read.parquet(f"{base}/katz_out")
    assert set(kdf.columns) == {"v_id", "katz"} and kdf.count() > 0
    # warm start through the CLI converges faster
    mw = _run(
        capsys,
        ["--edges", f"{base}/edges", "--algorithm", "katz",
         "--alpha", "0.02", "--tol", "1e-8",
         "--init-ranks", f"{base}/katz_out",
         "--output", f"{base}/katz_warm"],
    )
    assert mw["iterations"] < mk["iterations"]

    ml = _run(
        capsys,
        ["--edges", f"{base}/edges", "--algorithm", "louvain",
         "--output", f"{base}/louvain_out"],
    )
    assert ml["n_communities"] > 0 and ml["levels"] >= 1
    ldf = spark.read.parquet(f"{base}/louvain_out")
    assert set(ldf.columns) == {"v_id", "community"} and ldf.count() > 0


def test_cli_new_algorithms(spark, tmp_path, capsys):
    """CLI dispatch for the r4 superstep additions: mis, coloring,
    msf, densest all run end-to-end on a small edge table."""
    base = str(tmp_path)
    t = synth_transcripts(spark, n_convs=30, seed=23)
    edges = extract_edges(t).select("src", "dst", "weight")
    edges.write.parquet(f"{base}/edges")

    m = _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "mis",
                      "--output", f"{base}/mis"])
    assert m["converged"]
    c = _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "coloring",
                      "--output", f"{base}/colors"])
    assert c["converged"]
    colors = spark.read.parquet(f"{base}/colors")
    assert colors.where(F.col("color") < 0).count() == 0
    f = _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "msf",
                      "--output", f"{base}/forest"])
    assert f["converged"]
    d = _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "densest",
                      "--output", f"{base}/core"])
    assert d["best_density"] > 0
    assert spark.read.parquet(f"{base}/core").count() > 0


def test_cli_wave3_and_subcommands(spark, tmp_path, capsys):
    """CLI dispatch for the wave-3 additions: dyad-census, topk-cap,
    feature-prop, plus the compact and pairs subcommands."""
    base = str(tmp_path)
    t = synth_transcripts(spark, n_convs=20, seed=31)
    t.write.parquet(f"{base}/tr")
    edges = extract_edges(t).select("src", "dst", "weight")
    edges.write.parquet(f"{base}/edges")

    _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "dyad-census",
                  "--output", f"{base}/dyads"])
    dy = spark.read.parquet(f"{base}/dyads").collect()[0]
    assert dy.edges > 0 and 0.0 <= dy.reciprocity <= 1.0

    _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "topk-cap",
                  "--topk", "2", "--output", f"{base}/capped"])
    capped = spark.read.parquet(f"{base}/capped")
    assert capped.groupBy("src").count().agg(
        F.max("count")
    ).collect()[0][0] <= 2

    verts = (
        edges.select(F.col("src").alias("v_id"))
        .union(edges.select(F.col("dst").alias("v_id")))
        .distinct()
        .select("v_id", F.array(F.lit(1.0), F.lit(2.0)).alias("emb"))
    )
    verts.write.parquet(f"{base}/feats")
    _run(capsys, ["--edges", f"{base}/edges", "--algorithm", "feature-prop",
                  "--features", f"{base}/feats", "--prop-rounds", "1",
                  "--output", f"{base}/smoothed"])
    sm = spark.read.parquet(f"{base}/smoothed")
    # constant features are a fixpoint of the damped averaging
    assert sm.where(F.col("emb") != F.array(F.lit(1.0), F.lit(2.0))).count() == 0

    from cminer_spark.__main__ import main as cli_main

    rc = cli_main(["compact", f"{base}/edges", "--target-file-mb", "512"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] <= out["files_before"]

    rc = cli_main(["pairs", "--transcripts", f"{base}/tr",
                   "--history", "2", "--output", f"{base}/pairs"])
    assert rc == 0
    pairs = spark.read.parquet(f"{base}/pairs")
    assert pairs.count() > 0
    assert set(pairs.columns) == {
        "conv_id", "turn_idx", "n_context_turns", "context", "response"
    }
