"""The format-agnostic table seam (iceberg:/table:/parquet: refs).

The ``iceberg:`` branch and the ``table:`` branch are the SAME code
path (``spark.read.table`` / ``writeTo``); the sandbox has no Iceberg
runtime jar, so the catalog-table round-trip runs against the session
catalog and the Iceberg-specific test documents its activation config
and skips explicitly.
"""

from __future__ import annotations

import pytest

from cminer_spark.sources.tables import read_table, write_table


def _has_iceberg(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_parquet_ref_roundtrip(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "id * 2 AS x")
    write_table(df, f"parquet:{tmp_path}/t1")
    back = read_table(spark, f"parquet:{tmp_path}/t1")
    assert back.count() == 10
    # bare path == parquet:
    assert read_table(spark, str(tmp_path / "t1")).count() == 10


def test_table_ref_reads_catalog_table(spark):
    """The table:/iceberg: read branch (spark.read.table) against the
    session catalog — on a cluster with the Iceberg extension jar the
    identical call resolves iceberg tables."""
    spark.range(7).createOrReplaceTempView("seam_check_tbl")
    assert read_table(spark, "table:seam_check_tbl").count() == 7
    spark.catalog.dropTempView("seam_check_tbl")


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason=(
        "Iceberg runtime jar absent in this sandbox. To activate the "
        "iceberg: seam on a real cluster: add "
        "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 to "
        "spark.jars.packages and configure "
        "spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog, "
        "spark.sql.catalog.ice.type=hadoop, "
        "spark.sql.catalog.ice.warehouse=<path>; then "
        "read_table(spark, 'iceberg:ice.db.transcripts') and "
        "write_table(df, 'iceberg:ice.db.ranks') round-trip."
    ),
)
def test_iceberg_write_read_roundtrip(spark, tmp_path):
    assert _has_iceberg(spark), "run only with the Iceberg jar configured"
    df = spark.range(5).selectExpr("id AS v_id", "id / 5.0 AS rank")
    write_table(df, "iceberg:ice.db.seam_rt")
    assert read_table(spark, "iceberg:ice.db.seam_rt").count() == 5


def test_bucketed_edges_skip_exchange(spark, tmp_path):
    """A src-bucketed edge table feeds groupBy(src) and src-joins with
    NO Exchange in the plan — the write-once shuffle is reused."""
    from pyspark.sql import functions as F

    from cminer_spark.sources import read_bucketed_edges, write_bucketed_edges

    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50, 1.0) for i in range(400)],
        "src long, dst long, weight double",
    )
    spark.sql("DROP TABLE IF EXISTS bkt_edges_test")
    write_bucketed_edges(edges, "bkt_edges_test", buckets=8)
    try:
        back = read_bucketed_edges(spark, "bkt_edges_test")
        assert back.count() == 400
        agg = back.groupBy("src").agg(F.sum("weight").alias("w"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # values round-trip
        want = {
            (r.src, r.w)
            for r in edges.groupBy("src").agg(F.sum("weight").alias("w")).collect()
        }
        got = {(r.src, r.w) for r in agg.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_edges_test")


def test_bucketed_transcripts_extraction_no_exchange(spark):
    """Extraction over a conv_id-bucketed transcripts table plans with
    NO Exchange (the per-run repartition moved to write time) and
    produces the exact same edge set as the default path."""
    from cminer_spark.operators import extract_edges
    from cminer_spark.sources.bucketed import (
        read_bucketed_transcripts,
        write_bucketed_transcripts,
    )
    from cminer_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=400, seed=11)
    spark.sql("DROP TABLE IF EXISTS bkt_tr_test")
    write_bucketed_transcripts(t, "bkt_tr_test", buckets=8)
    try:
        back = read_bucketed_transcripts(spark, "bkt_tr_test")
        fast = extract_edges(back, pre_partitioned=True)
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        want = {
            tuple(r)
            for r in extract_edges(t).select(
                "src", "dst", "type", "key", "src_key", "dst_key"
            ).collect()
        }
        got = {
            tuple(r)
            for r in fast.select(
                "src", "dst", "type", "key", "src_key", "dst_key"
            ).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_tr_test")


def test_compact_table_shrinks_files_preserving_rows(spark, tmp_path):
    from cminer_spark.sources.tables import compact_table, table_file_stats

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(16).write.parquet(path)
    before = table_file_stats(spark, path)
    assert before["n_files"] == 16

    stats = compact_table(spark, path, target_file_mb=256)
    assert stats["files_before"] == 16
    assert stats["files_after"] == 1

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert set(back.columns) == {"id", "k"}
    assert back.agg({"id": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2
    # compaction is idempotent
    again = compact_table(spark, path, target_file_mb=256)
    assert again["files_after"] == 1


def test_compact_table_rejects_catalog_refs(spark, tmp_path):
    from cminer_spark.sources.tables import compact_table, table_file_stats

    with pytest.raises(NotImplementedError):
        compact_table(spark, "iceberg:cat.db.t")
    with pytest.raises(NotImplementedError):
        table_file_stats(spark, "table:whatever")
