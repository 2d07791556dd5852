"""Bucketed edge-table storage: pay the partitioning shuffle once at
write time, skip it on every subsequent read.

An iterative engine reads the same edge table hundreds of times
(every PageRank/CC/Katz run re-partitions the adjacency on ``src``).
Hive-style bucketing moves that exchange to the writer: a table
written with ``bucketBy(n, src)`` + ``sortBy(src)`` exposes its hash
distribution to Catalyst, so scans feeding a ``groupBy(src)`` /
``join(..., on src)`` / ``Window.partitionBy(src)`` plan with NO
Exchange (verified by plan test). At 100 TB this is the difference
between one shuffle per daily write and one shuffle per algorithm
run.

Bucketing requires a catalog table (``saveAsTable``) — the same seam
``sources/tables.py`` uses, so on a real cluster the table lands in
the configured metastore/Iceberg catalog (Iceberg's analog is a
``bucket(n, src)`` partition transform) and in this sandbox in the
local ``spark-warehouse``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_bucketed_edges",
    "read_bucketed_edges",
    "write_bucketed_transcripts",
    "read_bucketed_transcripts",
]


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "src",
    mode: str = "overwrite",
) -> None:
    """Persist ``edges`` bucketed and sorted on ``key`` (one shuffle,
    at write time). ``buckets`` should match the downstream
    parallelism class (~2x cores locally; at cluster scale size so a
    bucket holds ~250k-1M edge rows)."""
    (
        edges.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed edge table — the bucket spec rides the catalog
    entry, so downstream ``src``-keyed operators plan shuffle-free."""
    return spark.read.table(table)


def write_bucketed_transcripts(
    transcripts: DataFrame,
    table: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist transcripts bucketed on ``conv_id`` and sorted by
    ``(conv_id, turn_idx)`` — the edge-extraction input layout.

    Extraction needs every conversation co-located and ordered; on a
    raw table that is a full ``repartition(conv_id)`` exchange of
    10^12 turns PER extraction run. Bucketing pays that exchange once
    at ingest: ``extract_edges(..., pre_partitioned=True)`` then maps
    the Arrow kernel straight over the bucket scan — no Exchange in
    the plan (plan-tested).

    The explicit ``repartition(buckets, conv_id)`` before the write
    uses the same Murmur3 hash as the bucket spec, so every bucket is
    written as exactly ONE file and the per-file ``sortBy`` order is
    the per-BUCKET order a scan task sees. (Without it each write
    task emits a file per bucket and a bucket scan concatenates
    sorted runs — which ``pre_partitioned=True`` would re-sort
    in-partition anyway, but one file per bucket keeps that sort a
    cheap presorted pass.)
    """
    (
        transcripts.repartition(buckets, "conv_id")
        .write.mode(mode)
        .bucketBy(buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_transcripts(spark: SparkSession, table: str) -> DataFrame:
    """Read a transcripts table written by
    :func:`write_bucketed_transcripts` — one scan partition per
    bucket, conversations co-located; feed to
    ``extract_edges(..., pre_partitioned=True)``."""
    return spark.read.table(table)
