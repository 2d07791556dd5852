"""Format-agnostic table loader — the Iceberg seam.

The north rule mandates Iceberg transcript tables; this sandbox has no
Iceberg catalog jar, so the engine reads through one seam
(SURVEY §7.3): a table reference resolves by scheme, keeping Iceberg
a CONFIGURATION choice, not a code change.

* ``iceberg:<catalog.db.table>``  → ``spark.read.table(...)``
  (requires ``spark.sql.catalog.*`` configured with the Iceberg
  extension jar on a real cluster; partition pruning + predicate
  pushdown then apply to ``bucket(conv_id)`` layouts for free);
* ``table:<name>``               → ``spark.read.table`` (any catalog);
* ``parquet:<path>`` or bare path → ``spark.read.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if ref.startswith("iceberg:") or ref.startswith("table:"):
        return spark.read.table(ref.split(":", 1)[1])
    if ref.startswith("parquet:"):
        return spark.read.parquet(ref.split(":", 1)[1])
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    if ref.startswith("iceberg:") or ref.startswith("table:"):
        df.writeTo(ref.split(":", 1)[1]).createOrReplace()
        return
    path = ref.split(":", 1)[1] if ref.startswith("parquet:") else ref
    df.write.mode(mode).parquet(path)


def table_file_stats(spark: SparkSession, ref: str) -> dict:
    """File-level stats for a parquet table path: ``{"n_files", 
    "total_bytes"}`` — the input to the compaction decision. Iceberg
    refs carry their own file metadata (``<table>.files``); this seam
    covers the parquet paths the sandbox exercises."""
    if ref.startswith(("iceberg:", "table:")):
        raise NotImplementedError(
            "catalog tables expose file stats via their metadata tables "
            "(e.g. Iceberg's <table>.files); table_file_stats covers "
            "parquet paths"
        )
    path = ref.split(":", 1)[1] if ref.startswith("parquet:") else ref
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    n, total = 0, 0
    it = fs.listFiles(jvm_path, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += st.getLen()
    return {"n_files": n, "total_bytes": total}


def compact_table(
    spark: SparkSession,
    ref: str,
    target_file_mb: int = 256,
) -> dict:
    """Small-file compaction for a parquet table path — the
    maintenance companion of the incremental-ingest family: daily
    delta appends (extract_edges_delta / incremental_components)
    accumulate small files, and scan cost at 10^12-turn scale is
    driven by file count as much as bytes.

    Rewrites the table to ``ceil(total_bytes / target_file_mb)``
    files via a fresh scan + repartition, then swaps directories
    through the Hadoop FileSystem API (write to ``<path>.__compact__``,
    rename old aside, rename new in, drop old) — the same guarded
    rename pattern as plans/checkpoint.py's marker commit. The swap
    window is not transactional: on a real cluster the Iceberg path
    (``rewrite_data_files``) provides snapshot-isolated compaction,
    which is exactly why the seam keeps Iceberg a configuration
    choice.

    Returns ``{"files_before", "files_after", "total_bytes"}``.
    """
    if ref.startswith(("iceberg:", "table:")):
        raise NotImplementedError(
            "catalog tables compact via their own maintenance procedure "
            "(Iceberg: CALL rewrite_data_files); compact_table covers "
            "parquet paths"
        )
    path = ref.split(":", 1)[1] if ref.startswith("parquet:") else ref
    before = table_file_stats(spark, path)
    target_bytes = max(1, target_file_mb) * 1024 * 1024
    n_out = max(1, -(-before["total_bytes"] // target_bytes))

    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    fs.delete(Path(tmp), True)
    fs.delete(Path(old), True)

    df = spark.read.parquet(path)
    # coalesce avoids a shuffle when shrinking file count (the common
    # compaction direction); growing file count needs the full shuffle
    writer = (
        df.coalesce(n_out)
        if n_out <= max(1, before["n_files"])
        else df.repartition(n_out)
    )
    writer.write.mode("overwrite").parquet(tmp)

    if not fs.rename(Path(path), Path(old)):
        fs.delete(Path(tmp), True)
        raise IOError(f"compact_table: could not move {path} aside")
    if not fs.rename(Path(tmp), Path(path)):
        # roll back: put the original table back
        fs.rename(Path(old), Path(path))
        raise IOError(f"compact_table: could not swap in compacted {path}")
    fs.delete(Path(old), True)

    after = table_file_stats(spark, path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "total_bytes": after["total_bytes"],
    }
