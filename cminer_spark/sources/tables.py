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
