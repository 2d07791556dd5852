"""Streaming exact deduplication — the online twin of
:func:`cminer_spark.pipeline.dedup.exact_duplicates`.

Built on Structured Streaming's NATIVE stateful dedup operator
(``dropDuplicates`` / ``dropDuplicatesWithinWatermark``) rather than a
custom ``applyInPandasWithState`` kernel: the state store, changelog
checkpointing, and RocksDB spill come for free, and the plan stays
entirely JVM-side (the only expression is the md5 text hash).

State-size contract (the 100 TB question):

* ``stream_exact_dedup`` keeps ONE state row per distinct text hash
  forever — exact global dedup, state grows with the distinct corpus
  (32-byte keys; a billion distinct docs ≈ tens of GB across the
  cluster's state stores).
* ``within_watermark`` bounds state to the event-time window: a
  duplicate arriving later than the watermark delay after the first
  copy is NOT suppressed — the standard bounded-state trade-off,
  made explicit here (Spark's ``dropDuplicatesWithinWatermark``).

Batch parity: the same ``md5(text)`` key as the batch operator, so a
drained stream emits exactly one row per distinct hash — asserted
stream-vs-batch in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    within_watermark: str | None = None,
) -> DataFrame:
    """First-occurrence pass-through: emit each document whose
    ``md5(text)`` has not been seen before (append mode).

    With ``within_watermark`` (e.g. ``"1 hour"``), a watermark on
    ``ts_col`` bounds the dedup state and duplicates are only
    suppressed within the watermark window.
    """
    out = docs_stream.withColumn("text_hash", F.md5(F.col(text_col)))
    if within_watermark is not None:
        out = out.withWatermark(ts_col, within_watermark)
        return out.dropDuplicatesWithinWatermark(["text_hash"])
    return out.dropDuplicates(["text_hash"])
