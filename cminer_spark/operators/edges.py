"""Edge extraction from multi-turn transcripts — vectorized Arrow kernel.

Input: the transcripts table ``(conv_id, turn_idx, role, text, tool,
ts)``. Output: the engine's labeled directed multigraph edge table
(SURVEY §1.1 — the Spark encoding of the reference's
``MultiDiGraph``, ``/root/reference/src/Graph/Graph.py:22``):

* ``replies_to`` edges: turn *i* → turn *i-1* within a conversation
  (stable turn ordering);
* ``invokes`` edges: a tool-call turn → the tool's hub vertex.

Vertex identity is a stable 64-bit ``xxhash64`` of a human-readable
string key (``"<conv_id>#<turn_idx>"`` for turns, ``"tool:<name>"``
for tools) computed JVM-side — the Python kernel never hashes.

Scale design:

* ``repartition(conv_id)`` + ``sortWithinPartitions(conv_id,
  turn_idx)`` co-locates and orders each conversation, so pairing is a
  per-partition streaming pass — no driver involvement, no global
  sort.
* The kernel is ``mapInPandas`` (Arrow batches). Conversations can
  straddle Arrow batch boundaries inside a partition, so the kernel
  holds back the trailing (possibly incomplete) conversation of each
  batch and prepends it to the next — O(max conversation length)
  memory, independent of partition size.
* All per-batch work is numpy/pandas vectorized — no per-row Python
  (BASELINE.json input_hint requirement).

Parallel-edge ``key`` (reference identity triple ``(src, dst, key)``,
``src/Graph/Graph.py:44-54``): this extraction emits at most one edge
per (turn, predecessor) and (turn, tool), so ``key`` is constantly 0
and is attached without a shuffle. ``with_parallel_keys=True``
computes true per-(src,dst) ranks via a window for inputs that need
multigraph keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KERNEL_SCHEMA = "src_key string, dst_key string, type string, weight double"
_TURNS_SCHEMA = "conv_id string, turn_idx int, text string"

REPLIES_TO = "replies_to"
INVOKES = "invokes"


def _edges_from_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized edge construction for one complete set of conversations.

    ``pdf`` must be sorted by (conv_id, turn_idx) and contain only
    whole conversations.
    """
    conv = pdf["conv_id"].to_numpy()
    turn = pdf["turn_idx"].to_numpy()
    src_key = pdf["conv_id"].astype(str) + "#" + pdf["turn_idx"].astype(str)
    src_arr = src_key.to_numpy()

    out_src: list = []
    out_dst: list = []
    out_type: list = []

    if len(pdf) > 1:
        same_conv = conv[1:] == conv[:-1]
        out_src.append(src_arr[1:][same_conv])
        out_dst.append(src_arr[:-1][same_conv])
        out_type.append(pd.array([REPLIES_TO] * int(same_conv.sum())))

    tool = pdf["tool"]
    has_tool = tool.notna() & (tool != "")
    n_tools = int(has_tool.sum())
    if n_tools:
        out_src.append(src_arr[has_tool.to_numpy()])
        out_dst.append(("tool:" + tool[has_tool].astype(str)).to_numpy())
        out_type.append(pd.array([INVOKES] * n_tools))

    if not out_src:
        return pd.DataFrame(
            {"src_key": pd.Series(dtype=str), "dst_key": pd.Series(dtype=str),
             "type": pd.Series(dtype=str), "weight": pd.Series(dtype=float)}
        )
    import numpy as np

    s = np.concatenate([np.asarray(a, dtype=object) for a in out_src])
    d = np.concatenate([np.asarray(a, dtype=object) for a in out_dst])
    t = np.concatenate([np.asarray(a, dtype=object) for a in out_type])
    return pd.DataFrame(
        {"src_key": s, "dst_key": d, "type": t, "weight": 1.0}
    )


def _conv_stream_kernel(transform):
    """Wrap a whole-conversation batch transform into a mapInPandas
    kernel that carries the trailing conversation across Arrow batches."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_conv = pdf["conv_id"].iloc[-1]
            # conversations are contiguous (sorted), so all rows of the
            # trailing conversation form a suffix; hold them back in
            # case the conversation continues in the next Arrow batch.
            n_tail = int((pdf["conv_id"] == last_conv).sum())
            split = len(pdf) - n_tail
            pending = pdf.iloc[split:]
            head = pdf.iloc[:split]
            if len(head):
                yield transform(head)
        if pending is not None and len(pending):
            yield transform(pending)

    return kernel


def _prepared(transcripts: DataFrame, partitions: int | None) -> DataFrame:
    parts = partitions or transcripts.sparkSession.sparkContext.defaultParallelism
    return transcripts.repartition(parts, "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


def extract_edges(
    transcripts: DataFrame,
    partitions: int | None = None,
    with_parallel_keys: bool = False,
) -> DataFrame:
    """Transcripts → edge table ``(src, dst, type, key, weight,
    src_key, dst_key)``."""
    prepared = _prepared(
        transcripts.select("conv_id", "turn_idx", "tool"), partitions
    )
    raw = prepared.mapInPandas(
        _conv_stream_kernel(_edges_from_batch), schema=_KERNEL_SCHEMA
    )
    edges = raw.select(
        F.xxhash64("src_key").alias("src"),
        F.xxhash64("dst_key").alias("dst"),
        F.col("type"),
        F.col("weight"),
        F.col("src_key"),
        F.col("dst_key"),
    )
    if with_parallel_keys:
        w = Window.partitionBy("src", "dst").orderBy("type", "src_key")
        edges = edges.withColumn("key", (F.row_number().over(w) - 1).cast("int"))
    else:
        edges = edges.withColumn("key", F.lit(0))
    return edges.select("src", "dst", "type", "key", "weight", "src_key", "dst_key")


def passthrough_turns(transcripts: DataFrame, partitions: int | None = None) -> DataFrame:
    """Run turns through the same partition/sort/carry path as edge
    extraction and emit them unchanged — the per-turn text-equality
    invariant is asserted by comparing ``sha2(text)`` of this output
    against the source (BASELINE.json input_hint)."""
    prepared = _prepared(
        transcripts.select("conv_id", "turn_idx", "text"), partitions
    )

    def identity(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[["conv_id", "turn_idx", "text"]]

    return prepared.mapInPandas(_conv_stream_kernel(identity), schema=_TURNS_SCHEMA)


def vertices_from_transcripts(transcripts: DataFrame) -> DataFrame:
    """Vertex table ``(v_id, v_key, labels)`` — turn vertices labeled
    with their role, tool vertices labeled ``tool`` (multi-label model
    per reference ``src/Graph/Graph.py:56-60,87-93``; labels sorted)."""
    turn_v = transcripts.select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("v_key"),
        F.sort_array(F.array(F.lit("turn"), F.concat(F.lit("role:"), "role"))).alias(
            "labels"
        ),
    )
    tool_v = (
        transcripts.where(F.col("tool").isNotNull() & (F.col("tool") != ""))
        .select(F.concat(F.lit("tool:"), "tool").alias("v_key"))
        .distinct()
        .select("v_key", F.array(F.lit("tool")).alias("labels"))
    )
    return (
        turn_v.unionByName(tool_v)
        .select(F.xxhash64("v_key").alias("v_id"), "v_key", "labels")
    )
