"""gSpan-style ``.data`` transactional graph DB source + result sink.

Format parity with the reference (parser
``/root/reference/src/NetworkX/NetworksLoading.py:81-124``; writer
``/root/reference/src/CMiner/CMiner.py:418-446``):

* ``t # <idx> [name]`` starts a graph (transaction);
* ``v <id> <label> [label...]`` — node, multi-label;
* ``e <src> <dst> [label]`` — directed multigraph edge, missing label
  = "" (wildcard NULL_LABEL, ``Graph.py:18``);
* result blocks add ``s <support>``, ``f <frequency>`` and
  ``x <graph> <count> ...`` info lines.

Implemented as a distributed scan: ``spark.read.text`` + a
SPLIT-PARALLEL forward fill that assigns each line to the most recent
``t`` header — no driver parsing, no per-file serialization. A single
huge ``.data`` dump parallelizes across its input splits:

1. each line carries ``(_metadata.file_block_start, rid)`` — the
   split's byte offset orders splits within a file EXACTLY, and
   ``monotonically_increasing_id`` orders rows within a split, so
   ``(blk, rid)`` is a total file order with no cross-split
   partition-index assumptions;
2. one tiny aggregate per split finds its LAST header;
3. the driver computes each split's carry-in header (one collect of
   #splits rows — ~800k rows at 100 TB, the only driver-side state)
   and broadcast-joins it back;
4. a per-split window (parallel across splits) forward-fills headers,
   falling back to the carry-in for lines before the split's first
   header.

Node ids: the gSpan-style format uses integer ids; the reference
loader happens to keep them as strings
(``NetworksLoading.py:81-124``), this engine's tables use ``long``
ids throughout. Non-numeric ids raise an explicit error (try_cast +
raise_error) instead of a bare ANSI CAST failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_data_db(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a ``.data`` DB → (vertices, edges).

    vertices: (graph_id string, v_id long, labels array<string>)
    edges:    (graph_id string, src long, dst long, key int, type string)
    """
    # `lines` is consumed TWICE (the per-split carry aggregate below,
    # then the tagged output), so the projection is materialized once
    # via an eager lineage cut — the text scan + trim + header parse
    # run a single time and both consumers read the materialized
    # (file, blk, rid, line, hdr) blocks. The header parse tokenizes
    # `t` lines only (`when` evaluates its branch conditionally in
    # codegen); the full tokenization happens once, downstream of the
    # carry join.
    header_toks = F.split("line", " +")
    lines = (
        spark.read.text(path)
        .select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_block_start").alias("blk"),
            F.monotonically_increasing_id().alias("rid"),
            F.trim(F.col("value")).alias("line"),
        )
        .where(F.col("line") != "")
        .withColumn(
            "hdr",
            F.when(
                F.col("line").rlike("^t( |$)"),
                F.coalesce(F.get(header_toks, 3), F.get(header_toks, 2)),
            ),
        )
    )
    from cminer_spark.plans.checkpoint import truncate_lineage

    lines = truncate_lineage(lines)

    # Split-parallel forward fill (see module docstring): per-split
    # last header → driver carry computation → broadcast back.
    split_last = (
        lines.groupBy("file", "blk")
        .agg(
            F.max(
                F.when(F.col("hdr").isNotNull(), F.struct("rid", "hdr"))
            )["hdr"].alias("last_hdr")
        )
        .collect()
    )
    carry_rows = []
    carry: dict[str, str | None] = {}
    for r in sorted(split_last, key=lambda r: (r["file"], r["blk"])):
        carry_rows.append((r["file"], r["blk"], carry.get(r["file"])))
        if r["last_hdr"] is not None:
            carry[r["file"]] = r["last_hdr"]
    carries = spark.createDataFrame(
        carry_rows, "file string, blk long, carry_hdr string"
    )

    w = Window.partitionBy("file", "blk").orderBy("rid")
    tagged = (
        lines.join(F.broadcast(carries), ["file", "blk"], "left")
        .withColumn(
            "graph_id",
            F.coalesce(
                F.last("hdr", ignorenulls=True).over(w), F.col("carry_hdr")
            ),
        )
        .withColumn("pos", F.struct("blk", "rid"))
        .withColumn("toks", F.split("line", " +"))
        .withColumn("kind", F.get("toks", 0))
    )

    def _num_id(tok: F.Column) -> F.Column:
        # explicit error for non-numeric ids (format restriction
        # documented above) instead of an opaque ANSI CAST failure
        return F.when(
            tok.try_cast("long").isNull() & tok.isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit("read_data_db: non-numeric node id in .data file: "),
                    tok,
                )
            ).cast("long"),
        ).otherwise(tok.try_cast("long"))

    vertices = (
        tagged.where(F.col("kind") == "v")
        .select(
            "graph_id",
            _num_id(F.get("toks", 1)).alias("v_id"),
            F.sort_array(F.slice("toks", 3, 1000)).alias("labels"),
        )
    )
    edge_rows = tagged.where(F.col("kind") == "e").select(
        "graph_id",
        _num_id(F.get("toks", 1)).alias("src"),
        _num_id(F.get("toks", 2)).alias("dst"),
        F.coalesce(F.get("toks", 3), F.lit("")).alias("type"),
        "pos",
    )
    # multigraph key: 0-based per (graph, src, dst) in file order
    # (reference key allocation Graph.py:44-49)
    kw = Window.partitionBy("graph_id", "src", "dst").orderBy("pos")
    edges = edge_rows.withColumn(
        "key", (F.row_number().over(kw) - 1).cast("int")
    ).select("graph_id", "src", "dst", "key", "type")
    return vertices, edges


def parse_pattern_text(text: str):
    """Parse ``-``-separated ``v``/``e`` pattern blocks (reference
    ``src/CMiner/main.py:6-28``) into matcher Patterns — driver-side,
    patterns are tiny."""
    from cminer_spark.operators.matching import Pattern

    patterns = []
    for block in text.split("-"):
        lines = [l.strip() for l in block.strip().splitlines() if l.strip()]
        if not lines:
            continue
        p = Pattern()
        for line in lines:
            toks = line.split()
            if toks[0] == "v":
                p.add_node(toks[1], toks[2:])
            elif toks[0] == "e":
                p.add_edge(toks[1], toks[2], toks[3] if len(toks) > 3 else "")
        patterns.append(p)
    return patterns


def write_patterns_text(
    patterns_df: DataFrame, path: str | None = None
) -> DataFrame:
    """Serialize mined patterns to the reference's ``t/v/e/s/f`` block
    text (result sink, CMiner.py:418-446 / :503-516).

    ``patterns_df``: (pattern_id, vertices array<struct<v_id,labels>>,
    edges array<struct<src,dst,type>>, support, frequency
    [, graph_counts array<struct<graph_id,cnt>>]).
    A non-empty ``graph_counts`` adds the reference's per-graph info
    line ``x (<graph>, <count>) ...`` (CMiner.py:440-442).
    Returns a one-column text DataFrame; writes it when ``path`` given.
    """
    v_lines = F.array_join(
        F.transform(
            "vertices",
            lambda v: F.concat_ws(
                " ", F.lit("v"), v["v_id"], F.array_join(v["labels"], " ")
            ),
        ),
        "\n",
    )
    e_lines = F.array_join(
        F.transform(
            "edges",
            lambda e: F.concat_ws(
                " ", F.lit("e"), e["src"], e["dst"], e["type"]
            ),
        ),
        "\n",
    )
    parts = [
        F.concat(F.lit("t # "), F.col("pattern_id").cast("string")),
        v_lines,
        e_lines,
        F.concat(F.lit("s "), F.col("support").cast("string")),
        F.concat(F.lit("f "), F.col("frequency").cast("string")),
    ]
    if "graph_counts" in patterns_df.columns:
        x_line = F.when(
            F.size("graph_counts") > 0,
            F.concat(
                F.lit("x "),
                F.array_join(
                    F.transform(
                        "graph_counts",
                        lambda g: F.concat(
                            F.lit("("),
                            g["graph_id"],
                            F.lit(", "),
                            g["cnt"].cast("string"),
                            F.lit(")"),
                        ),
                    ),
                    " ",
                ),
            ),
        )
        parts.append(x_line)  # concat_ws skips the NULL when empty
    block = F.concat_ws("\n", *parts)
    out = patterns_df.select(block.alias("value"))
    if path is not None:
        out.coalesce(1).write.mode("overwrite").text(path)
    return out


def write_mappings_text(
    embeddings: DataFrame, graph_col: str = "_g", path: str | None = None
) -> DataFrame:
    """show_mappings output: one line per embedding,
    ``<graph> {q0: v, q1: v, ...}`` (reference CMiner.py:431-438 prints
    per-graph mapping dicts). Distributed — mappings never transit the
    driver."""
    node_cols = sorted(c for c in embeddings.columns if c.startswith("n_"))
    body = F.concat_ws(
        ", ",
        *[
            F.concat(F.lit(f"{c[2:]}: "), F.col(c).cast("string"))
            for c in node_cols
        ],
    )
    out = embeddings.select(
        F.concat(
            F.col(graph_col).cast("string"), F.lit(" {"), body, F.lit("}")
        ).alias("value")
    )
    if path is not None:
        out.write.mode("overwrite").text(path)
    return out
