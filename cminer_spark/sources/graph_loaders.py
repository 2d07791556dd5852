"""CSV-directory and JSON node-link graph sources.

Parity with the reference loaders:

* CSV layout (``/root/reference/src/NetworkX/NetworksLoading.py:127-164``,
  layout doc ``src/NetworkX/README.md:9-66``): one directory per
  network containing ``nodes/*.csv`` (id, labels joined by a
  separator, extra props) and ``edges/*.csv`` (source, target, type,
  extra props);
* JSON: networkx node-link documents
  (``NetworksLoading.py:173-178``).

Both return the engine's table encoding: vertices ``(graph_id, v_id,
labels, props)`` / edges ``(graph_id, src, dst, key, type, props)``.
Extra columns become a ``map<string,string>`` props column (the
reference carries untyped attr dicts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _props_map(df: DataFrame, exclude: list[str]) -> F.Column:
    extra = [c for c in df.columns if c not in exclude]
    if not extra:
        return F.create_map().cast("map<string,string>")
    pairs: list[F.Column] = []
    for c in extra:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    return F.create_map(*pairs)


def read_csv_graph_db(
    spark: SparkSession,
    root: str,
    sep_label: str = " ",
    graphs: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read ``<root>/<network>/nodes|edges/*.csv`` directories."""
    names = graphs or sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )
    v_parts, e_parts = [], []
    for name in names:
        nodes = spark.read.csv(
            os.path.join(root, name, "nodes"), header=True, inferSchema=False
        )
        v_parts.append(
            nodes.select(
                F.lit(name).alias("graph_id"),
                F.col("id").cast("long").alias("v_id"),
                F.sort_array(
                    F.filter(
                        F.split(F.coalesce(F.col("labels"), F.lit("")), sep_label),
                        lambda x: x != "",
                    )
                ).alias("labels"),
                _props_map(nodes, ["id", "labels"]).alias("props"),
            )
        )
        edges = spark.read.csv(
            os.path.join(root, name, "edges"), header=True, inferSchema=False
        )
        # parallel-edge keys follow FILE ORDER (reference allocates keys
        # in load order, Graph.py:44-49): order the window by (file,
        # position-within-split) so key assignment is deterministic
        # across runs/partitionings — orderBy(lit(1)) is not.
        edges = edges.withColumn("_file", F.input_file_name()).withColumn(
            "_pos", F.monotonically_increasing_id()
        )
        kw = Window.partitionBy("source", "target").orderBy("_file", "_pos")
        e_parts.append(
            edges.withColumn("key", (F.row_number().over(kw) - 1).cast("int"))
            .select(
                F.lit(name).alias("graph_id"),
                F.col("source").cast("long").alias("src"),
                F.col("target").cast("long").alias("dst"),
                "key",
                F.coalesce(F.col("type"), F.lit("")).alias("type"),
                _props_map(
                    edges, ["source", "target", "type", "_file", "_pos", "key"]
                ).alias("props"),
            )
        )
    v = v_parts[0]
    for x in v_parts[1:]:
        v = v.unionByName(x)
    e = e_parts[0]
    for x in e_parts[1:]:
        e = e.unionByName(x)
    return v, e


def read_json_graph(
    spark: SparkSession, path: str, graph_id: str = "g0"
) -> tuple[DataFrame, DataFrame]:
    """Read a networkx node-link JSON document.

    Every extra node/edge attribute becomes a ``map<string,string>``
    ``props`` entry — the reference's node-link load carries all attrs
    (``NetworksLoading.py:173-178``), which the F4 attribute-containment
    matcher can then query; parity with the CSV path."""
    doc = spark.read.option("multiLine", True).json(path)
    nodes_flat = doc.select(F.explode("nodes").alias("n")).select("n.*")
    labels_col = (
        F.sort_array(
            F.coalesce(F.col("labels"), F.array().cast("array<string>"))
        )
        if "labels" in nodes_flat.columns
        else F.array().cast("array<string>")
    )
    nodes = nodes_flat.select(
        F.lit(graph_id).alias("graph_id"),
        F.col("id").cast("long").alias("v_id"),
        labels_col.alias("labels"),
        _props_map(nodes_flat, ["id", "labels"]).alias("props"),
    )
    links_col = "links" if "links" in doc.columns else "edges"
    # document order is the reference's key-allocation order
    # (Graph.py:44-49): posexplode keeps it, making keys deterministic
    links_flat = doc.select(
        F.posexplode(links_col).alias("_pos", "e")
    ).select("_pos", "e.*")
    type_col = (
        F.coalesce(F.col("type"), F.lit(""))
        if "type" in links_flat.columns
        else F.lit("")
    )
    kw = Window.partitionBy("src", "dst").orderBy("_pos")
    edges = (
        links_flat.select(
            F.lit(graph_id).alias("graph_id"),
            F.col("source").cast("long").alias("src"),
            F.col("target").cast("long").alias("dst"),
            type_col.alias("type"),
            _props_map(links_flat, ["source", "target", "type", "_pos"]).alias(
                "props"
            ),
            "_pos",
        )
        .withColumn("key", (F.row_number().over(kw) - 1).cast("int"))
        .select("graph_id", "src", "dst", "key", "type", "props")
    )
    return nodes, edges
