"""cminer_spark — a PySpark-native link-graph analytics engine.

A from-scratch engine (NOT a port) with the query and data-processing
capabilities of the reference graph miner ``Anto188bas/CMiner``:

* a labeled directed multigraph data model encoded as ``vertices`` /
  ``edges`` DataFrames (reference: ``src/Graph/Graph.py:22`` —
  ``MultiDiGraph(nx.MultiDiGraph)``),
* edge extraction from multi-turn conversation/agent transcripts via
  vectorized Arrow kernels (no per-row Python),
* iterative graph algorithms — PageRank, connected components, label
  propagation, triangle counting — as pure DataFrame shuffle-aggregate
  supersteps with explicit skew handling and checkpoint/resume,
* graph-support / label-catalog aggregations mirroring the reference's
  mining aggregates (``src/CMiner/CMiner.py:174-227``),
* large-scale training-data pipeline operators (dedup, similarity
  search, text analysis) over document/embedding tables.

Everything is DataFrame/SQL-first so Catalyst + AQE pick physical
strategies; pandas/Arrow kernels are used only where relational
operators cannot express the semantics.
"""

from cminer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
