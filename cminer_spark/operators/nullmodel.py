"""Configuration-model null graph — degree-preserving edge rewiring.

Motif/statistic significance on a link graph needs a null model: "is
this triangle count / reciprocity / assortativity higher than chance
for a graph with the SAME degrees?" The directed configuration model
answers it by re-pairing edge endpoints uniformly while preserving
every vertex's out-degree and the global in-stub multiset.

Distributed construction (no rejection sampling, no driver state):
both endpoint columns are independently shuffled into a deterministic
md5 order and zipped positionally —

1. ``src`` stubs: every edge row keeps its source (out-degrees are
   trivially exact);
2. ``dst`` stubs: the multiset of destination endpoints is re-ordered
   by ``md5(dst:seed:row)`` and matched 1:1 to the md5-ordered edge
   rows (in-degree multiset exact — it is a permutation).

Zipping two deterministic global orders = two window ``row_number``
passes + one equi-join on position: 3 shuffles total, each O(|E|),
no collect. Per-partition position arithmetic would be cheaper but
ties the result to the partitioning; the window form is
bit-reproducible at any parallelism AND oracle-expressible (gate
``configuration_rewire`` recomputes both orders in DuckDB).

Caveats (inherent to the configuration model, documented not hidden):
the rewired multigraph may contain self-loops and parallel edges —
the standard convention (Newman 2003); they vanish asymptotically on
sparse graphs and callers can drop them. Position keys fit a window
only up to per-partition row limits; ``row_number`` is a global
window per se — here each window is UNPARTITIONED, which on 10^12
edges must instead ride ``zipWithIndex``-style per-partition offsets;
the operator therefore accepts ``n_buckets`` to split the pairing
into independent hash buckets (endpoints are only re-paired WITHIN a
bucket of ~|E|/n_buckets edges, preserving degrees exactly per
bucket and keeping every window partition bounded — the sampling is
then uniform over a restricted but still degree-exact pairing set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["configuration_rewire"]


def configuration_rewire(
    edges: DataFrame,
    seed: int = 0,
    n_buckets: int = 64,
) -> DataFrame:
    """Return a degree-preserving rewired edge table ``(src, dst)``.

    Deterministic in ``(input multiset, seed, n_buckets)`` —
    independent of partitioning. Out-degree of every vertex and the
    in-stub multiset are preserved exactly (per bucket, hence
    globally). ``n_buckets`` bounds each window partition to
    ~|E|/n_buckets rows.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # bucket the EDGE ROW (not an endpoint) so both stub multisets of
    # a bucket come from the same rows: degrees stay exact per bucket.
    tagged = edges.select("src", "dst").withColumn(
        "_b",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                            F.lit(str(int(seed))),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(int(n_buckets)),
        ),
    )
    # two deterministic in-bucket orders: source stubs by the src-side
    # key, destination stubs by an INDEPENDENT dst-side key
    skey = F.md5(
        F.concat_ws(
            ":",
            F.lit("s"),
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.lit(str(int(seed))),
        )
    )
    dkey = F.md5(
        F.concat_ws(
            ":",
            F.lit("d"),
            F.col("dst").cast("string"),
            F.col("src").cast("string"),
            F.lit(str(int(seed))),
        )
    )
    ws = Window.partitionBy("_b").orderBy(skey, "src", "dst")
    wd = Window.partitionBy("_b").orderBy(dkey, "dst", "src")
    src_stubs = tagged.select(
        "_b", "src", F.row_number().over(ws).alias("_pos")
    )
    dst_stubs = tagged.select(
        "_b", "dst", F.row_number().over(wd).alias("_pos")
    )
    return src_stubs.join(dst_stubs, ["_b", "_pos"]).select("src", "dst")
