"""SparkSession factory with scale-oriented defaults.

Local mode is the sandbox proxy for a multi-executor cluster: the same
configuration (AQE, adaptive coalescing, skew-join handling, Arrow
exchange) is what the engine would run with under ``spark-submit
--py-files`` on a real cluster; only ``master`` and the memory knobs
change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cminer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for iterative graph work.

    ``shuffle_partitions`` defaults to the core count of the local
    master so that runs at different parallelism levels (local[8] vs
    local[32] — the sandbox proxy for N vs 4N executors) are
    shuffle-bound the same way.
    """
    # Under spark-submit the JVM launches Python and exports
    # PYSPARK_GATEWAY_PORT — there the submitted --master/--conf are
    # authoritative: we must NOT force a master, and engine defaults
    # apply only where the submitted conf is silent (a builder.config
    # would otherwise clobber the user's --conf).
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    master = master or os.environ.get("CMINER_SPARK_MASTER")
    if master is None and not submitted:
        master = "local[*]"
    cores = _master_cores(master) if master else 8
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    pre: dict[str, str] = {}
    if submitted:
        try:
            from pyspark import SparkConf

            pre = dict(SparkConf().getAll())
        except Exception:
            pre = {}

    defaults = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.default.parallelism": str(cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Iterative graph supersteps re-join the (cached, unsorted)
        # adjacency every iteration: sort-merge joins would re-sort the
        # full edge table per superstep. Shuffled-hash joins measured
        # 2.5x faster on the PageRank superstep at 16M edges.
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.shuffledHashJoinFactor": "3",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Vectorized kernels (mapInArrow/mapInPandas) amortize their
        # per-batch overhead over the batch: the 10k default makes a
        # 500k-row partition pay ~50 batch round-trips where 8 do.
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("CMINER_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    }
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in defaults.items():
        if k not in pre:
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _master_cores(master: str) -> int:
    """Parse core count from a local[...] master string."""
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return 8
