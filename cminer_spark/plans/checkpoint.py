"""Per-superstep checkpoint with per-partition lineage + metrics.

Every iterative algorithm in the engine (PageRank, CC, LPA) routes
its per-iteration state through this store when given a checkpoint
directory. Responsibilities:

1. **Lineage truncation** — each superstep's plan would otherwise
   grow unboundedly (SURVEY §7.3); writing + reading back cuts the
   plan at a stable parquet scan.
2. **Exact resume** — a superstep is committed only when its metrics
   JSON exists (written strictly after the parquet ``_SUCCESS``);
   ``latest()`` returns the highest committed iteration, so a killed
   run resumes from the last complete superstep and produces results
   identical to an uninterrupted run (tested).
3. **Per-partition lineage + convergence metrics** — for each
   superstep we record per-partition row counts and order-insensitive
   content hashes (``sum(xxhash64(struct(*)))`` per partition) plus
   the algorithm's convergence metrics (e.g. L1 delta).

Layout::

    <dir>/iter=<i>/...parquet      # state
    <dir>/meta/iter_<i>.json       # commit marker + lineage + metrics

Path support: BOTH the parquet state (``DataFrame.write``) and the
JSON commit-marker sidecars go through Hadoop filesystem APIs — the
sidecars via :class:`_HadoopIO` (``Path.getFileSystem`` on the
session's Hadoop conf) — so the checkpoint directory may be a local
path, NFS, HDFS, or an object store (s3a://, gs://, abfss://) with
the matching connector on the classpath. Commit markers rely on
``FileContext.rename(Rename.OVERWRITE)`` as the commit point (atomic
replace; falls back to ``FileSystem.rename`` with a CHECKED boolean
return on schemes without an AbstractFileSystem binding); on stores
where rename is copy+delete the marker is still written whole-file, so
a reader never observes a partial marker.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class _HadoopIO:
    """Sidecar I/O through the JVM Hadoop FileSystem — works on any
    scheme the session's Hadoop conf can resolve (file://, hdfs://,
    s3a://, ...)."""

    def __init__(self, spark: SparkSession, base: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gateway = spark._sc._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._IOUtils = jvm.org.apache.commons.io.IOUtils
        self.fs = self._Path(base).getFileSystem(self._conf)

    def mkdirs(self, path: str) -> None:
        self.fs.mkdirs(self._Path(path))

    def listdir(self, path: str) -> list[str]:
        p = self._Path(path)
        if not self.fs.exists(p):
            return []
        return [s.getPath().getName() for s in self.fs.listStatus(p)]

    def read_text(self, path: str) -> str:
        stream = self.fs.open(self._Path(path))
        try:
            return bytes(self._IOUtils.toByteArray(stream)).decode("utf-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = self._Path(path + ".tmp")
        out = self.fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self._Path(path)
        # Commit point. Preferred: FileContext.rename(OVERWRITE) — the
        # posix-rename analog (atomic replace, throws on failure), so
        # overwriting an existing marker (update_metrics) has NO
        # delete→rename window in which a crash would silently
        # un-commit an already-committed iteration. Only the FileContext
        # LOOKUP falls back (schemes without an AbstractFileSystem
        # binding, e.g. bare s3a); a rename error from a real
        # FileContext propagates — treating it as fallback-eligible
        # would let the delete-then-retry below destroy a previously
        # COMMITTED marker on quota/permission failures.
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                dst.toUri(), self._conf
            )
        except Exception:
            fc = None
        if fc is not None:
            opts = self._gateway.new_array(
                self._jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            opts[0] = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            fc.rename(tmp, dst, opts)
            return
        # FileSystem.rename reports failure by RETURNING FALSE, not
        # throwing. Replace dst only when the false return is actually
        # the refuse-to-clobber case (tmp still present, dst present).
        if not self.fs.rename(tmp, dst):
            if not self.fs.exists(tmp) or not self.fs.exists(dst):
                raise IOError(f"checkpoint marker rename failed: {path}")
            self.fs.delete(dst, False)
            if not self.fs.rename(tmp, dst):
                raise IOError(f"checkpoint marker rename failed: {path}")

    def delete_recursive(self, path: str) -> None:
        p = self._Path(path)
        if self.fs.exists(p):
            self.fs.delete(p, True)


class SuperstepCheckpoint:
    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.dir = directory.rstrip("/")
        self.io = _HadoopIO(spark, self.dir)
        self.io.mkdirs(f"{self.dir}/meta")

    # -- paths ---------------------------------------------------------
    def _data_path(self, i: int) -> str:
        return f"{self.dir}/iter={i}"

    def _meta_path(self, i: int) -> str:
        return f"{self.dir}/meta/iter_{i}.json"

    # -- api -----------------------------------------------------------
    def committed_iterations(self) -> list[int]:
        out = []
        for name in self.io.listdir(f"{self.dir}/meta"):
            if name.startswith("iter_") and name.endswith(".json"):
                out.append(int(name[len("iter_") : -len(".json")]))
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame, dict] | None:
        """Highest committed (iteration, state, metrics), or None."""
        its = self.committed_iterations()
        if not its:
            return None
        i = its[-1]
        meta = json.loads(self.io.read_text(self._meta_path(i)))
        return i, self.spark.read.parquet(self._data_path(i)), meta

    def save(self, i: int, df: DataFrame, metrics: dict) -> DataFrame:
        """Write superstep state + lineage, return the read-back frame
        (lineage-truncated) for the next superstep."""
        path = self._data_path(i)
        df.write.mode("overwrite").parquet(path)
        # explicit schema: skips the footer-sampling schema-inference
        # job the bare read would run per superstep
        back = self.spark.read.schema(df.schema).parquet(path)
        lineage = [
            {"partition": r["p"], "rows": r["rows"], "content_hash": r["h"]}
            for r in (
                back.groupBy(F.spark_partition_id().alias("p"))
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    # bit_xor: order-insensitive content hash, overflow-free
                    # under ANSI mode
                    F.expr(
                        "bit_xor(xxhash64(struct("
                        + ", ".join(f"`{c}`" for c in back.columns)
                        + ")))"
                    ).alias("h"),
                )
                .collect()
            )
        ]
        meta = {
            "iteration": i,
            "rows": int(sum(p["rows"] for p in lineage)),
            "partitions": lineage,
            "metrics": metrics,
        }
        self.io.write_text_atomic(self._meta_path(i), json.dumps(meta))
        return back

    def update_metrics(self, i: int, extra: dict) -> None:
        """Merge extra metrics (e.g. the convergence delta computed
        after the state write) into a committed superstep's meta."""
        path = self._meta_path(i)
        meta = json.loads(self.io.read_text(path))
        meta["metrics"].update(extra)
        self.io.write_text_atomic(path, json.dumps(meta))

    def clear(self) -> None:
        self.io.delete_recursive(self.dir)
        self.io.mkdirs(f"{self.dir}/meta")


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Checkpoint-less lineage cut for un-checkpointed runs:
    ``localCheckpoint`` keeps iterative plans bounded without a
    durable store (durable runs use :class:`SuperstepCheckpoint`)."""
    return df.localCheckpoint(eager=True)


class EphemeralStateStore:
    """Parquet-backed double-buffer for iterative state.

    ``localCheckpoint`` blocks accumulate across supersteps (the
    ContextCleaner only frees them on JVM GC of the RDD handle), which
    measured as a 2-4x superstep slowdown by iteration 10; carrying
    the logical plan instead (persist-only) blows up Catalyst
    re-analysis time. A parquet write+read per superstep gives a flat
    plan AND bounded storage: only the last two iterations exist on
    disk. This is the same I/O pattern the durable
    :class:`SuperstepCheckpoint` uses — on a cluster both land on
    object storage.
    """

    def __init__(self, spark: SparkSession, tag: str = "state"):
        import tempfile

        self.spark = spark
        self.dir = tempfile.mkdtemp(prefix=f"cminer_{tag}_")
        self._kept: list[str] = []

    def save(self, df: DataFrame, it: int) -> DataFrame:
        path = os.path.join(self.dir, f"iter={it}")
        df.write.mode("overwrite").parquet(path)
        # explicit schema: no per-superstep schema-inference job
        back = self.spark.read.schema(df.schema).parquet(path)
        self._kept.append(path)
        while len(self._kept) > 2:
            shutil.rmtree(self._kept.pop(0), ignore_errors=True)
        return back

    def close(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
