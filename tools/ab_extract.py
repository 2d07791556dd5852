"""A/B the edge-extraction kernels at UNPINNED local[32] — the exact
bench.py context in which BENCH_r02.json recorded `edge_extract_synth`
at 15.0s vs BENCH_r01.json's 4.6s on the identical input (the round-2
judge's top open item).

Protocol (repo steal protocol, BENCH/BASELINE.md): interleaved
(arrow, pandas) run PAIRS in fresh JVMs, warm-up extract before
timing, 3 timed passes per run, report every pass + the best. The
input reproduces bench.py exactly: deterministic synth transcripts
(seed 42, n_convs = sf × 1e6), synthesized and persisted in-session
before timing, so the timed region is the kernel + hash/key codegen +
persist/count, nothing else.

Usage:
  python tools/ab_extract.py                # orchestrate 3 pairs, print JSON
  python tools/ab_extract.py --run-one arrow|pandas  # single JVM run
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("AB_CPUS", "32"))
N_CONVS = int(os.environ.get("AB_CONVS", "100000"))  # bench.py sf0.1
PAIRS = int(os.environ.get("AB_PAIRS", "3"))
PASSES = int(os.environ.get("AB_PASSES", "3"))


def run_one(kind: str) -> None:
    from cminer_spark import get_spark
    from cminer_spark.operators import extract_edges
    from cminer_spark.synth import synth_transcripts

    os.environ.setdefault("CMINER_DRIVER_MEM", "48g")
    spark = get_spark(
        "ab-extract",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-Xms{os.environ.get('BENCH_XMS', '16g')} -XX:+AlwaysPreTouch"
            ),
        },
    )
    use_arrow = kind == "arrow"
    t = synth_transcripts(spark, n_convs=N_CONVS, seed=42).persist()
    t.count()
    # warm the Python workers (bench.py's earlier gate queries do this)
    extract_edges(t.limit(20000), use_arrow=use_arrow).count()

    secs = []
    n = 0
    for _ in range(PASSES):
        t0 = time.time()
        e = extract_edges(t, use_arrow=use_arrow).persist()
        n = e.count()
        secs.append(round(time.time() - t0, 3))
        e.unpersist()
    print(
        json.dumps(
            {
                "kind": kind,
                "cpus": CPUS,
                "edges": n,
                "pass_secs": secs,
                "best_sec": min(secs),
                "edges_per_sec_best": round(n / min(secs), 1),
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    def spawn(kind: str) -> dict:
        out = subprocess.run(
            [sys.executable, __file__, "--run-one", kind],
            capture_output=True, text=True, check=True, cwd=str(REPO),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        print(line, flush=True)
        return json.loads(line)

    pairs = []
    for i in range(PAIRS):
        a = spawn("arrow")
        p = spawn("pandas")
        pairs.append({"pair": i, "arrow": a, "pandas": p})
    best_a = [p["arrow"]["best_sec"] for p in pairs]
    best_p = [p["pandas"]["best_sec"] for p in pairs]
    print(
        json.dumps(
            {
                "pairs": pairs,
                "arrow_best_median": statistics.median(best_a),
                "pandas_best_median": statistics.median(best_p),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--run-one":
        run_one(sys.argv[2])
    else:
        orchestrate()
