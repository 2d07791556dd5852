"""spark-submit entry point.

    spark-submit --py-files cminer_spark.zip -m cminer_spark \
        --transcripts iceberg:warehouse.conv.transcripts \
        --algorithm pagerank --tol 1e-6 --max-iter 100 \
        --checkpoint-dir s3://bucket/ck/run1 --output parquet:/out/ranks

Runs: transcripts → Arrow edge extraction → the chosen north-rule
algorithm with durable per-superstep checkpointing → output table.
Re-running with the same ``--checkpoint-dir`` resumes from the last
committed superstep (exact resume, tested).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cminer_spark")
    ap.add_argument("--transcripts", help="transcripts table ref (iceberg:/table:/parquet:)")
    ap.add_argument("--edges", help="pre-extracted edges table ref (skips extraction)")
    ap.add_argument(
        "--algorithm",
        choices=["pagerank", "components", "lpa", "triangles"],
        default="pagerank",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--lpa-rounds", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from cminer_spark import get_spark
    from cminer_spark.operators import (
        connected_components,
        extract_edges,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from cminer_spark.plans import SuperstepCheckpoint
    from cminer_spark.sources.tables import read_table, write_table

    spark = get_spark("cminer-run", master=args.master)
    if args.edges:
        edges = read_table(spark, args.edges)
    elif args.transcripts:
        edges = extract_edges(read_table(spark, args.transcripts))
    else:
        ap.error("need --transcripts or --edges")

    ck = (
        SuperstepCheckpoint(spark, args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )
    meta: dict = {"algorithm": args.algorithm}
    if args.algorithm == "pagerank":
        out, info = pagerank(
            edges,
            damping=args.damping,
            tol=args.tol,
            max_iter=args.max_iter,
            checkpoint=ck,
        )
        meta.update(
            iterations=info.iterations,
            converged=info.converged,
            n_vertices=info.n_vertices,
            n_edges=info.n_edges,
            salted=info.salted,
        )
    elif args.algorithm == "components":
        out, cinfo = connected_components(edges, checkpoint=ck)
        meta.update(rounds=cinfo.rounds, n_components=cinfo.n_components)
    elif args.algorithm == "lpa":
        out, linfo = label_propagation(
            edges, max_rounds=args.lpa_rounds, checkpoint=ck
        )
        meta.update(rounds=linfo.rounds, converged=linfo.converged)
    else:
        out, total = triangle_counts(edges)
        meta.update(total_triangles=total)

    write_table(out, args.output)
    print(json.dumps(meta))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
