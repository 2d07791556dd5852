"""Benchmark entrypoint — prints ONE JSON line.

Headline: PageRank to convergence over the transcript-derived edge
graph (the BASELINE.json north-star metric is edges-processed/sec per
PageRank superstep), plus the other north-rule algorithms and the
Arrow edge-extraction kernel, at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Two graphs are benched:
* the sf events-derived gate graph (same shape the correctness gate
  checks), and
* a larger deterministic synthetic transcripts graph (~12x sf events
  turns) that gives the 32-core run enough work to be shuffle-bound —
  this is the input the scaling run (tools/bench_scaling.py) uses at
  two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from cminer_spark import get_spark  # noqa: E402
from cminer_spark import gate  # noqa: E402
from cminer_spark.operators import (  # noqa: E402
    connected_components,
    extract_edges,
    label_propagation,
    pagerank,
    triangle_counts,
)
from cminer_spark.synth import synth_transcripts  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    # tiers: --fast (or BENCH_TIER=fast) runs only the headline
    # round-over-round comparison entries; --full (default) adds the
    # wider operator coverage. Both emit the same
    # BENCH/last_run.json-compatible JSON (absent entries simply have
    # no key), so a fast iteration loop stops coupling unrelated
    # numbers through host steal contamination (the r4 lpa4_events
    # artifact).
    argv_tier = next(
        (a.lstrip("-") for a in sys.argv[1:] if a.lstrip("-") in ("fast", "full")),
        None,
    )
    tier = argv_tier or os.environ.get("BENCH_TIER", "full").lower()
    full = tier != "fast"

    import __spark_entry__ as entrymod

    os.environ.setdefault("CMINER_DRIVER_MEM", "48g")
    spark = get_spark(
        "cminer-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            # pre-touched heap: heap growth otherwise dominates early
            # superstep timings (see BENCH/BASELINE.md)
            "spark.driver.extraJavaOptions": (
                f"-Xms{os.environ.get('BENCH_XMS', '16g')} -XX:+AlwaysPreTouch"
            ),
        },
    )
    entrymod._ship_package(spark)

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn, passes: int = 1):
        """Time fn; with passes > 1 record the BEST pass (the
        interference-free estimate — single passes of short queries on
        this host are steal-spike-prone, observed 3.4s vs 116s for the
        identical plan; see BENCH/BASELINE.md) plus the raw pass list."""
        out = None
        secs = []
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        for _ in range(passes):
            t0 = time.time()
            out = fn()
            secs.append(round(time.time() - t0, 3))
        queries[name] = min(secs)
        if passes > 1:
            extras[f"{name}_pass_secs"] = secs
        print(f"[bench] {name} {secs}", file=sys.stderr, flush=True)
        return out

    # -- events-derived gate graph ------------------------------------
    edges = gate.gate_edges_df(spark, sf_dir).persist()
    n_edges = edges.count()

    def run_pagerank():
        ranks, info = pagerank(edges, tol=1e-6, max_iter=60)
        ranks.count()
        return info

    info = timed("pagerank_events", run_pagerank)
    extras["pagerank_events_supersteps"] = info.iterations
    extras["pagerank_events_edges_per_sec_per_superstep"] = round(
        n_edges * info.iterations / queries["pagerank_events"], 1
    )

    timed("cc_events", lambda: connected_components(edges)[0].count(), passes=2)
    timed(
        "lpa4_events",
        lambda: label_propagation(edges, max_rounds=4, stop_when_stable=False)[
            0
        ].count(),
        passes=2,
    )
    timed(
        "triangles_events", lambda: triangle_counts(edges)[0].count(), passes=2
    )

    # ANF distance sketch: k=16 FM bitmasks, one bit_or shuffle per
    # hop — the whole-graph distance summary at link-graph scale
    from cminer_spark.operators.anf import anf_sketch

    if full:
        extras["anf_hops"] = timed(
            "anf_sketch_events",
            lambda: anf_sketch(edges, max_h=6, k=16, seed=42).count(),
        )

    # Luby MIS to convergence (r4): the symmetry-breaking superstep —
    # geometric frontier decay, so rounds ≈ O(log n)
    from cminer_spark.operators import maximal_independent_set

    def run_mis():
        st, minfo = maximal_independent_set(edges, max_rounds=30)
        st.count()
        return minfo

    if full:
        minfo = timed("mis_events", run_mis, passes=2)
        extras["mis_events_rounds"] = minfo.rounds

    # Jones-Plassmann-LDF coloring (r5): degree-first priorities make
    # hubs decide early, and the used-color gather is folded into the
    # winner join (one adjacency pass per round instead of two) — the
    # sf0.1 graph now COLORS TO CONVERGENCE inside the old 10-round
    # budget's wall-clock (r4: 59.1s for 10 rounds, 3444/83k left
    # uncolored; r5: full coloring in ~11 rounds), so the bench entry
    # is rounds-to-convergence, not a fixed cap.
    from cminer_spark.operators import greedy_coloring

    def run_color():
        st, cinfo = greedy_coloring(edges, max_rounds=40)
        ncolors = st.agg(F.countDistinct("color")).collect()[0][0]
        return cinfo, ncolors

    if full:
        (cinfo, n_colors) = timed("greedy_color_events", run_color, passes=1)
        extras["greedy_color_rounds"] = cinfo.rounds
        extras["greedy_color_converged"] = cinfo.converged
        extras["greedy_color_n_colors"] = n_colors
        extras["greedy_color_uncolored"] = (
            cinfo.uncolored[-1] if cinfo.uncolored else -1
        )

    # feature propagation (r4 wave 3): 2 damped rounds of dim-8
    # neighbor averaging in the exploded (v, pos, val) representation —
    # the per-round cost is one shuffle-hash join + one combinable avg
    from cminer_spark.operators import propagate_features, topk_out_edges

    feats = (
        edges.select(F.col("src").alias("v_id"))
        .union(edges.select(F.col("dst").alias("v_id")))
        .distinct()
        .select(
            "v_id",
            F.array(
                *[
                    ((F.col("v_id") % F.lit(7 + p)) + F.lit(1)).cast("double")
                    for p in range(8)
                ]
            ).alias("emb"),
        )
    )
    if full:
        timed(
            "feature_prop_events",
            lambda: propagate_features(edges, feats, rounds=2).count(),
            passes=2,
        )

    # top-k hub capping on the reversed graph (tool sinks -> sources)
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if full:
        timed(
            "topk_cap_events",
            lambda: topk_out_edges(rev, k=8, weight_col=None).count(),
            passes=2,
        )
    edges.unpersist()

    # -- synthetic transcripts graph (scaling-run input) ----------------
    n_convs = int(100_000 * sf * 10)  # sf0.1 → 100k convs ≈ 1.2M turns
    t = synth_transcripts(spark, n_convs=n_convs, seed=42).persist()
    t.count()  # materialize so edge_extract times the kernel, not synthesis

    # warm-up + best-of-3 timed passes: a single pass of this ~1-2s
    # kernel is steal-spike-prone (1.1s and 30.5s observed back to back
    # on identical input — BENCH/BASELINE.md round-3 A/B), which is
    # exactly what produced the spurious 15.0s in BENCH_r02.json. The
    # best pass is the interference-free estimate, the same protocol as
    # the scaling campaign's min-steady superstep. Each pass UNPERSISTS
    # before the next — keeping a persisted twin alive would let
    # Spark's CacheManager serve passes 2-3 from the plan cache
    # (identical canonicalized plans), timing a cache scan instead of
    # the kernel.
    extract_edges(t.limit(20000)).count()
    ex_passes: list[float] = []
    n_synth_edges = 0
    for _ in range(3):
        t0 = time.time()
        e = extract_edges(t).persist()
        n_synth_edges = e.count()
        ex_passes.append(round(time.time() - t0, 3))
        e.unpersist()
    queries["edge_extract_synth"] = min(ex_passes)
    synth_edges = extract_edges(t).persist()
    synth_edges.count()
    extras["edge_extract_synth_pass_secs"] = ex_passes
    extras["synth_edges"] = n_synth_edges
    extras["edge_extract_synth_edges_per_sec"] = round(
        n_synth_edges / queries["edge_extract_synth"], 1
    )

    # all-JVM SQL twin on the identical input (r4): quantifies the
    # Python-worker Arrow transfer cost per round (plan-isolation
    # analysis, BENCH/BASELINE.md)
    from cminer_spark.operators import extract_edges_sql

    if full:
        timed(
            "edge_extract_sql_synth",
            lambda: extract_edges_sql(t).count(),
            passes=3,
        )
        extras["edge_extract_sql_edges_per_sec"] = round(
            n_synth_edges / queries["edge_extract_sql_synth"], 1
        )

    def run_pagerank_synth():
        _ranks, info = pagerank(synth_edges, tol=0.0, max_iter=8)
        return info

    info2 = timed("pagerank8_synth", run_pagerank_synth)
    # Headline estimator: edges / MIN superstep — the scaling
    # campaign's interference-free estimator (hypervisor steal hits
    # individual supersteps 2-30x on this VM; BENCH/BASELINE.md). The
    # wall-clock-derived figure (r1/r2's estimator) is kept alongside
    # for cross-round comparability, with the per-superstep raws.
    extras["pagerank8_synth_superstep_secs"] = info2.superstep_secs
    extras["pagerank8_synth_edges_per_sec_per_superstep"] = round(
        n_synth_edges / min(info2.superstep_secs), 1
    )
    extras["pagerank8_synth_edges_per_sec_per_superstep_wallclock"] = round(
        n_synth_edges * info2.iterations / queries["pagerank8_synth"], 1
    )

    # incremental ingest path: 1/16 of conversations grew since the
    # previous snapshot — delta re-extraction + incremental CC +
    # warm-start PageRank, vs their full-recompute twins above
    from cminer_spark.operators import (
        extract_edges_delta,
        incremental_components,
    )

    conv_h = F.pmod(F.xxhash64("conv_id"), F.lit(16))
    prev_t = t.where((conv_h != 0) | (F.col("turn_idx") < 3))
    prev_edges_inc = extract_edges(prev_t).persist()
    prev_edges_inc.count()
    changed = t.where(conv_h == 0).select("conv_id").distinct()
    timed(
        "edge_extract_delta_synth",
        lambda: extract_edges_delta(t, prev_edges_inc, changed).count(),
        passes=2,
    )
    prev_cc, _ = connected_components(
        prev_edges_inc.select("src", "dst")
    )
    prev_cc = prev_cc.persist()
    prev_cc.count()
    delta_e = (
        synth_edges.join(F.broadcast(changed), F.get(
            F.split("src_key", "#", 2), 0
        ) == changed["conv_id"]).select("src", "dst").persist()
    )
    delta_e.count()
    timed(
        "cc_incremental_synth",
        lambda: incremental_components(prev_cc, delta_e)[0].count(),
        passes=2,
    )
    if full:
        timed(
            "cc_full_synth",
            lambda: connected_components(synth_edges.select("src", "dst"))[
                0
            ].count(),
        )
    prev_edges_inc.unpersist()
    prev_cc.unpersist()
    delta_e.unpersist()

    # degree-capped Jaccard on the hub-heavy synth graph: the wedge
    # count stays bounded even though hub tools carry ~50% of invokes
    # (uncapped, one hub of degree d materializes d^2 wedge rows)
    from cminer_spark.operators.graph import jaccard_similarity

    extras["jaccard_capped_pairs"] = timed(
        "jaccard_capped_synth",
        lambda: jaccard_similarity(synth_edges, max_pivot_degree=64).count(),
        passes=2,
    )
    synth_edges.unpersist()

    # frequent-subgraph mining on a deterministic ~150-graph
    # transactional DB (the reference's OntoUML-db scale): one driver
    # action per (pattern, level) — the round-1 job-storm regression
    # stays visible as wall-clock here
    def run_mine():
        import random

        from cminer_spark.operators.mining import mine_frequent_patterns
        from cminer_spark.sources import read_data_db

        rng = random.Random(7)
        blocks = []
        labels = ["a", "b", "c", "d"]
        for g in range(150):
            blocks.append(f"t # {g} g{g}")
            n = rng.randint(8, 14)
            for i in range(n):
                blocks.append(f"v {i} {rng.choice(labels)}")
            for _ in range(rng.randint(10, 18)):
                s, d = rng.randrange(n), rng.randrange(n)
                if s != d:
                    blocks.append(f"e {s} {d} {rng.choice('xy')}")
        path = "/tmp/cminer_bench_db.data"
        with open(path, "w") as f:
            f.write("\n".join(blocks) + "\n")
        v, e = read_data_db(spark, path)
        mined = mine_frequent_patterns(
            v, e, min_support=0.3, max_edges=2, max_nodes=3
        )
        return len(mined)

    extras["mine_150graphs_patterns"] = timed("mine_150graph_db", run_mine)

    # -- training-pipeline ops at throughput scale ----------------------
    # the driver's documents/embeddings parquet tables are fixed-size
    # (5k/2k rows — fixed-cost, not throughput), so dedup runs over the
    # ~1.2M synthetic turn texts and ANN over a derived 200k-vector
    # table; both are pure JVM-expression paths.
    from cminer_spark.pipeline import (
        ivf_topk,
        minhash_lsh_candidates,
        pseudo_random_centroids,
    )

    # the whole training-pipeline section is full-tier only
    if full:
        docs = t.select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
        )
        extras["minhash_docs"] = t.count()
        extras["minhash_candidate_pairs"] = timed(
            "minhash_lsh_turns",
            lambda: minhash_lsh_candidates(
                docs, num_hashes=16, bands=4, hash_family="xxhash64"
            ).count(),
            passes=2,
        )

        # PII redaction over the same ~1.2M turn texts: pure regex
        # expressions, shuffle-free — measures scan+codegen throughput
        from cminer_spark.pipeline import redact_pii

        # aggregate over the output columns so Catalyst cannot prune the
        # regex work away (a bare count() would)
        extras["redact_chars"] = timed(
            "redact_pii_turns",
            lambda: int(
                redact_pii(docs)
                .agg(
                    F.sum(
                        F.length("text_redacted") + F.col("n_pii")
                    ).alias("s")
                )
                .collect()[0]["s"]
            ),
            passes=2,
        )

        # line-level dedup over conversation documents (r4): conversation =
        # doc, turn = line — removes turns repeated verbatim across >= 2
        # conversations and reassembles; explode + two hash-aggregates +
        # one anti-join over ~1.2M lines
        from cminer_spark.pipeline import line_dedup

        # each conversation gets one of 5 boilerplate header lines (the
        # cross-doc duplication line_dedup exists to remove — synth turn
        # texts themselves are hash-unique across conversations)
        headers = F.array(
            *[F.lit(f"standard greeting header variant {i}") for i in range(5)]
        )
        conv_docs = (
            t.select(
                F.col("conv_id"),
                F.struct(F.col("turn_idx"), F.col("text")).alias("s"),
            )
            .groupBy("conv_id")
            .agg(
                F.concat_ws(
                    "\n",
                    F.element_at(
                        headers,
                        F.pmod(F.xxhash64("conv_id"), F.lit(5)).cast("int") + 1,
                    ),
                    F.concat_ws(
                        "\n", F.transform(F.sort_array(F.collect_list("s")),
                                          lambda x: x["text"])
                    ),
                ).alias("text")
            )
            .withColumn("doc_id", F.xxhash64("conv_id"))
            .persist()
        )
        conv_docs.count()
        extras["line_dedup_removed"] = timed(
            "line_dedup_convs",
            lambda: int(
                line_dedup(conv_docs)
                .agg(F.sum(F.col("n_lines") - F.col("n_lines_kept")).alias("r"))
                .collect()[0]["r"]
            ),
            passes=2,
        )
        conv_docs.unpersist()

        # cross-corpus incremental dedup (r4): 1/5 of the turn docs play
        # the daily delta against the other 4/5 — banded equi-join +
        # candidate-only verification, delta side broadcast
        from cminer_spark.pipeline import dedup_against

        extras["dedup_against_kept"] = timed(
            "dedup_against_turns",
            lambda: dedup_against(
                docs.where(F.col("doc_id") % 5 != 0),
                docs.where(F.col("doc_id") % 5 == 0),
                num_hashes=16,
                bands=4,
                hash_family="xxhash64",
                broadcast_delta=True,
            ).count(),
            passes=2,
        )

        # NB classification (r4): train-on-self over the ~1.2M turn texts
        # with role labels — two combinable training aggregates + broadcast
        # model scoring + one doc-keyed aggregate
        from cminer_spark.pipeline import classify_corpus

        nb_docs = t.select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text",
            F.coalesce("role", F.lit("none")).alias("role"),
        )
        extras["nb_classified_rows"] = timed(
            "nb_classify_turns",
            lambda: classify_corpus(nb_docs, label_col="role").count(),
            passes=2,
        )

        # DSIR importance weights (r5): hashed unigram+bigram
        # log-likelihood ratio of every turn text against the
        # assistant-turn slice as the target distribution — two bucket
        # histograms + one broadcast model join + one doc-keyed sum
        from cminer_spark.pipeline import importance_weights

        extras["dsir_scored_rows"] = timed(
            "importance_weights_turns",
            lambda: importance_weights(
                docs,
                nb_docs.where(F.col("role") == "assistant").select(
                    "doc_id", "text"
                ),
                n_buckets=65536,
            ).count(),
            passes=2,
        )

        # BPE tokenizer training (r5): 8 merges over the ~1.2M turn
        # texts — the corpus reduces once to the word table, then every
        # merge round is one vocab-sized pair aggregate + a 1-row
        # driver decision + a map-only fold re-segmentation
        from cminer_spark.pipeline import train_bpe

        def _bpe():
            merges, _ = train_bpe(docs, n_merges=8)
            return merges.count()

        extras["bpe_merges_trained"] = timed(
            "bpe_train8_turns", _bpe, passes=2
        )

        n_vecs = int(200_000 * sf * 10)
        vecs = spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000))
                        / 500.0
                        - 1.0
                    ).cast("float")
                    for d in range(32)
                ]
            ).alias("embedding"),
        )
        extras["ivf_vectors"] = n_vecs
        extras["ivf_topk_rows"] = timed(
            "ivf_ann_200k",
            lambda: ivf_topk(
                vecs,
                [0, 1, 2, 3, 4],
                k=10,
                centroids=pseudo_random_centroids(32, 16),
                n_probe=2,
            ).count(),
            passes=2,
        )
    t.unpersist()

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "pagerank_edges_per_sec_per_superstep",
        "value": extras["pagerank8_synth_edges_per_sec_per_superstep"],
        "unit": "edges/sec",
        "queries": queries,
        "sf": sf,
        "total_sec": total,
        "cpus": cpus,
        "tier": tier,
        **extras,
    }
    spark.stop()

    # Persist AND print the core record BEFORE the ~15-min scaling
    # pair: if the caller kills this process mid-pair, the query
    # numbers survive both on disk and as a complete stdout JSON line
    # (the driver parses the last complete line in its ~4 KB stdout
    # tail, so the merged line printed after the pair supersedes this
    # one when the run finishes).
    _write_record(result)
    scaling_on = os.environ.get("BENCH_SCALING", "1") != "0"
    if scaling_on:
        _print_line(result)

    # -- north-rule scaling pair (opt-out: BENCH_SCALING=0) -------------
    # one interleaved local[4] → local[16] PageRank pair on the 66M-edge
    # campaign input, fresh JVM per side (tools/bench_scaling.py
    # protocol) — every BENCH_rN.json carries an efficiency spot check
    # against the BENCH/BASELINE.md 5-pair campaign without a hand run.
    if scaling_on:
        scaling = _scaling_pair()
        if scaling:
            result.update(scaling)

    _write_record(result)
    _print_line(result)


def _write_record(result: dict) -> str:
    line = json.dumps(result)
    try:
        os.makedirs(os.path.join(_HERE, "BENCH"), exist_ok=True)
        with open(os.path.join(_HERE, "BENCH", "last_run.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    return line


def _print_line(result: dict) -> None:
    # the driver captures only the stdout TAIL (~4 KB), which clipped
    # the r3 JSON mid-line — the full record lives on disk, and the
    # printed line stays under the capture window by dropping the
    # verbose per-pass lists when it would not fit.
    line = json.dumps(result)
    if len(line) > 3800:
        compact = {
            k: v
            for k, v in result.items()
            if not (
                k.endswith("_pass_secs")
                or k.endswith("_superstep_secs")
                or k == "scaling_pair"
            )
        }
        compact["full_record"] = "BENCH/last_run.json"
        line = json.dumps(compact)
    print(line, flush=True)


def _scaling_pair() -> dict | None:
    """One (local[4], local[16]) PageRank pair on the CAMPAIGN-size
    input. The full 66M-edge graph is required for comparability: the
    ~2-3s serial per-superstep cost (driver, barriers, state write)
    makes smaller graphs understate efficiency via Amdahl (a 33M-edge
    pair measured ~0.66 on code whose 66M-edge r3 campaign median was
    0.892; the r5 campaign median is 0.915). Input parquet is
    materialized once and cached in /tmp across rounds."""
    import subprocess

    tool = os.path.join(_HERE, "tools", "bench_scaling.py")
    env = dict(
        os.environ,
        # 12 supersteps, not 8: the min-steady estimator takes the MIN
        # of the last half, and 4 samples is too few under hypervisor
        # steal — the one 8-iter spot pair read 0.745 while every
        # 12-iter campaign pair on the same code sat at 0.78-1.07
        SCALING_ITERS=os.environ.get("BENCH_SCALING_ITERS", "12"),
        SCALING_BASE_CORES="4",
    )

    def run(args: list[str]) -> dict | None:
        try:
            out = subprocess.run(
                [sys.executable, tool, *args],
                capture_output=True, text=True, env=env, cwd=_HERE,
                # a local[4] campaign run is ~12 min healthy; a hung
                # JVM must not stall the bench past the core record
                timeout=int(os.environ.get("BENCH_SCALING_TIMEOUT", "2400")),
            )
        except subprocess.TimeoutExpired:
            print(f"scaling run {args} timed out", file=sys.stderr)
            return None
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            return None
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        return json.loads(lines[-1]) if lines else {}

    if run(["--materialize"]) is None:
        return None
    lo = run(["--run-one", "4"])
    hi = run(["--run-one", "16"])
    if not lo or not hi:
        return None
    eff = hi["edges_per_sec_per_superstep"] / (
        4 * lo["edges_per_sec_per_superstep"]
    )
    return {
        "scaling_efficiency": round(eff, 3),
        "scaling_pair": {"cores": [4, 16], "lo": lo, "hi": hi},
        "scaling_note": (
            "single interleaved pair, min-steady-superstep estimator; "
            "authoritative 5-pair campaign median 0.915 in BENCH/BASELINE.md"
        ),
    }


if __name__ == "__main__":
    main()
