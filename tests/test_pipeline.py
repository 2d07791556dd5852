"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cminer_spark.pipeline import (
    brute_force_cosine_topk,
    cosine_near_duplicates,
    exact_duplicates,
    lsh_bucketed_topk,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from cminer_spark.pipeline.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # inject known exact + near duplicates
    d0 = base.where(F.col("doc_id") == 0).select("doc_id", "text")
    dup = d0.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    near = d0.select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tweak")).alias("text"),
    )
    return base.select("doc_id", "text").union(dup).union(near).persist()


def test_exact_dedup_finds_injected_duplicate(spark, docs):
    groups = exact_duplicates(docs)
    dupes = groups.where(F.col("n_copies") > 1).collect()
    assert len(dupes) == 1
    assert dupes[0].canonical_id == 0
    assert dupes[0].doc_ids == [0, 10_000]


def test_ngram_jaccard_finds_near_duplicate(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 10_000) in got  # exact dup → jaccard 1.0
    assert (0, 20_000) in got  # near dup


def test_minhash_lsh_catches_what_jaccard_catches(spark, docs):
    strong = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    cands = {(r.a, r.b) for r in minhash_lsh_candidates(docs).collect()}
    # LSH with 4 bands of 4 rows catches ~all pairs at jaccard≥0.9
    assert strong <= cands


def test_minhash_xxhash64_family_parity(spark, docs):
    """The xxhash64 throughput family must catch the same planted
    near-duplicate candidates as the md5 (oracle-portable) family —
    both are uniform hash families over the same shingle sets."""
    md5_pairs = {
        (r.a, r.b)
        for r in minhash_lsh_candidates(docs, hash_family="md5").collect()
    }
    xx_pairs = {
        (r.a, r.b)
        for r in minhash_lsh_candidates(docs, hash_family="xxhash64").collect()
    }
    # planted pairs (exact dup always shares all bands; near-dup with
    # high shingle overlap shares ≥1 band in either family)
    assert (0, 10_000) in md5_pairs and (0, 10_000) in xx_pairs
    assert (0, 20_000) in md5_pairs and (0, 20_000) in xx_pairs


def test_simhash_near_dup_small_hamming(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sh[0] == sh[10_000]  # identical text → identical simhash
    ham_near = bin(sh[0] ^ sh[20_000]).count("1")
    other = docs.where(~F.col("doc_id").isin([0, 10_000, 20_000])).first().doc_id
    ham_far = bin(sh[0] ^ sh[other]).count("1")
    assert ham_near < ham_far


def test_simhash_near_dups_banding_equals_brute_force(spark, docs):
    """Pigeonhole banding must be LOSSLESS at the stated radius: the
    banded pair set equals the all-pairs Hamming-ball ground truth
    (recall exactly 1, no hallucinated pairs), for both an even and a
    non-divisible bits/(d+1) block split."""
    from cminer_spark.pipeline.dedup import simhash_near_dups

    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    for d in (0, 2, 5):  # 48/1, 48/3 even; 48/6 = 8 exact too; use 5→ 6 blocks of 8
        want = {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for a in sh
            for b in sh
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= d
        }
        got = {
            (r.a, r.b, r.hamming)
            for r in simhash_near_dups(docs, max_hamming=d).collect()
        }
        assert got == want, d
    # planted exact duplicate is hamming 0
    got0 = {
        (r.a, r.b)
        for r in simhash_near_dups(docs, max_hamming=0).collect()
    }
    assert (0, 10_000) in got0


def test_simhash_near_dups_uneven_blocks(spark, docs):
    """bits=48, d=4 → 5 blocks of widths 10/10/10/9/9 — the remainder
    distribution must still cover all 48 bits losslessly."""
    from cminer_spark.pipeline.dedup import simhash_near_dups

    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    want = {
        (a, b)
        for a in sh
        for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= 4
    }
    got = {
        (r.a, r.b)
        for r in simhash_near_dups(docs, max_hamming=4).collect()
    }
    assert got == want


def test_lsh_ann_recall_vs_brute_force(spark):
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = brute_force_cosine_topk(embs, qids, k=5)
    approx = lsh_bucketed_topk(embs, qids, k=5, n_planes=4, n_tables=16)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # multi-table OR-amplification: 16 tables of 4 planes
    assert recall >= 0.8
    # buckets must at least contain each query's own-bucket matches
    assert all(r.cosine <= 1.000001 for r in approx.collect())


def test_ivf_full_probe_equals_brute_force(spark):
    """n_probe == n_centroids means every cluster is probed, so IVF
    must reproduce the exact brute-force top-k (same rounding, same
    tie-breaks) — the correctness anchor for the quantize/probe/re-rank
    pipeline."""
    from cminer_spark.pipeline import ivf_topk, pseudo_random_centroids

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = brute_force_cosine_topk(embs, qids, k=5)
    full = ivf_topk(
        embs, qids, k=5,
        centroids=pseudo_random_centroids(64, 8), n_probe=8,
    )
    key = lambda df: sorted(
        (r.query_id, r.rank, r.vec_id, r.cosine) for r in df.collect()
    )
    assert key(full) == key(exact)


def test_ivf_trained_recall_on_planted_neighbors(spark):
    """Trained spherical k-means + partial probe must route planted
    near-neighbors (scaled copies — cosine 1 with their query, and
    scaling preserves the argmax cluster assignment) through the
    cluster equi-join. The raw synth embeddings are near-random (max
    pairwise cosine ~0.5), so unplanted neighbors legitimately straddle
    clusters — recall is measured on a fixture with known structure,
    like the dedup tests. Also checks the trainer is deterministic."""
    from cminer_spark.pipeline import ivf_topk, ivf_train_centroids

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2]
    parts = [embs]
    for j in range(1, 5):
        parts.append(
            embs.where(F.col("vec_id").isin(qids)).select(
                (F.col("vec_id") + 100_000 * j).alias("vec_id"),
                F.transform("embedding", lambda x: x * (1.0 - 0.01 * j))
                .cast("array<float>")
                .alias("embedding"),
                "label",
            )
        )
    data = parts[0]
    for p in parts[1:]:
        data = data.union(p)
    data = data.persist()
    cents = ivf_train_centroids(data, n_centroids=8, n_iters=4)
    cents2 = ivf_train_centroids(data, n_centroids=8, n_iters=4)
    assert cents == cents2  # deterministic: no RNG state anywhere
    exact = brute_force_cosine_topk(data, qids, k=5)
    approx = ivf_topk(data, qids, k=5, centroids=cents, n_probe=3)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    data.unpersist()
    assert recall >= 0.8, f"IVF recall {recall}"


def test_cosine_near_duplicates_self_consistency(spark):
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    # duplicate vec 0 under a new id → must be flagged at ~1.0
    dup = embs.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    pairs = cosine_near_duplicates(embs.union(dup), threshold=0.999)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 10_000) in got


def test_cosine_near_dup_mega_bucket_capped_and_reported(spark):
    """A planted mega-bucket (thousands of identical vectors → one LSH
    bucket) is DROPPED from the self-join at max_bucket_size and shows
    up in the embedding_overflow_buckets audit — the dedup.py
    _cap_buckets design ported to the embedding path (r5 verdict #2)."""
    from cminer_spark.pipeline.similarity import embedding_overflow_buckets

    n_mega = 500
    mega = spark.range(n_mega).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0) for _ in range(4)]).alias("embedding"),
    )
    # two distinct near-identical honest vectors, far from the mega
    # direction, that must still pair up
    honest = spark.createDataFrame(
        [
            (100_000, [1.0, -1.0, 1.0, -1.0]),
            (100_001, [1.0, -1.0, 1.0, -0.999]),
        ],
        "vec_id long, embedding array<double>",
    )
    embs = mega.union(honest)
    kw = dict(threshold=0.99, dim=4, n_planes=3)
    capped = cosine_near_duplicates(embs, max_bucket_size=100, **kw)
    got = {(r.a, r.b) for r in capped.collect()}
    assert (100_000, 100_001) in got  # honest pair survives the cap
    assert not any(a < n_mega and b < n_mega for a, b in got), (
        "mega-bucket pairs must be dropped at the cap"
    )
    # uncapped: the mega bucket would contribute O(n²) pairs
    uncapped = cosine_near_duplicates(embs, max_bucket_size=None, **kw)
    assert uncapped.count() >= n_mega * (n_mega - 1) // 2
    # audit seam reports exactly the dropped bucket
    report = embedding_overflow_buckets(
        embs, max_bucket_size=100, dim=4, n_planes=3
    ).collect()
    assert len(report) == 1 and report[0].n_vecs >= n_mega


def test_multimodal_feature_extraction(spark):
    media = synth_media(spark, n=60)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-6
    # determinism across partitioning
    again = {
        r.media_id: tuple(r.feature)
        for r in extract_features(media, fake=True, partitions=7).collect()
    }
    assert {r.media_id: tuple(r.feature) for r in rows} == again


def test_multimodal_real_decode_is_stubbed(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, fake=False).collect()


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert all(r.sample_ms % 500 == 0 for r in rows)
    kinds = synth_media(spark, n=9).where(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == kinds


def test_cosine_near_duplicates_recall_quantified(spark):
    """Quantified recall of the LSH-bucketed near-dup pass vs the exact
    threshold pairs: plant perturbed copies (cos > 0.97) and require
    >= 0.9 recall at n_planes=4 (single-table; more planes trade recall
    for candidate volume)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a strongly-perturbed near-duplicate of each vector
        nd = v + rng.normal(scale=0.08, size=64)
        rows.append((1000 + i, [float(x) for x in nd]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # exact reference via brute force in numpy
    import itertools

    vecs = {i: np.array(v) for i, v in rows}
    want = set()
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        if cos >= 0.97:
            want.add((a, b))
    assert len(want) >= 30  # the planted pairs are present

    got = {
        (r.a, r.b)
        for r in cosine_near_duplicates(embs, threshold=0.97, n_planes=4).collect()
    }
    assert got <= want  # no false positives (exact re-check inside)
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"recall {recall:.2f}"


def test_embedding_dedup_clusters_transitive(spark):
    """Planted chains a~b~c (each consecutive pair above threshold)
    must land in ONE cluster rooted at the minimum id; unrelated
    vectors stay singleton canonicals."""
    import numpy as np

    from cminer_spark.pipeline.similarity import embedding_dedup_clusters

    rng = np.random.default_rng(11)
    rows = []
    for g in range(5):
        v = rng.normal(size=64)
        # chain: id g*10, g*10+1, g*10+2 — consecutive cosines ~0.99
        for j in range(3):
            vv = v + rng.normal(scale=0.05, size=64) * j
            rows.append((g * 10 + j, [float(x) for x in vv]))
    for s in range(5):  # singletons
        rows.append((900 + s, [float(x) for x in rng.normal(size=64)]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = {
        r.vec_id: (r.cluster_id, r.is_canonical)
        for r in embedding_dedup_clusters(
            embs, threshold=0.97, n_planes=2, cc_rounds=4
        ).collect()
    }
    assert len(out) == len(rows)  # every vector clustered
    for g in range(5):
        root = g * 10
        assert out[root] == (root, True)
        for j in (1, 2):
            got_cluster, got_canon = out[root + j]
            assert got_cluster == root and not got_canon
    for s in range(5):
        assert out[900 + s] == (900 + s, True)
