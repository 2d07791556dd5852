"""Spherical k-means (pipeline/similarity.kmeans): planted-cluster
recovery, determinism, explicit-init validation, zero-vector rule."""

from __future__ import annotations

import math

import pytest

from cminer_spark.pipeline.similarity import ivf_train_centroids, kmeans


def _planted(spark, per_cluster=20, dim=8, k=3, noise=0.05):
    """k well-separated unit directions + small deterministic noise;
    vec_id // per_cluster is the true cluster."""
    rows = []
    for c in range(k):
        base = [0.0] * dim
        base[c] = 1.0
        base[(c + 3) % dim] = 0.5
        for j in range(per_cluster):
            v = [
                b + noise * math.sin(1 + c * 31 + j * 7 + i)
                for i, b in enumerate(base)
            ]
            rows.append((c * per_cluster + j, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_clusters_recovered(spark):
    df = _planted(spark)
    out = kmeans(df, k=3, n_iters=4, init_ids=[0, 20, 40], round_to=6)
    got = {r.vec_id: r.cluster for r in out.collect()}
    for vid, cl in got.items():
        assert cl == vid // 20, (vid, cl)


def test_deterministic_across_runs(spark):
    df = _planted(spark)
    a = sorted(map(tuple, kmeans(df, k=3, n_iters=3).collect()))
    b = sorted(map(tuple, kmeans(df, k=3, n_iters=3).collect()))
    assert a == b


def test_missing_init_id_raises(spark):
    df = _planted(spark)
    with pytest.raises(ValueError, match="init_ids"):
        ivf_train_centroids(df, n_centroids=2, init_ids=[0, 10_000])


def test_zero_vector_gets_sentinel(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: (r.cluster, r.cosine) for r in
           kmeans(df, k=2, n_iters=1, init_ids=[0, 1]).collect()}
    assert out[2] == (-1, 0.0)
    assert out[0][0] in (0, 1) and out[1][0] in (0, 1)
    assert out[0][0] != out[1][0]


def test_cosine_is_similarity_to_winner(spark):
    df = _planted(spark, per_cluster=5, k=2)
    out = kmeans(df, k=2, n_iters=2, init_ids=[0, 5], round_to=6)
    for r in out.collect():
        assert -1.0 <= r.cosine <= 1.0 + 1e-9
        assert r.cosine > 0.5  # members are near their centroid
