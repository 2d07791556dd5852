"""Tests for power-iteration top principal component + removal."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cminer_spark.pipeline.pca import power_iteration_top_pc, remove_top_pc


def _embs(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def test_recovers_planted_dominant_direction(spark):
    rng = np.random.default_rng(7)
    d = 8
    true_v = np.zeros(d)
    true_v[2] = 0.8
    true_v[5] = 0.6
    # strong rank-1 signal + small noise
    coef = rng.normal(size=(200, 1)) * 10.0
    mat = coef @ true_v[None, :] + rng.normal(size=(200, d)) * 0.01
    v, proj = power_iteration_top_pc(_embs(spark, mat), iters=8)
    v = np.array(v)
    assert abs(abs(v @ true_v) - 1.0) < 1e-3
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # projections match numpy's x·v
    got = {r["vec_id"]: r["proj"] for r in proj.collect()}
    for i in range(0, 200, 37):
        assert got[i] == pytest.approx(float(mat[i] @ v), abs=1e-5)


def test_matches_numpy_power_iteration_exactly(spark):
    """Same trajectory as a numpy float64 re-implementation."""
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 6))
    v_spark, _ = power_iteration_top_pc(_embs(spark, mat), iters=4)
    v = np.full(6, 1.0 / math.sqrt(6))
    for _ in range(4):
        u = mat.T @ (mat @ v)
        v = u / np.linalg.norm(u)
    assert np.allclose(np.array(v_spark), v, atol=1e-9)


def test_remove_top_pc_orthogonalizes(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(80, 5))
    embs = _embs(spark, mat)
    v, _ = power_iteration_top_pc(embs, iters=10)
    res = remove_top_pc(embs, v)
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in res.collect()}
    v = np.array(v)
    for i, r in rows.items():
        assert abs(r @ v) < 1e-9  # residual orthogonal to component
        assert np.allclose(r, mat[i] - (mat[i] @ v) * v, atol=1e-9)


def test_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        power_iteration_top_pc(empty)


def test_ragged_embeddings_raise(spark):
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        power_iteration_top_pc(ragged)
