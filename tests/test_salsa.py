"""SALSA parity vs a numpy twin of the same degree-normalized
iteration + structural checks distinguishing it from raw HITS."""

from __future__ import annotations

import random

import numpy as np

from cminer_spark.operators import salsa

from tests.conftest import edges_df


def _salsa_numpy(pairs, k, weights=None):
    """Fixed-k reference: L1-normalized half-steps over the
    out-/in-degree-normalized adjacency."""
    ws = weights or [1.0] * len(pairs)
    verts = sorted({v for p in pairs for v in p[:2]})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for (a, b), w in zip(pairs, ws):
        W[idx[a], idx[b]] += w
    ow = W.sum(axis=1)
    iw = W.sum(axis=0)
    fwd = np.divide(W, ow[:, None], out=np.zeros_like(W), where=ow[:, None] > 0)
    bwd = np.divide(W, iw[None, :], out=np.zeros_like(W), where=iw[None, :] > 0)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(k):
        a = fwd.T @ h
        a /= a.sum()
        h = bwd @ a
        h /= h.sum()
    return {v: (h[idx[v]], a[idx[v]]) for v in verts}


def test_matches_numpy_fixed_k(spark):
    rng = random.Random(13)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    df = edges_df(spark, pairs)
    scores, _ = salsa(df, tol=0.0, max_iter=5)
    got = {r.v_id: (r.hub, r.auth) for r in scores.collect()}
    want = _salsa_numpy(pairs, 5)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v][0] - want[v][0]) < 1e-9, v
        assert abs(got[v][1] - want[v][1]) < 1e-9, v


def test_weighted_matches_numpy(spark):
    rng = random.Random(5)
    pairs = [
        (rng.randrange(15), rng.randrange(15), float(rng.randrange(1, 5)))
        for _ in range(40)
    ]
    df = edges_df(spark, pairs)
    scores, _ = salsa(df, tol=0.0, max_iter=4)
    got = {r.v_id: (r.hub, r.auth) for r in scores.collect()}
    want = _salsa_numpy([(a, b) for a, b, _ in pairs], 4, [w for _, _, w in pairs])
    for v in want:
        assert abs(got[v][0] - want[v][0]) < 1e-9, v
        assert abs(got[v][1] - want[v][1]) < 1e-9, v


def test_degree_normalization_beats_volume_spam(spark):
    """One mega-hub conversation pointing at tool A many times in
    parallel cannot out-rank tool B invoked once each by many distinct
    conversations — the property raw HITS lacks."""
    from cminer_spark.operators import hits

    # hub 100 invokes tool 0 ten times (parallel edges);
    # conversations 1..9 each invoke tool 1 once
    pairs = [(100, 0)] * 10 + [(i, 1) for i in range(1, 10)]
    df = edges_df(spark, pairs)
    s, _ = salsa(df, tol=1e-12, max_iter=200)
    ss = {r.v_id: r.auth for r in s.collect()}
    h, _ = hits(df, tol=1e-12, max_iter=200)
    hh = {r.v_id: r.auth for r in h.collect()}
    assert ss[1] > ss[0]  # SALSA: breadth wins
    assert hh[0] > hh[1]  # HITS: volume wins (the contrast)


def test_complete_bipartite_is_uniform(spark):
    pairs = [(a, b + 10) for a in range(4) for b in range(3)]
    scores, info = salsa(edges_df(spark, pairs), tol=1e-12, max_iter=100)
    got = {r.v_id: (r.hub, r.auth) for r in scores.collect()}
    assert info.converged
    for a in range(4):
        assert abs(got[a][0] - 0.25) < 1e-9
    for b in range(10, 13):
        assert abs(got[b][1] - 1.0 / 3) < 1e-9


def test_score_sums_are_one(spark):
    rng = random.Random(3)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(50)]
    scores, _ = salsa(edges_df(spark, pairs), tol=1e-10, max_iter=100)
    rows = scores.collect()
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.auth for r in rows) - 1.0) < 1e-9
