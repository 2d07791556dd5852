"""Fixed-fanout neighborhood sampling (GraphSAGE front-end)."""

from __future__ import annotations

import hashlib
import random

import pytest

from cminer_spark.operators.sampling import sample_neighborhoods

from tests.conftest import edges_df


def _seeds_df(spark, seeds):
    return spark.createDataFrame(
        [(int(s), int(s)) for s in seeds], "seed_id long, v_id long"
    )


def _replay(pairs, seeds, fanouts, seed=0, directed=False):
    adj: dict[int, set[int]] = {}
    for p in pairs:
        u, v = p[0], p[1]
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    rows = set()
    for sd in seeds:
        frontier = {sd}
        visited = {sd}
        for h, f in enumerate(fanouts, start=1):
            nxt = set()
            for src in frontier:
                cands = [d for d in adj.get(src, ()) if d not in visited]
                cands.sort(
                    key=lambda d: (
                        hashlib.md5(
                            f"{seed}:{sd}:{h}:{src}:{d}".encode()
                        ).hexdigest(),
                        d,
                    )
                )
                for d in cands[:f]:
                    rows.add((sd, h, src, d))
                    nxt.add(d)
            visited |= nxt
            frontier = nxt
    return rows


def test_sampling_matches_driver_replay(spark):
    rng = random.Random(73)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(140)]
    seeds = [0, 7, 21]
    got = {
        (r.seed_id, r.hop, r.src, r.dst)
        for r in sample_neighborhoods(
            edges_df(spark, pairs), _seeds_df(spark, seeds), [3, 2]
        ).collect()
    }
    want = _replay(pairs, seeds, [3, 2])
    assert got == want


def test_fanout_bounds_and_freshness(spark):
    # star: hub 0 with 10 leaves; fanout 4 keeps exactly 4 at hop 1
    pairs = [(0, i) for i in range(1, 11)]
    rows = sample_neighborhoods(
        edges_df(spark, pairs), _seeds_df(spark, [0]), [4, 3]
    ).collect()
    h1 = [r for r in rows if r.hop == 1]
    h2 = [r for r in rows if r.hop == 2]
    assert len(h1) == 4
    sampled = {r.dst for r in h1}
    # hop 2 from the leaves: only unvisited vertices are candidates —
    # the hub (visited) is excluded, and leaves only connect to the
    # hub, so nothing fresh remains
    assert h2 == []
    assert all(r.src == 0 and r.dst in sampled for r in h1)


def test_seed_isolation(spark):
    # two seeds in disjoint components sample independently
    pairs = [(0, 1), (1, 2), (10, 11), (11, 12)]
    rows = sample_neighborhoods(
        edges_df(spark, pairs), _seeds_df(spark, [0, 10]), [2, 2]
    ).collect()
    for r in rows:
        same_side = (r.src < 10) == (r.dst < 10) == (r.seed_id < 10)
        assert same_side, r


def test_bad_fanouts_raise(spark):
    with pytest.raises(ValueError):
        sample_neighborhoods(
            edges_df(spark, [(0, 1)]), _seeds_df(spark, [0]), []
        )
    with pytest.raises(ValueError):
        sample_neighborhoods(
            edges_df(spark, [(0, 1)]), _seeds_df(spark, [0]), [2, 0]
        )
