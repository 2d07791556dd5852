"""Deterministic random walks (SURVEY §2.7 G8 corpus generator)."""

from __future__ import annotations

import hashlib
import random

import pytest

from cminer_spark.operators.walks import random_walks

from tests.conftest import edges_df


def _starts_df(spark, pairs):
    return spark.createDataFrame(
        [(int(w), int(v)) for w, v in pairs], "walk_id long, v_id long"
    )


def _replay(pairs, starts, k, seed=0, directed=True):
    """Driver-side replay of the hash-argmin walk semantics."""
    adj: dict[int, set[int]] = {}
    for p in pairs:
        adj.setdefault(p[0], set()).add(p[1])
        if not directed:
            adj.setdefault(p[1], set()).add(p[0])
    out = {}
    for wid, v in starts:
        walk = [v]
        for step in range(1, k + 1):
            nbrs = adj.get(walk[-1])
            if not nbrs:
                break
            key = lambda d: (
                hashlib.md5(f"{seed}:{wid}:{step}:{d}".encode()).hexdigest(),
                d,
            )
            walk.append(min(nbrs, key=key))
        out[wid] = walk
    return out


def _run(spark, pairs, starts, k, **kw):
    df = random_walks(edges_df(spark, pairs), _starts_df(spark, starts), k, **kw)
    got: dict[int, dict[int, int]] = {}
    for r in df.collect():
        got.setdefault(r.walk_id, {})[r.step] = r.v_id
    return {
        w: [steps[i] for i in range(len(steps))] for w, steps in got.items()
    }


def test_walks_match_driver_replay(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    starts = [(v, v) for v in range(0, 30, 3)]
    got = _run(spark, pairs, starts, k=6)
    want = _replay(pairs, starts, k=6)
    assert got == want


def test_walks_stop_at_sinks(spark):
    # 0→1→2, 2 is a sink: walk emits steps 0..2 then stops
    got = _run(spark, [(0, 1), (1, 2)], [(0, 0)], k=5)
    assert got == {0: [0, 1, 2]}


def test_seed_changes_walks(spark):
    pairs = [(0, i) for i in range(1, 9)]  # fan-out: choice matters
    starts = [(w, 0) for w in range(20)]
    a = _run(spark, pairs, starts, k=1, seed=0)
    b = _run(spark, pairs, starts, k=1, seed=1)
    assert a != b
    # every chosen vertex is a real neighbor
    assert all(w[1] in range(1, 9) for w in a.values())
    # different walks make different choices (hash independence)
    assert len({tuple(w) for w in a.values()}) > 1


def test_undirected_walks_traverse_backwards(spark):
    got = _run(spark, [(1, 0)], [(7, 0)], k=3, directed=False)
    # only neighbor each step: bounces 0↔1
    assert got == {7: [0, 1, 0, 1]}


def test_partitioning_invariance(spark):
    rng = random.Random(13)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    starts = [(v, v) for v in range(25)]
    df1 = random_walks(edges_df(spark, pairs), _starts_df(spark, starts), 5)
    df2 = random_walks(
        edges_df(spark, pairs).repartition(7), _starts_df(spark, starts), 5
    )
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))


def test_negative_length_raises(spark):
    with pytest.raises(ValueError):
        random_walks(edges_df(spark, [(0, 1)]), _starts_df(spark, [(0, 0)]), -1)


# ----------------------------------------------------------------------
# node2vec second-order biased walks
# ----------------------------------------------------------------------

def _n2v_replay(pairs, starts, k, wr, wc, wf, seed=0, directed=True):
    adj: dict[int, set[int]] = {}
    for p in pairs:
        adj.setdefault(p[0], set()).add(p[1])
        if not directed:
            adj.setdefault(p[1], set()).add(p[0])
    out = {}
    for wid, v in starts:
        walk = [v]
        prev = None
        for step in range(1, k + 1):
            nbrs = adj.get(walk[-1])
            if not nbrs:
                break
            best = None
            for d in sorted(nbrs):
                if d == prev:
                    w = wr
                elif prev is not None and d in adj.get(prev, ()):
                    w = wc
                else:
                    w = wf
                for j in range(1, w + 1):
                    key = (
                        hashlib.md5(
                            f"{seed}:{wid}:{step}:{d}:{j}".encode()
                        ).hexdigest(),
                        d,
                        j,
                    )
                    if best is None or key < best[0]:
                        best = (key, d)
            if best is None:  # all candidate weights were 0
                break
            prev = walk[-1]
            walk.append(best[1])
        out[wid] = walk
    return out


def _run_n2v(spark, pairs, starts, k, **kw):
    from cminer_spark.operators.walks import node2vec_walks

    df = node2vec_walks(
        edges_df(spark, pairs), _starts_df(spark, starts), k, **kw
    )
    got: dict[int, dict[int, int]] = {}
    for r in df.collect():
        got.setdefault(r.walk_id, {})[r.step] = r.v_id
    return {w: [s[i] for i in range(len(s))] for w, s in got.items()}


def test_node2vec_matches_driver_replay(spark):
    rng = random.Random(61)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(70)]
    starts = [(v, v) for v in range(0, 20, 2)]
    got = _run_n2v(spark, pairs, starts, k=5, w_return=1, w_common=4, w_far=2)
    want = _n2v_replay(pairs, starts, k=5, wr=1, wc=4, wf=2)
    assert got == want


def test_node2vec_zero_return_never_backtracks(spark):
    # star + ring: from the hub every neighbor leads back to the hub
    # only; with w_return=0 and no other option the walk must stop.
    pairs = [(0, 1), (1, 0)]
    got = _run_n2v(
        spark, pairs, [(9, 0)], k=4, w_return=0, w_common=0, w_far=1,
        directed=True,
    )
    # step1: 0→1 (far class: no prev); step2: only candidate is 0 =
    # prev with weight 0 → walk stops at length 2
    assert got == {9: [0, 1]}


def test_node2vec_bias_shifts_distribution(spark):
    # triangle 0-1-2 plus pendant 1-3 (undirected). Walks 0→1→?:
    # candidates {0 (return), 2 (common nbr of 0), 3 (far)}.
    pairs = [(0, 1), (1, 2), (2, 0), (1, 3)]
    starts = [(w, 0) for w in range(400)]
    kw = dict(directed=False)
    heavy_common = _run_n2v(
        spark, pairs, starts, k=2, w_return=0, w_common=50, w_far=1, **kw
    )
    heavy_far = _run_n2v(
        spark, pairs, starts, k=2, w_return=0, w_common=1, w_far=50, **kw
    )

    def frac_at2(walks, v):
        xs = [w for w in walks.values() if len(w) == 3 and w[1] == 1]
        return sum(1 for w in xs if w[2] == v) / len(xs)

    # second step from 1 with prev=0: 2 is the common neighbor, 3 far
    assert frac_at2(heavy_common, 2) > 0.8
    assert frac_at2(heavy_far, 3) > 0.8


def test_node2vec_invalid_weights_raise(spark):
    from cminer_spark.operators.walks import node2vec_walks

    with pytest.raises(ValueError):
        node2vec_walks(
            edges_df(spark, [(0, 1)]), _starts_df(spark, [(0, 0)]), 2,
            w_return=-1,
        )
    with pytest.raises(ValueError):
        node2vec_walks(
            edges_df(spark, [(0, 1)]), _starts_df(spark, [(0, 0)]), 2,
            w_return=0, w_common=0, w_far=0,
        )
