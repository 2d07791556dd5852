"""Exact-substring duplicate-span detection (pipeline/spans.py):
planted passages, within-doc repetition, maximality invariants, and a
brute-force Python oracle on a seeded random corpus."""

from __future__ import annotations

import random

import pytest

from cminer_spark.pipeline.spans import (
    duplicate_spans,
    span_dup_stats,
    strip_duplicate_spans,
)

N = 3


def _spans_py(texts: dict[int, str], n: int, min_count: int):
    """Brute-force reference: corpus-wide n-gram counts -> covered
    token positions -> merged maximal intervals per doc."""
    toks = {d: t.lower().split() for d, t in texts.items()}
    counts: dict[tuple[str, ...], int] = {}
    for t in toks.values():
        for i in range(len(t) - n + 1):
            g = tuple(t[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - n + 1):
            if counts[tuple(t[i : i + n])] >= min_count:
                covered.update(range(i + 1, i + n + 1))  # 1-indexed
        spans = []
        for p in sorted(covered):
            if spans and p == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        out[d] = spans
    return out


def _collect_spans(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect()
    }


def test_planted_cross_doc_passage(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "x y alpha beta gamma delta epsilon q r s"),
            (3, "totally different words here none shared at all"),
        ],
        "doc_id int, text string",
    )
    got = _collect_spans(duplicate_spans(docs, n=N))
    assert got == {(1, 1, 5, 5), (2, 3, 7, 5)}


def test_within_doc_repetition_counts(spark):
    docs = spark.createDataFrame(
        [(1, "rep rep rep rep rep rep"), (2, "unique tokens only here")],
        "doc_id int, text string",
    )
    got = _collect_spans(duplicate_spans(docs, n=N))
    assert got == {(1, 1, 6, 6)}


def test_short_docs_and_stats_cover_all_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d e f g"), (3, "c d e f g")],
        "doc_id int, text string",
    )
    spans = duplicate_spans(docs, n=N)
    assert {r.doc_id for r in spans.collect()} == {2, 3}
    stats = {r.doc_id: r for r in span_dup_stats(docs, n=N).collect()}
    assert set(stats) == {1, 2, 3}
    assert stats[1].dup_tokens == 0 and stats[1].dup_frac == 0.0
    assert stats[2].dup_tokens == 5 and stats[2].dup_frac == 1.0


def test_min_count_threshold(spark):
    docs = spark.createDataFrame(
        [
            (1, "p q r s t"),
            (2, "p q r s t"),
            (3, "p q r s t"),
            (4, "only two u v w x y"),
            (5, "also two u v w x y"),
        ],
        "doc_id int, text string",
    )
    got = duplicate_spans(docs, n=N, min_count=3)
    assert {r.doc_id for r in got.collect()} == {1, 2, 3}


def test_random_corpus_matches_bruteforce(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab forces collisions
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for d in range(30)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id int, text string"
    )
    got = _collect_spans(duplicate_spans(docs, n=N))
    want = {
        (d, s, e, e - s + 1)
        for d, spans in _spans_py(texts, N, 2).items()
        for s, e in spans
    }
    assert got == want


def test_span_maximality_invariants(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (d, " ".join(rng.choice(vocab) for _ in range(30)))
            for d in range(20)
        ],
        "doc_id int, text string",
    )
    rows = duplicate_spans(docs, n=N).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_tokens == r.span_end - r.span_start + 1 >= N
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, "adjacent/overlapping spans must merge"


def test_strip_keep_first_keeps_one_copy(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "x y alpha beta gamma delta epsilon q r s"),
            (3, "untouched words stay put here"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r
        for r in strip_duplicate_spans(docs, n=N, keep="first").collect()
    }
    assert set(out) == {1, 2, 3}
    # doc 1 holds the globally-first occurrence — it survives intact
    assert out[1].text_clean == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[1].n_removed == 0
    assert out[2].text_clean == "x y q r s" and out[2].n_removed == 5
    assert out[3].n_removed == 0


def test_strip_keep_none_removes_all_copies(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "x y alpha beta gamma delta epsilon q r s"),
            (4, "rep rep rep rep rep rep"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r
        for r in strip_duplicate_spans(docs, n=N, keep="none").collect()
    }
    assert out[1].text_clean == "zeta eta theta" and out[1].n_removed == 5
    assert out[2].text_clean == "x y q r s"
    # a fully-duplicated doc empties out but still appears
    assert out[4].text_clean == "" and out[4].n_removed == 6


def test_strip_none_matches_stats_dup_tokens(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(9)]
    docs = spark.createDataFrame(
        [
            (d, " ".join(rng.choice(vocab) for _ in range(28)))
            for d in range(20)
        ],
        "doc_id int, text string",
    )
    removed = {
        r.doc_id: r.n_removed
        for r in strip_duplicate_spans(docs, n=N, keep="none").collect()
    }
    stats = {
        r.doc_id: r.dup_tokens for r in span_dup_stats(docs, n=N).collect()
    }
    assert removed == stats


def test_strip_rejects_bad_policy(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        strip_duplicate_spans(docs, n=N, keep="last")


def test_stats_consistent_with_spans(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [
            (d, " ".join(rng.choice(vocab) for _ in range(25)))
            for d in range(15)
        ],
        "doc_id int, text string",
    )
    spans = duplicate_spans(docs, n=N).collect()
    per_doc: dict[int, int] = {}
    for r in spans:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.span_tokens
    stats = span_dup_stats(docs, n=N).collect()
    assert len(stats) == 15
    for r in stats:
        assert r.dup_tokens == per_doc.get(r.doc_id, 0)
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.dup_frac == pytest.approx(
            round(r.dup_tokens / max(r.n_tokens, 1), 6)
        )
