"""Tests for cross-corpus (incremental) LSH dedup."""

from __future__ import annotations

from cminer_spark.pipeline.dedup import dedup_against, lsh_candidates_against

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _corpora(spark):
    existing = spark.createDataFrame(
        [
            (1, BASE),
            (2, "completely different text about spark shuffle partitions"),
            (3, "another unrelated document mentioning broadcast joins"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, BASE),  # exact copy of existing 1 -> dropped
            (101, BASE + " extra"),  # near-dup of 1 -> dropped
            (102, "fresh content with no counterpart at all in the corpus"),
            (103, "ab"),  # < shingle length: no bands, always survives
        ],
        "doc_id long, text string",
    )
    return existing, new


def test_candidates_are_cross_corpus_only(spark):
    existing, new = _corpora(spark)
    cands = lsh_candidates_against(existing, new, num_hashes=8, bands=4).collect()
    assert all(r["existing_id"] in {1, 2, 3} for r in cands)
    assert all(r["new_id"] in {100, 101, 102, 103} for r in cands)
    # the exact copy shares every band
    full = {(r["existing_id"], r["new_id"]): r["n_bands"] for r in cands}
    assert full[(1, 100)] == 4


def test_dedup_against_drops_near_dups_keeps_fresh(spark):
    existing, new = _corpora(spark)
    out = {
        r["doc_id"]: r["n_lsh_candidates"]
        for r in dedup_against(
            existing, new, threshold=0.4, num_hashes=8, bands=4
        ).collect()
    }
    assert 100 not in out and 101 not in out  # exact + near dup dropped
    assert set(out) == {102, 103}
    assert out[103] == 0  # too short to band: zero candidates, survives


def test_broadcast_delta_same_result(spark):
    existing, new = _corpora(spark)
    a = sorted(
        tuple(r)
        for r in dedup_against(
            existing, new, threshold=0.4, num_hashes=8, bands=4
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in dedup_against(
            existing, new, threshold=0.4, num_hashes=8, bands=4,
            broadcast_delta=True,
        ).collect()
    )
    assert a == b


def test_new_new_duplicates_not_compared(spark):
    """Two identical NEW docs must both survive if neither matches the
    existing corpus — cross-dedup never compares delta to itself."""
    existing = spark.createDataFrame(
        [(1, "nothing in common with the delta documents here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, BASE), (101, BASE)], "doc_id long, text string"
    )
    out = {r["doc_id"] for r in dedup_against(existing, new).collect()}
    assert out == {100, 101}
