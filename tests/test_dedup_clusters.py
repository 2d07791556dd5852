"""End-to-end near-duplicate clustering (SURVEY §2.9 pipeline ops)."""

from __future__ import annotations

import pytest

from cminer_spark.pipeline.dedup import (
    dedup_clusters,
    ngram_jaccard_pairs,
    verified_duplicate_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),  # exact duplicate of 1
            (3, BASE.replace("lazy", "sleepy")),  # near-dup of 1
            (4, BASE.replace("lazy", "sleepy").replace("cat", "kitten")),
            (5, "completely unrelated text about spark sql physical plans"),
            (6, "hi"),  # too short to shingle
            (7, "hi"),  # exact duplicate of 6
            (8, "another singleton document talking about query engines"),
        ],
    )


def test_verified_pairs_match_allpairs_jaccard(spark, corpus):
    got = {
        (r.a, r.b): r.jaccard
        for r in verified_duplicate_pairs(
            corpus, threshold=0.4, num_hashes=16, bands=8
        ).collect()
    }
    want = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, threshold=0.4).collect()
    }
    # LSH may only MISS pairs, never invent them; with 2-row bands
    # (16 hashes / 8 bands) every ≥0.4-Jaccard pair on this fixture is
    # deterministically caught (md5 family, fixed corpus)
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and (3, 4) in got


def test_clusters_transitive_exact_and_short_texts(spark, corpus):
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in
           dedup_clusters(corpus, threshold=0.4, num_hashes=16, bands=8).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}
    # 1,2 exact; 3 near-dup of 1; 4 near-dup of 3 → one cluster rooted at 1
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4] == (1, False)
    # short exact dups cluster via the text-hash star edges
    assert out[6] == (6, True)
    assert out[7] == (6, False)
    # singletons are their own canonical cluster
    assert out[5] == (5, True)
    assert out[8] == (8, True)


def test_without_exact_short_texts_stay_singletons(spark, corpus):
    out = {r.doc_id: r.cluster_id for r in
           dedup_clusters(corpus, threshold=0.4, num_hashes=16, bands=8,
                          include_exact=False).collect()}
    assert out[6] == 6 and out[7] == 7
    # shingled exact dups are still caught by LSH (jaccard 1.0)
    assert out[2] == 1


def test_high_threshold_splits_weak_links(spark, corpus):
    out = {r.doc_id: r.cluster_id for r in
           dedup_clusters(corpus, threshold=0.999, num_hashes=16, bands=8).collect()}
    # only exact duplicates survive verification at ~1.0
    assert out[1] == 1 and out[2] == 1
    assert out[3] == 3 and out[4] == 4


def test_empty_corpus(spark):
    out = dedup_clusters(_docs(spark, []))
    assert out.count() == 0
