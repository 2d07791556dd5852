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


def test_mega_bucket_guard_exact_copies_linear(spark):
    """A heavily exact-duplicated corpus must not explode the LSH
    band self-join: with dedup_exact=True a k-copy group contributes
    ONE banded row, so candidate pairs are O(distinct texts), not
    O(k^2) — and dedup_clusters still recovers the full cluster via
    the star edges."""
    from cminer_spark.pipeline.dedup import (
        lsh_overflow_buckets,
        minhash_lsh_candidates,
    )

    k = 2000
    rows = [(i, BASE) for i in range(k)]
    rows += [(k, BASE.replace("lazy", "sleepy"))]
    rows += [(k + 1, "an unrelated doc about adaptive query execution")]
    docs = _docs(spark, rows)

    # bands=8 (2 rows/band) so the near-dup pair deterministically
    # collides (verified: n_bands=3 at this banding)
    cands = minhash_lsh_candidates(docs, bands=8, dedup_exact=True).collect()
    # 3 distinct texts -> at most 3 rep pairs (actually only the
    # near-dup pair collides)
    assert len(cands) <= 3
    assert all(r.a in (0, k, k + 1) and r.b in (0, k, k + 1) for r in cands)

    # clustering recovers every copy into the canonical cluster
    out = dedup_clusters(docs, threshold=0.4, bands=8)
    by_cluster = {}
    for r in out.collect():
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    assert set(range(k)) | {k} <= by_cluster[0]  # copies + near-dup
    assert by_cluster[k + 1] == {k + 1}

    # the overflow report at a tiny cap flags the copy bucket when
    # banding WITHOUT the exact-dedup guard, and is empty with it
    assert lsh_overflow_buckets(docs, max_bucket_size=10).count() > 0
    assert (
        lsh_overflow_buckets(
            docs, max_bucket_size=10, dedup_exact=True
        ).count()
        == 0
    )


def test_max_bucket_size_cap_filters_buckets(spark):
    """max_bucket_size drops over-cap buckets from the self-join:
    with every copy banded identically, a cap below the copy count
    kills those candidate pairs (the audit path documents the loss)."""
    from cminer_spark.pipeline.dedup import minhash_lsh_candidates

    rows = [(i, BASE) for i in range(30)]
    docs = _docs(spark, rows)
    uncapped = minhash_lsh_candidates(docs).count()
    capped = minhash_lsh_candidates(docs, max_bucket_size=10).count()
    assert uncapped == 30 * 29 // 2
    assert capped == 0


def test_dedup_clusters_unconverged_raises(spark):
    """A duplicate-graph diameter beyond cc_rounds must fail loudly,
    not silently split clusters: a long chain of near-dups with
    cc_rounds=1 raises."""
    words = BASE.split()
    rows = []
    # chain: doc i and i+1 differ by one word -> high jaccard links
    for i in range(8):
        w = list(words)
        for j in range(i):
            w[j] = f"tok{j}"
        rows.append((i, " ".join(w)))
    docs = _docs(spark, rows)
    with pytest.raises(ValueError, match="still changing"):
        dedup_clusters(docs, threshold=0.5, cc_rounds=1).collect()
    # ample rounds: no raise, one cluster
    out = dedup_clusters(docs, threshold=0.5, cc_rounds=8)
    assert out.select("cluster_id").distinct().count() == 1
