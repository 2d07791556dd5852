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


def test_max_bucket_size_bounds_candidates(spark):
    """10^2 exact copies of boilerplate in the existing corpus: the
    guard drops the mega-bucket, candidate count stays O(|delta|)
    instead of O(copies x delta)."""
    boiler = "standard footer text repeated across the entire web corpus"
    existing = spark.createDataFrame(
        [(i, boiler) for i in range(100)] + [(1000, BASE)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2000, boiler), (2001, BASE)], "doc_id long, text string"
    )
    unguarded = lsh_candidates_against(existing, new, num_hashes=8, bands=4)
    guarded = lsh_candidates_against(
        existing, new, num_hashes=8, bands=4, max_bucket_size=10
    )
    n_un, n_g = unguarded.count(), guarded.count()
    assert n_un >= 100  # every boilerplate copy pairs with the delta copy
    assert n_g == 1  # only the BASE pair survives the guard
    pair = guarded.collect()[0]
    assert (pair["existing_id"], pair["new_id"]) == (1000, 2001)
    # survivors under the guard: the boilerplate delta doc is NOT
    # verified against the capped bucket, so it sneaks in — the
    # documented lossy trade: compose exact-dedup upstream to catch it
    kept = {
        r["doc_id"]
        for r in dedup_against(
            existing, new, num_hashes=8, bands=4, max_bucket_size=10
        ).collect()
    }
    assert 2000 in kept and 2001 not in kept


def test_precomputed_band_table_is_identical(spark):
    # band_corpus() persisted once per corpus version must drive
    # dedup_against to byte-identical output vs inline banding
    from cminer_spark.pipeline.dedup import band_corpus

    existing, new = _corpora(spark)
    bands_tbl = band_corpus(existing, num_hashes=8, bands=4)
    inline = dedup_against(existing, new, num_hashes=8, bands=4)
    seamed = dedup_against(
        existing, new, num_hashes=8, bands=4, existing_bands=bands_tbl
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, seamed.collect())
    )
    # the band table round-trips through parquet (the persist path)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        bands_tbl.write.mode("overwrite").parquet(d + "/bands")
        loaded = spark.read.parquet(d + "/bands")
        seamed2 = dedup_against(
            existing, new, num_hashes=8, bands=4, existing_bands=loaded
        )
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, seamed2.collect())
        )


def test_band_table_bands_drift_raises(spark):
    """A persisted band table built with a different `bands` must fail
    loudly at use time — silent config drift would zero out candidate
    recall and admit every duplicate."""
    import pytest

    from cminer_spark.pipeline.dedup import band_corpus

    existing, new = _corpora(spark)
    bands_tbl = band_corpus(existing, num_hashes=8, bands=8)
    with pytest.raises(ValueError, match="bands"):
        lsh_candidates_against(
            existing, new, num_hashes=8, bands=4, existing_bands=bands_tbl
        )
    with pytest.raises(ValueError, match="bands"):
        dedup_against(
            existing, new, num_hashes=8, bands=4, existing_bands=bands_tbl
        )
    # an empty band table (fresh corpus) is legitimate with any config
    empty = band_corpus(
        existing.where("doc_id < 0"), num_hashes=8, bands=8
    )
    out = {
        r["doc_id"]
        for r in dedup_against(
            existing, new, num_hashes=8, bands=4, existing_bands=empty
        ).collect()
    }
    assert out == {100, 101, 102, 103}  # nothing to collide with
