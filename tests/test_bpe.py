"""BPE trainer semantics: hand-computed merges, left-to-right
non-overlapping application, early stop, encode parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cminer_spark.pipeline.bpe import (
    bpe_token_counts,
    segment_words,
    train_bpe,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_bpe_hand_computed(spark):
    # corpus: low x5, lower x2, newest x6, widest x3  (Sennrich-style)
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges, info = train_bpe(_docs(spark, [" ".join(texts)]), n_merges=4)
    got = [
        (r["left"], r["right"], r["merged"], r["n"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    # pair counts round 1: es 9 (newest+widest), st 9, lo 7, we 8,
    # ne 6, ew 6, ... tie es/st breaks to 'e s' < 's t' -> es first
    assert got[0] == ("e", "s", "es", 9)
    assert got[1] == ("es", "t", "est", 9)
    assert got[2] == ("l", "o", "lo", 7)
    # round 4: w est (newest 6 + widest 3 both end 'w est')... newest
    # segments n-e-w-est, widest w-i-d-est: 'w est' only in newest (6)
    # vs 'lo w' in low+lower (7) -> lo w wins
    assert got[3] == ("lo", "w", "low", 7)
    assert not info.stopped_early


def test_merge_application_is_left_to_right_non_overlapping(spark):
    # aaaaa under merge (a,a): LTR gives aa aa a — never aa a a or a aa aa
    words = spark.createDataFrame([("aaaaa", 1)], "word string, n long")
    seg = segment_words(words, [("a", "a")]).collect()[0]["seg"]
    assert seg == "aa aa a"
    # chained merges: (a,a) then (aa,aa)
    seg2 = segment_words(words, [("a", "a"), ("aa", "aa")]).collect()[0][
        "seg"
    ]
    assert seg2 == "aaaa a"


def test_merge_respects_symbol_boundaries(spark):
    # word 'ba' segments b-a: merge (a,b) must NOT fire on the 'a b'
    # substring straddling symbols in 'b a' reversed order, and a
    # symbol ENDING in a ('ba') must not satisfy last==a
    words = spark.createDataFrame(
        [("ba", 1), ("ab", 1), ("bab", 1)], "word string, n long"
    )
    segs = {
        r["word"]: r["seg"]
        for r in segment_words(words, [("a", "b")]).collect()
    }
    assert segs == {"ba": "b a", "ab": "ab", "bab": "b ab"}


def test_train_bpe_stops_early_when_no_pairs(spark):
    # single-char vocabulary: zero adjacent pairs from round 1
    merges, info = train_bpe(_docs(spark, ["a b c a"]), n_merges=3)
    assert merges.count() == 0
    assert info.stopped_early


def test_token_counts_match_manual_encode(spark):
    texts = ["the cat sat", "the cat", "the"]
    docs = _docs(spark, texts)
    _, info = train_bpe(docs, n_merges=2)
    pairs = [(a, b) for a, b, _, _ in info.merges]
    # round 1: th=3, he=3, at=3 (cat x2 + sat), ca=2, sa=1 — the
    # three-way tie breaks ascending: 'a t' < 'h e' < 't h' -> at.
    # round 2: th=3, he=3 tie -> 'h e' < 't h' -> he.
    assert pairs == [("a", "t"), ("h", "e")]
    counts = {
        r["token"]: r["n"]
        for r in bpe_token_counts(docs, pairs, top_k=10).collect()
    }
    # the -> t he; cat -> c at; sat -> s at
    assert counts["at"] == 3 and counts["he"] == 3 and counts["t"] == 3
    assert counts["c"] == 2 and counts["s"] == 1
    assert "the" not in counts


def test_checkpoint_every_preserves_results(spark):
    texts = ["aa ab aa ab abab"]
    docs = _docs(spark, texts)
    m1, _ = train_bpe(docs, n_merges=4, checkpoint_every=1)
    m2, _ = train_bpe(docs, n_merges=4, checkpoint_every=100)
    assert sorted(map(tuple, m1.collect())) == sorted(
        map(tuple, m2.collect())
    )


def test_segment_words_store_path_preserves_results(spark):
    # with checkpoint_every=1 every merge round-trips the parquet
    # double-buffer; the segmentation must be identical to the pure
    # in-plan fold (checkpoint_every large enough to never engage it)
    from cminer_spark.pipeline.bpe import segment_words

    words = spark.createDataFrame(
        [("abcabc", 2), ("aab", 1), ("x", 3)], "word string, n long"
    )
    merges = [("a", "b"), ("ab", "c"), ("a", "ab")]
    via_store = segment_words(words, merges, checkpoint_every=1)
    in_plan = segment_words(words, merges, checkpoint_every=100)
    assert sorted(map(tuple, via_store.collect())) == sorted(
        map(tuple, in_plan.collect())
    )


def test_train_leaves_no_persistent_state(spark):
    # the segmentation state goes through the parquet double-buffer,
    # not localCheckpoint: a long training run must not accumulate
    # pinned storage blocks (DataFrame.unpersist cannot free
    # localCheckpoint blocks — they are RDD-level, not CacheManager)
    docs = _docs(spark, ["aa ab aa ab abab ba"])
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    train_bpe(docs, n_merges=5, checkpoint_every=1)
    after = jsc.getPersistentRDDs().size()
    assert after <= before


def test_merge_fold_stays_jvm_side(spark):
    # zero Python in the hot path: the fold must compile to built-in
    # expressions (no BatchEvalPython / ArrowEvalPython operators)
    words = spark.createDataFrame([("abcabc", 2)], "word string, n long")
    plan = segment_words(words, [("a", "b"), ("ab", "c")])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_cli_bpe_train_roundtrip(spark, tmp_path, capsys):
    import json

    from cminer_spark.__main__ import main
    from cminer_spark.pipeline.bpe import train_bpe

    base = str(tmp_path)
    docs = _docs(
        spark, ["the cat sat on the mat", "the dog sat", "the the the"]
    )
    docs.write.parquet(f"{base}/docs")
    rc = main(
        ["bpe-train", "--docs", f"{base}/docs", "--merges", "3",
         "--output", f"{base}/merges"]
    )
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta == {"merges_trained": 3, "stopped_early": False}
    # CLI output table == in-process trainer output
    direct, _ = train_bpe(docs, n_merges=3)
    via_cli = spark.read.parquet(f"{base}/merges")
    assert sorted(map(tuple, via_cli.collect())) == sorted(
        map(tuple, direct.collect())
    )
