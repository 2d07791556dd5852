"""Document chunking: window arithmetic, overlap reconstruction,
trailing partials, validation."""

from __future__ import annotations

import pytest

from cminer_spark.pipeline import chunk_documents


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, **kw).collect(),
                  key=lambda r: r.chunk_idx)
    return [(r.chunk_idx, r.chunk_text, r.n_tokens) for r in rows]


def test_disjoint_chunks_cover_exactly(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _chunks(spark, text, chunk_tokens=4)
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w4 w5 w6 w7", 4),
        (2, "w8 w9", 2),
    ]
    # concatenation reconstructs the document
    assert " ".join(c[1] for c in got) == text


def test_overlapping_windows(spark):
    text = "a b c d e f g"
    got = _chunks(spark, text, chunk_tokens=4, stride=2)
    assert got == [
        (0, "a b c d", 4),
        (1, "c d e f", 4),
        (2, "e f g", 3),
        (3, "g", 1),
    ]


def test_doc_shorter_than_chunk(spark):
    got = _chunks(spark, "only three words", chunk_tokens=100)
    assert got == [(0, "only three words", 3)]


def test_exact_multiple_no_empty_trailing(spark):
    got = _chunks(spark, "a b c d", chunk_tokens=2)
    assert [c[0] for c in got] == [0, 1]


def test_validation_simple(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=5)
