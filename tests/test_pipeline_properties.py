"""Property tests (hypothesis) for the r4 pipeline operators:
line-dedup idempotence and chunking coverage, over generated corpora.

Spark round-trips are slow, so examples are capped and deadlines
disabled; each property still explores corpus shapes no hand case
covers (duplicate mixes, stride/chunk combos, degenerate docs).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from cminer_spark.pipeline import chunk_documents, line_dedup

_SETTINGS = dict(max_examples=8, deadline=None)

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "omega"])
_line = st.lists(_word, min_size=1, max_size=4).map(" ".join)
_doc = st.lists(_line, min_size=1, max_size=5).map("\n".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


@settings(**_SETTINGS)
@given(texts=_corpus, keep_first=st.booleans())
def test_line_dedup_idempotent(spark, texts, keep_first):
    """After one pass no line remains duplicated ACROSS docs, so a
    second pass removes nothing (both policies)."""
    once = line_dedup(_docs_df(spark, texts), keep_first=keep_first)
    again = line_dedup(
        once.select("doc_id", once["text_clean"].alias("text")),
        keep_first=keep_first,
    )
    rows = again.collect()
    assert all(r.n_lines == r.n_lines_kept for r in rows)


@settings(**_SETTINGS)
@given(texts=_corpus)
def test_line_dedup_counts_conserve(spark, texts):
    out = line_dedup(_docs_df(spark, texts)).collect()
    for r in out:
        assert 0 <= r.n_lines_kept <= r.n_lines
        kept = r.text_clean.split("\n") if r.text_clean else []
        assert len(kept) == r.n_lines_kept


@settings(**_SETTINGS)
@given(
    n_words=st.integers(min_value=1, max_value=40),
    chunk=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_chunking_covers_every_token(spark, n_words, chunk, data):
    stride = data.draw(st.integers(min_value=1, max_value=chunk))
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    # dense chunk ids, exact per-chunk token counts, full coverage
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_tokens
        start = r.chunk_idx * stride
        assert toks == [f"w{i}" for i in range(start, start + r.n_tokens)]
        covered.update(range(start, start + r.n_tokens))
    assert covered == set(range(n_words))
