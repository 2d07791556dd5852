"""Document chunking — fixed-size overlapping token windows.

The context-window preparation pass of retrieval / long-document
training pipelines: split each document into ``chunk_tokens``-token
windows advancing by ``stride`` tokens (``stride < chunk_tokens``
gives the standard RAG overlap; ``stride == chunk_tokens`` gives
disjoint packing-ready pieces). Downstream: embed per chunk
(similarity.py), pack per chunk (packing.py), dedup per chunk.

Semantics: whitespace tokens; window starts at 0, stride, 2·stride, …
while the start index is inside the document, so the final window may
be shorter than ``chunk_tokens`` (the trailing partial chunk is
emitted — it carries the document's tail). Token counts are exact
per chunk; character offsets are deliberately not tracked (tokens are
the unit the consumers above use).

Scale: a single per-row ``transform(sequence(...)) -> posexplode``
projection — no shuffle, no UDF, runs at scan speed; output row count
is ``Σ ceil(n_tokens / stride)``. Engine-portable (gate
``chunk_documents`` replicates the identical slicing in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode documents into overlapping token windows:
    ``(doc_id, chunk_idx, chunk_text, n_tokens)`` with ``chunk_idx``
    dense from 0 per document in document order."""
    chunk = int(chunk_tokens)
    step = chunk if stride is None else int(stride)
    if chunk < 1 or step < 1:
        raise ValueError(
            f"chunk_tokens and stride must be >= 1, got {chunk}, {step}"
        )
    if step > chunk:
        raise ValueError(
            f"stride ({step}) > chunk_tokens ({chunk}) would drop tokens"
        )
    toks = F.split(F.col(text_col), " +")
    n = F.size(toks)
    n_chunks = (F.floor((n - 1) / step) + 1).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * step + 1, chunk)).alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk), n - i * step)
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(windows).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )
