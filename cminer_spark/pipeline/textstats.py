"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All pure ``pyspark.sql.functions`` expressions (codegen'd). The
language heuristic is a deterministic marker-word vote — a stand-in
with the same plan shape as a real n-gram model (per-language score
columns + greatest-of), so swapping in real tables changes constants,
not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]

# deterministic marker words per language (toy model, stable plan shape)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
    "zh": ["de5", "shi4", "le5"],
}


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_seen) — whitespace
    tokenization plus a BPE-ish subword proxy count (4-char chunks)."""
    toks = F.split(F.col(text_col), " +")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars_seen"),
        (F.ceil(F.length(F.regexp_replace(F.col(text_col), " ", "")) / 4)).alias(
            "n_subword_est"
        ),
    )


def quality_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality features: length, mean word length, stopword ratio,
    non-alpha ratio, repetition ratio; rounded for engine-portable
    comparison."""
    toks = F.split(F.lower(F.col(text_col)), " +")
    n = F.size(toks)
    # guarded denominators: empty text → ratios 0.0 instead of an ANSI
    # divide-by-zero (n is always ≥1 because split('') = [''])
    n_len = F.greatest(F.length(text_col), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z ]", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        n.alias("n_tokens"),
        F.round(F.length(F.regexp_replace(F.col(text_col), " ", "")) / n, 6).alias(
            "mean_word_len"
        ),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(
            (F.length(text_col) - n_alpha).cast("double") / n_len, 6
        ).alias("non_alpha_ratio"),
        F.round(
            (n - F.size(F.array_distinct(toks))).cast("double") / n, 6
        ).alias("repetition_ratio"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax of marker-word votes;
    deterministic tie-break on language code; 'und' when no marker
    hits."""
    toks = F.split(F.lower(F.col(text_col)), " +")

    def _marker_score(markers: list[str]) -> F.Column:
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            _marker_score(markers).alias(f"score_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in LANG_MARKERS
        ]
    )
    # sort (-score, lang) ascending: highest score first, ties to the
    # smallest language code — deterministic
    out = scored.withColumn(
        "best",
        F.sort_array(
            F.transform(
                pairs,
                lambda p: F.struct(
                    (-p["score"]).alias("neg_score"), p["lang"].alias("lang")
                ),
            )
        )[0],
    )
    return out.select(
        "doc_id",
        F.when(F.col("best.neg_score") < 0, F.col("best.lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        (-F.col("best.neg_score")).alias("lang_score"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style token repetition signals per document:

    * ``top_token_fraction`` — occurrences of the most frequent token
      / total tokens (Rae et al. 2021's "fraction of characters in the
      most common n-gram", n=1, token grain);
    * ``dup_token_char_fraction`` — fraction of token characters
      belonging to tokens that occur ≥2 times;
    * ``dup_bigram_fraction`` — repeated-bigram occurrences / total
      bigrams (0.0 for docs with <2 tokens).

    Shape: one explode + two hash aggregates keyed on (doc, gram) then
    doc — the same map-side-combined shuffle pair as the TF-IDF build;
    the bigram stream reuses the token explode via ``lead``-free array
    zipping (no window).
    """
    toks = F.split(F.lower(F.col(text_col)), " +")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        ).alias("bigrams"),
    )
    uni = (
        base.select("doc_id", F.explode("toks").alias("g"))
        .where(F.col("g") != "")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.max("c").alias("top_c"),
            F.sum(
                F.when(F.col("c") >= 2, F.col("c") * F.length("g")).otherwise(
                    F.lit(0)
                )
            ).alias("dup_chars"),
            F.sum(F.col("c") * F.length("g")).alias("tok_chars"),
        )
    )
    bi = (
        base.select("doc_id", F.explode("bigrams").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bi"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "dup_bi"
            ),
        )
    )
    return (
        uni.join(bi, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.col("top_c") / F.greatest("n_tok", F.lit(1)), 6).alias(
                "top_token_fraction"
            ),
            F.round(
                F.col("dup_chars") / F.greatest("tok_chars", F.lit(1)), 6
            ).alias("dup_token_char_fraction"),
            F.round(
                F.coalesce(F.col("dup_bi"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_bi"), F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_bigram_fraction"),
        )
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, content_hash, rolling_fingerprint) — exact content hash
    plus a shingle-min rolling fingerprint (robust to reordering of
    whole blocks, cheap winnowing stand-in)."""
    from cminer_spark.pipeline.dedup import shingles

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.regexp_replace(F.lower(F.col(text_col)), " +", " ")).alias(
            "content_hash"
        ),
        F.array_min(
            F.transform(shingles(text_col, n), lambda s: F.md5(s))
        ).alias("rolling_fingerprint"),
    )
