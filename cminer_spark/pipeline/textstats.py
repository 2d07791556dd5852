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


# Gopher rule-filter defaults (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", table A1 — the word-level subset; the
# line-level rules live in pipeline/lines.py + repetition_stats).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_RULES = (
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "alpha_ratio",
    "stopwords",
)


def gopher_quality_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher-style document quality filtering: per-document stats,
    one boolean per rule, an overall ``pass_filter``, and a
    ``fail_reasons`` string (comma-joined failed rule names, ``''``
    when the document passes).

    Rules (paper defaults in the signature):

    * ``word_count``     — ``min_words <= n_words <= max_words``
    * ``mean_word_len``  — mean characters per word in
      ``[min_mean_word_len, max_mean_word_len]``
    * ``symbol_ratio``   — (# of ``#`` + ellipsis ``...``) per word
      ``<= max_symbol_ratio``
    * ``alpha_ratio``    — fraction of words containing a letter
      ``>= min_alpha_word_ratio``
    * ``stopwords``      — at least ``min_stopwords`` DISTINCT members
      of the stop list present (Gopher's 8-word list by default)

    Scale: pure per-row codegen expressions — no shuffle, no UDF; runs
    at scan speed and composes with any downstream filter pushdown.
    Thresholds are inlined constants, so Catalyst folds each rule to a
    single comparison. Engine-portable (the gate oracle replicates the
    identical arithmetic in DuckDB); ratios are rounded to 6 dp before
    comparison so the rule booleans cannot flip on float noise across
    engines.
    """
    stop = stopwords if stopwords is not None else GOPHER_STOPWORDS
    toks = F.split(F.lower(F.col(text_col)), " +")
    n = F.size(toks)  # always >= 1: split('') == ['']
    mean_wl = F.round(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / n,
        6,
    )
    n_hash = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ellipsis = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / n, 6)
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    alpha_ratio = F.round(n_alpha_words.cast("double") / n, 6)
    stop_arr = F.array(*[F.lit(s) for s in stop])
    n_stop = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(toks, s))
    )

    stats = docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    rules = {
        "word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "alpha_ratio": F.col("alpha_ratio") >= min_alpha_word_ratio,
        "stopwords": F.col("n_stopwords") >= min_stopwords,
    }
    out = stats.select(
        "*", *[cond.alias(f"ok_{name}") for name, cond in rules.items()]
    )
    all_ok = None
    for name in GOPHER_RULES:
        c = F.col(f"ok_{name}")
        all_ok = c if all_ok is None else (all_ok & c)
    return out.select(
        "*",
        all_ok.alias("pass_filter"),
        F.concat_ws(
            ",",
            F.filter(
                F.array(
                    *[
                        F.when(~F.col(f"ok_{name}"), F.lit(name))
                        for name in GOPHER_RULES
                    ]
                ),
                lambda x: x.isNotNull(),
            ),
        ).alias("fail_reasons"),
    )


def unigram_logprob(
    docs: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-proxy quality scoring: per-document mean token
    log-probability under a Laplace-smoothed unigram model trained on
    ``corpus`` (the scored table itself by default) —
    ``(doc_id, n_tokens, logprob_per_token)``, higher = more
    corpus-typical. The cheap stand-in for LM-perplexity filtering
    (CCNet/ROOTS style): rank documents by model fit and drop the
    tail; swapping in a real LM changes the score column, not the
    plan.

    ``P(t) = (count(t) + 1) / (N + V)`` with corpus token total ``N``
    and vocab size ``V``; out-of-vocabulary tokens (scoring docs the
    model never saw) get the smoothed floor ``1 / (N + V)``.

    Scale: one combinable term-count aggregate over the exploded
    corpus, one (term -> count) equi-join back onto the scored
    tokens (AQE broadcasts when the vocab is small), one per-doc mean.
    ``N`` / ``V`` are two driver scalars (the convergence-probe
    convention). The score is rounded to 6 dp, making it
    engine-portable (gate ``unigram_logprob``).
    """
    train = corpus if corpus is not None else docs
    corpus_toks = train.select(
        F.explode(F.split(F.lower(F.col(text_col)), " +")).alias("t")
    )
    tf = corpus_toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n, v = tf.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    denom = float(n + v)
    doc_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " +")).alias("t"),
    )
    scored = doc_toks.join(tf, "t", "left").select(
        "doc_id",
        F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / F.lit(denom)).alias(
            "lp"
        ),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("logprob_per_token"),
    )


def length_percentiles(
    docs: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group document-length distribution: ``(group, n_docs,
    p<NN>...)`` — the corpus-report numbers behind truncation / length
    filtering decisions.

    ``exact=True`` uses ``percentile`` (linear interpolation on the
    sorted values — identical to DuckDB ``quantile_cont``, gate
    ``length_percentiles``); it buffers each group's values in its
    reducer, which is fine for the bounded-cardinality report grain
    (languages, sources) but NOT for high-cardinality groups at
    100 TB — there ``exact=False`` switches to ``percentile_approx``
    (GK-sketch, fixed memory per group, mergeable map-side), same
    schema.
    """
    fn = "percentile" if exact else "percentile_approx"
    arr = ", ".join(repr(float(p)) for p in percentiles)
    agg = F.expr(f"{fn}({value_col}, array({arr}))")
    cols = [
        F.round(F.get(agg, i), 6).alias(f"p{int(p * 100):02d}")
        for i, p in enumerate(percentiles)
    ]
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"), *cols
    )


def bigram_logprob(
    docs: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perplexity-proxy scoring, bigram order: per-document mean
    ``ln P(w_i | w_{i-1})`` under a Laplace-smoothed bigram model
    trained on ``corpus`` (the scored table itself by default) —
    ``(doc_id, n_pairs, logprob_per_pair)``. The next step up from
    :func:`unigram_logprob` toward KenLM-style LM filtering: word
    order now matters, so shuffled/boilerplate text scores lower than
    its unigram profile suggests.

    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with unigram count
    ``c(w1)`` and shared vocab size ``V``. Unseen pairs hit the
    ``c(w1,w2)=0`` smoothing floor. Empty tokens from leading/
    trailing/multiple whitespace are dropped BEFORE pairing (no
    phantom ``''`` bigrams); documents with fewer than two real
    tokens have no bigrams and are absent from the output.

    Plan shape: adjacent pairs are built IN-ARRAY (``slice`` +
    ``arrays_zip`` — no window, no per-row Python, order preserved by
    construction) then exploded; model counts are two combinable
    aggregates; scoring is two equi-joins back onto the pair stream
    (AQE broadcasts the unigram side when small; the bigram table
    joins by key and is never collected). ``V`` is one driver scalar
    (convergence-probe convention). Scores round to 6 dp for the
    engine-portable gate ``bigram_logprob``.
    """
    train = corpus if corpus is not None else docs

    def _clean_toks() -> F.Column:
        return F.filter(
            F.split(F.lower(F.col(text_col)), " +"), lambda x: x != ""
        )

    def _pairs(frame: DataFrame, with_id: bool) -> DataFrame:
        toks = _clean_toks()
        n = F.size(toks)
        zipped = F.arrays_zip(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        return frame.select(*cols, F.explode(zipped).alias("p")).select(
            *(["doc_id"] if with_id else []),
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
        )

    corpus_toks = train.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " +"), lambda x: x != ""
            )
        ).alias("t")
    )
    uni = corpus_toks.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    v = float(uni.count())
    bi = _pairs(train, with_id=False).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cb")
    )
    scored = (
        _pairs(docs, with_id=True)
        .join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("t").alias("w1"), "cu"), "w1", "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(v))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("lp"), 6).alias("logprob_per_pair"),
    )
