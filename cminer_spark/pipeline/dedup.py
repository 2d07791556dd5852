"""Document deduplication operators for large-scale training pipelines.

All operators are pure DataFrame expressions (JVM-side, codegen'd) —
no Python in the hot path. Hashing is md5-based so results are
engine-portable (the DuckDB correctness oracles compute the identical
signatures).

Scale notes:
* exact dedup is one hash-aggregate — partial agg makes the hot-text
  key (billions of copies of "" or boilerplate) cheap;
* MinHash-LSH is the standard shingle→signature→band→bucket-join
  pipeline: candidate generation never compares all pairs, only
  same-bucket pairs (the 100 TB path); verification joins shingle
  sets only for candidates;
* n-gram Jaccard all-pairs is quadratic by nature and kept for
  verification / small corpora — the LSH path is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 3


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.col(text_col)), " +")


def shingles(text_col: str, n: int = DEFAULT_SHINGLE) -> F.Column:
    """Distinct word n-gram shingles of a text column (empty array for
    texts shorter than n tokens — guard needed because Spark's
    ``sequence(1, 0)`` counts DOWN instead of being empty)."""
    toks = _tokens(text_col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: ``(text_hash, canonical_id, n_copies, dup_ids)``.

    One hash-aggregate; canonical = min id (deterministic).
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs shingle Jaccard ≥ threshold: ``(a, b, jaccard)``.

    Computed by exploding distinct shingles and joining on shingle —
    pairs with zero overlap are never materialized. Quadratic in the
    worst case; use :func:`minhash_lsh_candidates` at scale.
    """
    # shingles() is per-doc array_distinct already — no global
    # DISTINCT needed (it would shuffle every shingle string once more)
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(text_col, n)).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "s")
    b = sh.select(F.col("doc_id").alias("b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
) -> DataFrame:
    """MinHash signature per document: ``(doc_id, sig array)``.

    ``hash_family="md5"`` (default): h_i(s) = md5(i || '|' || s),
    lexicographic-min hex strings — identical in any engine with md5
    (what the DuckDB oracle gate replicates). ``"xxhash64"``: h_i(s) =
    xxhash64(i, s), numeric 64-bit mins — the THROUGHPUT family (no
    hex-string materialization, cheaper hash), for engines-internal
    runs where cross-engine portability is not needed.

    The shingle explode needs no global DISTINCT (``shingles()`` is
    per-doc ``array_distinct`` already, and duplicate shingles cannot
    change a min anyway), so the only shuffle is the min-aggregate's —
    partial-aggregated map-side to doc grain.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(text_col, n)).alias("s")
    )
    if hash_family == "xxhash64":
        hashes = [
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        hashes = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    mins = sh.groupBy("doc_id").agg(*hashes)
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def exact_text_representatives(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per DISTINCT text: ``(doc_id, text)`` where doc_id is
    the minimum id of the exact-text group (the same canonical the
    exact-dedup star edges use). One hash-aggregate."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.any_value(F.col(text_col)).alias(text_col),
        )
        .drop("_h")
    )


def _minhash_banded(
    docs: DataFrame,
    num_hashes: int,
    bands: int,
    n: int,
    id_col: str,
    text_col: str,
    hash_family: str,
) -> DataFrame:
    """Shared banding stage: ``(doc_id, band_idx, band_hash)``."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col, hash_family)

    def band_hash(bi: int) -> F.Column:
        elems = [
            F.element_at("sig", bi * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        if hash_family == "xxhash64":
            return F.xxhash64(*elems).cast("string")
        return F.md5(F.concat_ws("|", *elems))

    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        band_hash(bi).alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def _cap_buckets(banded: DataFrame, max_bucket_size: int) -> DataFrame:
    """Mega-bucket guard: drop (band_idx, band_hash) buckets with more
    than ``max_bucket_size`` banded rows before any bucket join."""
    sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    return (
        banded.join(sizes, ["band_idx", "band_hash"])
        .where(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
    dedup_exact: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: documents sharing ≥1 identical band
    (band = hash of its rows of the MinHash signature).

    Output ``(a, b, n_bands)``. The join is an equi-join on
    ``(band_idx, band_hash)`` buckets — never all-pairs.
    ``hash_family`` as in :func:`minhash_signatures` — md5 (oracle-
    portable, default) or xxhash64 (throughput).

    Mega-bucket guards (the 100 TB hazard: millions of EXACT copies
    of boilerplate share every band, so one bucket's self-join goes
    quadratic):

    * ``dedup_exact=True`` bands ONE representative per exact-text
      group (min id — the same canonical :func:`exact_duplicates`
      and the star edges use), so candidate pairs are between
      representatives and a k-copy group contributes one banded row
      instead of k. Exact-copy pairs are recoverable in O(n) from
      :func:`exact_duplicates`; graph consumers
      (:func:`dedup_clusters`) get identical connectivity via the
      star edges.
    * ``max_bucket_size=N`` drops buckets with more than N banded
      rows from the self-join (bounding its output at N² per bucket).
      Lossy by design — audit what was dropped with
      :func:`lsh_overflow_buckets` (same banding, so the report is
      exact); a pair is only lost if EVERY band the two docs share
      overflows.
    """
    if dedup_exact:
        docs = exact_text_representatives(docs, id_col, text_col)
        id_col, text_col = "doc_id", "text"
    banded = _minhash_banded(
        docs, num_hashes, bands, n, id_col, text_col, hash_family
    )
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, max_bucket_size)
    a = banded.select(F.col("doc_id").alias("a"), "band_idx", "band_hash")
    b = banded.select(F.col("doc_id").alias("b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def lsh_overflow_buckets(
    docs: DataFrame,
    max_bucket_size: int,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
    dedup_exact: bool = False,
) -> DataFrame:
    """Audit report for ``max_bucket_size``: the buckets
    :func:`minhash_lsh_candidates` would DROP at that cap —
    ``(band_idx, band_hash, n_docs)``. Same banding parameters ⇒
    exact accounting of the recall loss surface."""
    if dedup_exact:
        docs = exact_text_representatives(docs, id_col, text_col)
        id_col, text_col = "doc_id", "text"
    banded = _minhash_banded(
        docs, num_hashes, bands, n, id_col, text_col, hash_family
    )
    return (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > max_bucket_size)
    )


def simhash(
    docs: DataFrame,
    bits: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash fingerprint per document: ``(doc_id, simhash)``.

    Token hash = first 12 hex chars of md5 (48 bits, positive in a
    long); bit b of the fingerprint is 1 iff the sum of ±1 votes over
    distinct tokens is positive. Pure expressions: explode tokens →
    per-bit votes → aggregate.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b)).otherwise(0)
    return votes.select("doc_id", out.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """EXACT Hamming-ball near-duplicate search over SimHash
    fingerprints: ``(a, b, hamming)`` for every pair with
    ``hamming(simhash_a, simhash_b) ≤ max_hamming``, a < b.

    Scale path — pigeonhole banding, never an all-pairs join: the
    ``bits``-wide fingerprint is split into ``max_hamming + 1``
    blocks; two fingerprints within Hamming distance d ≤ max_hamming
    differ in at most d blocks, so they must agree EXACTLY on at
    least one block (pigeonhole) — candidates come from a
    (block_idx, block_value) equi-join, then the exact
    ``bit_count(xor)`` filter keeps true matches. Unlike MinHash-LSH
    banding this is lossless: recall is exactly 1 at the stated
    radius.

    Selectivity scales with block width (≈ bits/(d+1)): 48 bits at
    d=3 gives 12-bit blocks (4096 values) — at billion-doc scale use
    64-bit fingerprints or smaller d so blocks stay ≥16 bits wide and
    bucket sizes stay bounded; skewed buckets (all-zeros fingerprints
    from empty docs) can be salted like any hot join key.

    ``fingerprints`` lets callers reuse a precomputed
    :func:`simhash` frame ``(doc_id, simhash)``.
    """
    if max_hamming < 0 or max_hamming >= bits:
        raise ValueError("0 <= max_hamming < bits required")
    sh = (
        fingerprints
        if fingerprints is not None
        else simhash(docs, bits, id_col, text_col)
    )
    n_blocks = max_hamming + 1
    base, rem = divmod(bits, n_blocks)
    widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    block_structs = [
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftright(F.col("simhash"), offsets[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .alias("val"),
        )
        for i in range(n_blocks)
    ]
    banded = sh.select(
        "doc_id", "simhash", F.explode(F.array(*block_structs)).alias("b")
    ).select("doc_id", "simhash", "b.blk", "b.val")
    left = banded.select(
        "blk", "val", F.col("doc_id").alias("a"), F.col("simhash").alias("sa")
    )
    right = banded.select(
        "blk", "val", F.col("doc_id").alias("b"), F.col("simhash").alias("sb")
    )
    dist = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
    return (
        left.join(right, ["blk", "val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", dist.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a", "b"])
    )


def verified_duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
    dedup_exact: bool = False,
) -> DataFrame:
    """LSH candidates verified by EXACT shingle Jaccard:
    ``(a, b, jaccard ≥ threshold)``.

    The quadratic all-pairs step never happens — exact Jaccard is an
    ``array_intersect`` over the two shingle arrays of CANDIDATE pairs
    only (LSH bounds the pair volume; per-doc shingle arrays ride the
    join instead of a re-exploded shingle⋈shingle shuffle).

    ``dedup_exact=True``: candidates and verified pairs are between
    exact-text REPRESENTATIVES (see :func:`minhash_lsh_candidates`) —
    the mega-bucket guard for heavily duplicated corpora.
    """
    cand = minhash_lsh_candidates(
        docs,
        num_hashes,
        bands,
        n,
        id_col,
        text_col,
        hash_family,
        dedup_exact=dedup_exact,
    ).select("a", "b")
    arr = docs.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, n).alias("shs")
    )
    a = arr.select(F.col("doc_id").alias("a"), F.col("shs").alias("sa"))
    b = arr.select(F.col("doc_id").alias("b"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    # candidates always have non-empty shingle sets (an empty set
    # yields no MinHash row, hence no candidate), so the union size
    # below is ≥ 1 — no ANSI divide-by-zero
    jac = inter / (F.size("sa") + F.size("sb") - inter)
    return (
        cand.join(a, "a")
        .join(b, "b")
        .select("a", "b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
    include_exact: bool = True,
    cc_rounds: int = 4,
    check_convergence: bool = True,
) -> DataFrame:
    """End-to-end near-duplicate clustering:
    ``(doc_id, cluster_id, is_canonical)`` for EVERY input document
    (singletons cluster with themselves).

    Pipeline: MinHash-LSH candidates → exact-Jaccard verification
    (:func:`verified_duplicate_pairs`) → optional exact-duplicate
    star edges (each doc linked to its text-hash group minimum — O(n)
    edges even for a billion-copy group, never a pairwise explosion;
    this also catches texts too short to shingle) → fixed-round
    hash-min connected components over the duplicate graph. The
    cluster id is the component label (the minimum doc id once
    ``cc_rounds`` covers the cluster diameter — near-dup clusters are
    dense, so a handful of rounds suffices and the unrolled SQL gate
    mirrors the same round count); the canonical document is the one
    whose id equals its cluster id.

    Mega-bucket guard: when ``include_exact`` is on, the LSH +
    verification stages run over exact-text REPRESENTATIVES only
    (``dedup_exact=True``) — a k-copy boilerplate group contributes
    ONE banded row instead of k, so no band bucket can go quadratic
    from exact duplication, and the star edges restore the identical
    final connectivity (every copy links to the representative the
    verified pairs are expressed in).

    Under-convergence is DETECTED, not assumed: one extra hash-min
    round runs after ``cc_rounds`` and a label change raises
    ``ValueError`` (a near-dup cluster with duplicate-graph diameter
    > cc_rounds would otherwise be silently split). Set
    ``check_convergence=False`` to skip the extra round.
    """
    from cminer_spark.operators.components import hashmin_components

    pair_e = verified_duplicate_pairs(
        docs,
        threshold,
        num_hashes,
        bands,
        n,
        id_col,
        text_col,
        hash_family,
        dedup_exact=include_exact,
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    if include_exact:
        eh = docs.select(
            F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h")
        )
        reps = eh.groupBy("h").agg(F.min("doc_id").alias("rep"))
        exact_e = (
            eh.join(reps, "h")
            .where(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("src"), F.col("doc_id").alias("dst"))
        )
        pair_e = pair_e.union(exact_e)
    comp = hashmin_components(
        pair_e,
        rounds=cc_rounds,
        vertices=docs.select(F.col(id_col).alias("v_id")),
        verify_converged=check_convergence,
    )
    return comp.select(
        F.col("v_id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("v_id") == F.col("component")).alias("is_canonical"),
    )


def band_corpus(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
) -> DataFrame:
    """The reusable MinHash band table of a corpus:
    ``(doc_id, band_idx, band_hash)``.

    This is the expensive half of cross-corpus dedup (profiled at
    sf0.1: banding the existing 587k-doc side is 8.4s of the 11.6s
    operator) and it is append-only per corpus version — compute it
    once, persist it (e.g. ``sources.tables.write_table``), and hand
    it to :func:`dedup_against` / :func:`lsh_candidates_against` as
    ``existing_bands`` for every subsequent daily delta. Parameters
    (``num_hashes``, ``bands``, ``n``, ``hash_family``) must match
    between banding and use — signatures are per-document, so the
    band table composes exactly across appends (union the delta's
    bands in after admission). Consumers validate the ``bands``
    invariant at use time (max band_idx == bands - 1); the other
    parameters are not recoverable from the table, so persist them
    next to it (e.g. in the table path or a sidecar) and check at
    load time."""
    return _minhash_banded(
        docs, num_hashes, bands, n, id_col, text_col, hash_family
    )


def lsh_candidates_against(
    existing: DataFrame,
    new: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
    broadcast_delta: bool = False,
    max_bucket_size: int | None = None,
    existing_bands: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus LSH candidates: ``(existing_id, new_id, n_bands)``
    where a NEW document shares ≥1 MinHash band with an EXISTING one.

    The incremental daily-ingest dedup path: only the delta is
    shingled/banded fresh, and the join stays an equi-join on
    ``(band_idx, band_hash)`` — new×new and existing×existing pairs
    are never generated. MinHash signatures are per-document, so
    banding each side separately is exact (no corpus-level state). At
    petabyte scale, compute the existing side's band table ONCE with
    :func:`band_corpus`, persist it (append-only), and pass it back as
    ``existing_bands`` — with ``broadcast_delta=True`` the existing
    corpus is then never re-read, re-shingled, or shuffled at all
    (same design as the incremental CC/triangle family).

    ``max_bucket_size=N`` is the mega-bucket guard (the same hazard
    :func:`minhash_lsh_candidates` documents, cross-corpus flavor:
    boilerplate shared by millions of EXISTING docs meets the same
    boilerplate in the delta → one bucket emits |E_b|·|N_b| pairs).
    Buckets whose EXISTING side exceeds N are dropped from the join,
    bounding output at N·|delta bands|. Lossy by design — a true dup
    is only missed if every shared band overflows; in a dedup_against
    composition an overflowing bucket almost always means the delta
    doc duplicates mega-boilerplate, which exact-dedup upstream
    catches cheaper.
    """
    if existing_bands is None:
        existing_bands = _minhash_banded(
            existing, num_hashes, bands, n, id_col, text_col, hash_family
        )
    else:
        # Drift guard: a band table built under a different `bands`
        # would produce band hashes that (near-)never collide with the
        # delta's, silently admitting every duplicate. Every banded doc
        # emits band_idx 0..bands-1, so one column-pruned max over the
        # persisted table catches the most likely config drift (cheap,
        # once per delta). num_hashes / n / hash_family drift is not
        # detectable from the table itself — persist those alongside
        # the band table (see band_corpus) and check at load time.
        mx_row = existing_bands.agg(F.max("band_idx").alias("mx")).first()
        mx = mx_row["mx"] if mx_row is not None else None
        if mx is not None and mx != bands - 1:
            raise ValueError(
                f"existing_bands was built with {mx + 1} bands per "
                f"document but this call uses bands={bands}; band "
                "hashes would never match. Re-band the corpus or pass "
                "the matching `bands`."
            )
    be = existing_bands.select(
        F.col("doc_id").alias("existing_id"), "band_idx", "band_hash"
    )
    if max_bucket_size is not None:
        be = _cap_buckets(be, max_bucket_size)
    bn = _minhash_banded(
        new, num_hashes, bands, n, id_col, text_col, hash_family
    ).select(F.col("doc_id").alias("new_id"), "band_idx", "band_hash")
    if broadcast_delta:
        bn = F.broadcast(bn)
    return (
        be.join(bn, ["band_idx", "band_hash"])
        .groupBy("existing_id", "new_id")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def dedup_against(
    existing: DataFrame,
    new: DataFrame,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
    broadcast_delta: bool = False,
    max_bucket_size: int | None = None,
    existing_bands: DataFrame | None = None,
) -> DataFrame:
    """New documents that survive cross-corpus near-dup filtering:
    ``(doc_id, n_lsh_candidates)`` — the delta rows admitted into the
    corpus after LSH candidate generation + exact shingle-Jaccard
    verification against the existing side (a new doc is dropped iff
    some existing doc verifies at ``jaccard >= threshold``).

    Verification joins shingle sets ONLY for candidate pairs (semi-
    joined to the candidate ids), mirroring :func:`dedup_clusters`'s
    verify stage; survivors come back via one anti-join, so the
    existing corpus is touched exactly once (banding) plus candidate
    shingles.
    """
    from cminer_spark.plans.checkpoint import truncate_lineage

    # Materialize the candidate-pair table once: it feeds FOUR
    # downstream consumers (both semi-joins, the intersection join and
    # the per-new-id candidate count), and without a lineage cut each
    # consumer re-runs the full existing-corpus banding — profiled at
    # sf0.1 as ~60% of the operator's wall-clock. cands is small by
    # construction (band collisions, further bounded by
    # max_bucket_size), so the cut is cheap.
    cands = truncate_lineage(
        lsh_candidates_against(
            existing, new, num_hashes, bands, n, id_col, text_col,
            hash_family, broadcast_delta, max_bucket_size,
            existing_bands=existing_bands,
        )
    )
    # Same for the candidate-only shingle tables: each is consumed
    # twice (set size + intersection), and the semi-join filter runs
    # AFTER the corpus-wide explode, so re-evaluation would re-shingle
    # the whole corpus.
    she = truncate_lineage(
        existing.select(
            F.col(id_col).alias("existing_id"),
            F.explode(shingles(text_col, n)).alias("s"),
        ).join(cands.select("existing_id").distinct(), "existing_id", "semi")
    )
    shn = truncate_lineage(
        new.select(
            F.col(id_col).alias("new_id"),
            F.explode(shingles(text_col, n)).alias("s"),
        ).join(cands.select("new_id").distinct(), "new_id", "semi")
    )
    sizes_e = she.groupBy("existing_id").agg(F.count(F.lit(1)).alias("na"))
    sizes_n = shn.groupBy("new_id").agg(F.count(F.lit(1)).alias("nb"))
    # equi-join on (new_id, s): only matching shingles materialize
    inter = (
        cands.join(she, "existing_id")
        .join(shn, ["new_id", "s"])
        .groupBy("existing_id", "new_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    dups = (
        inter.join(sizes_e, "existing_id")
        .join(sizes_n, "new_id")
        .where(
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
            >= threshold
        )
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    n_cands = cands.groupBy(F.col("new_id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lsh_candidates")
    )
    return (
        new.select(F.col(id_col).alias("doc_id"))
        .join(dups, "doc_id", "anti")
        .join(n_cands, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lsh_candidates", F.lit(0)).cast("long").alias(
                "n_lsh_candidates"
            ),
        )
    )
