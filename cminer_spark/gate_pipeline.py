"""Gate queries + DuckDB oracles for the training-data pipeline
operators (dedup, similarity search, text analysis).

Oracles here are DuckDB-dialect SQL (they only ever run on DuckDB);
both engines agree because every hash is md5 over identical strings
and every float output is rounded. Int-valued outputs are cast to
BIGINT on the Spark side to match DuckDB's count/length types.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cminer_spark.pipeline import (
    brute_force_cosine_topk,
    dedup_clusters,
    lsh_bucketed_topk,
    exact_duplicates,
    doc_fingerprint,
    language_id,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    quality_stats,
    simhash,
    token_counts,
)
from cminer_spark.pipeline.ranking import bm25_search, tfidf_top_terms
from cminer_spark.pipeline.textstats import repetition_stats

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10
ANN_DIM = 64
ANN_LSH_PLANES = 4
ANN_LSH_TABLES = 4
ANN_IVF_CENTROIDS = 8
ANN_IVF_PROBE = 3
# sf0.01 synth embeddings carry no true near-duplicates (max pairwise
# cosine ≈ 0.51), so the gate thresholds at the top of the observed
# similarity range — it checks the bucket→score→filter pipeline, not
# recall (recall on planted dups is pytest-checked, test_pipeline.py)
NEARDUP_THRESHOLD = 0.35
JACCARD_THRESHOLD = 0.2
MINHASH_HASHES = 16
MINHASH_BANDS = 4
SIMHASH_BITS = 48
SIMHASH_NEARDUP_HAMMING = 2
DEDUP_CC_ROUNDS = 4
# "dup" is rare (df≈25/500 at sf0.01) vs the common terms — the gate
# exercises a real idf spread, not near-constant weights
BM25_QUERY = ("dup", "spark", "join")
BM25_K = 15
TFIDF_K = 3
SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = 7
PACK_MAX_TOKENS = 120
PACK_GROUPS = 7
QUOTA_N = 20
DECONTAM_NGRAM = 8
# exact-substring span dedup (Lee et al. 2021): 8-token grams hit a
# real duplicated-passage population in the synth docs (47/500 docs
# at sf0.01) without collapsing to whole-doc dup detection
SPAN_NGRAM = 8
SPAN_MIN_COUNT = 2


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ----------------------------------------------------------------------
# spark-side queries
# ----------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf_dir)).select(
        "text_hash", "canonical_id", "n_copies"
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = minhash_lsh_candidates(
        _docs(spark, sf_dir), num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS
    )
    return out.select("a", "b", F.col("n_bands").cast("long").alias("n_bands"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir), bits=SIMHASH_BITS)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.dedup import simhash_near_dups

    return simhash_near_dups(
        _docs(spark, sf_dir),
        max_hamming=SIMHASH_NEARDUP_HAMMING,
        bits=SIMHASH_BITS,
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup_clusters(
        _docs(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS,
        include_exact=True,
        cc_rounds=DEDUP_CC_ROUNDS,
    )
    return out.select("doc_id", "cluster_id", "is_canonical")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = brute_force_cosine_topk(_embs(spark, sf_dir), ANN_QUERY_IDS, k=ANN_K)
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE ANN path (multi-table sign-LSH bucket join + exact
    re-rank) under the oracle gate: the DuckDB side replicates the
    same md5-derived hyperplanes, bucket assignment, candidate union
    and re-rank, so outputs match exactly (this checks the pipeline,
    not recall — recall vs brute force is pytest-checked)."""
    out = lsh_bucketed_topk(
        _embs(spark, sf_dir),
        ANN_QUERY_IDS,
        k=ANN_K,
        dim=ANN_DIM,
        n_planes=ANN_LSH_PLANES,
        n_tables=ANN_LSH_TABLES,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF ANN path (coarse-quantize → cluster equi-join probe →
    exact re-rank) under the oracle gate, using the UNTRAINED
    md5-derived centroids so DuckDB can replicate them as literal
    constants (this checks the quantize/probe/re-rank pipeline; the
    TRAINED k-means quality is pytest-checked — recall + the
    n_probe == n_centroids exactness property)."""
    from cminer_spark.pipeline.similarity import ivf_topk, pseudo_random_centroids

    out = ivf_topk(
        _embs(spark, sf_dir),
        ANN_QUERY_IDS,
        k=ANN_K,
        centroids=pseudo_random_centroids(ANN_DIM, ANN_IVF_CENTROIDS),
        n_probe=ANN_IVF_PROBE,
    )
    return out.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine"
    )


def q_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table LSH embedding near-duplicates (the 100 TB near-dup
    scale path: bucket equi-join, never all-pairs) under the oracle
    gate — same inlined-hyperplane replication trick as ann_lsh."""
    from cminer_spark.pipeline.similarity import cosine_near_duplicates

    return cosine_near_duplicates(
        _embs(spark, sf_dir),
        threshold=NEARDUP_THRESHOLD,
        dim=ANN_DIM,
        n_planes=ANN_LSH_PLANES,
    )


def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup clustering (near-dup pairs transitively closed by
    fixed-round hash-min components) under the oracle gate."""
    from cminer_spark.pipeline.similarity import embedding_dedup_clusters

    out = embedding_dedup_clusters(
        _embs(spark, sf_dir),
        threshold=NEARDUP_THRESHOLD,
        dim=ANN_DIM,
        n_planes=ANN_LSH_PLANES,
        cc_rounds=DEDUP_CC_ROUNDS,
    )
    return out.select("vec_id", "cluster_id", "is_canonical")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal Arrow kernel end-to-end on driver data: documents →
    deterministic binary payloads → mapInPandas feature extraction.
    The gate compares (media_id, kind, n_bytes); the 16-d feature
    vector math is pytest-checked (not SQL-expressible byte-wise)."""
    from cminer_spark.pipeline.multimodal import extract_features

    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
    )
    out = extract_features(media, fake=True)
    return out.select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes")
    )


FRAME_SAMPLE_MS = 700


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational video frame-sampling plan (multimodal): one row per
    sampled timestamp per video row, pure sequence-explode — no
    Python anywhere."""
    from cminer_spark.pipeline.multimodal import frame_sample_plan

    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (1000 + (F.col("doc_id") % 50) * 37).cast("int").alias("duration_ms"),
            F.lit("h264").alias("codec"),
        ).alias("meta"),
    )
    out = frame_sample_plan(media, every_ms=FRAME_SAMPLE_MS)
    return out.select("media_id", F.col("sample_ms").cast("long").alias("sample_ms"))


FRAME_SAMPLE_SQL = f"""
SELECT doc_id AS media_id,
       unnest(generate_series(0, 1000 + (doc_id % 50) * 37, {FRAME_SAMPLE_MS})) AS sample_ms
FROM documents
WHERE doc_id % 3 = 2
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = token_counts(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        F.col("n_chars_seen").cast("long").alias("n_chars_seen"),
        F.col("n_subword_est").cast("long").alias("n_subword_est"),
    )


def q_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = quality_stats(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_word_len",
        "stopword_ratio",
        "non_alpha_ratio",
        "repetition_ratio",
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = language_id(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "lang_pred", F.col("lang_score").cast("long").alias("lang_score")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(_docs(spark, sf_dir))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_search(
        _docs(spark, sf_dir), list(BM25_QUERY), k=BM25_K
    ).select("doc_id", "score", F.col("rank").cast("long").alias("rank"))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_docs(spark, sf_dir), k=TFIDF_K).select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        "tfidf",
        F.col("term_rank").cast("long").alias("term_rank"),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(_docs(spark, sf_dir))


def q_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.curation import deterministic_split

    return deterministic_split(
        _docs(spark, sf_dir), SPLIT_WEIGHTS, seed=SPLIT_SEED
    ).select("doc_id", "split")


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.curation import quota_sample

    return quota_sample(
        _docs(spark, sf_dir), "source", n=QUOTA_N, seed=SPLIT_SEED
    ).select("doc_id", "source")


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing on the documents table — every
    column is an exact integer, so the oracle match is bit-exact."""
    from cminer_spark.pipeline.packing import pack_sequences

    out = pack_sequences(
        _docs(spark, sf_dir),
        max_tokens=PACK_MAX_TOKENS,
        groups=PACK_GROUPS,
        seed=SPLIT_SEED,
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("pack_group").cast("long").alias("pack_group"),
        F.col("bin_idx").cast("long").alias("bin_idx"),
        F.col("bin_id").cast("long").alias("bin_id"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.curation import decontaminate

    docs = _docs(spark, sf_dir)
    eval_docs = docs.where(F.col("doc_id") % 10 == 0)
    return decontaminate(
        docs, eval_docs, n=DECONTAM_NGRAM, mark_only=True
    ).select("doc_id", "contaminated")


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

def _shingles_cte(src: str = "documents") -> str:
    return f"""
toks AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS t FROM {src}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
  FROM toks, UNNEST(CASE WHEN len(t) >= 3 THEN range(1, len(t) - 1)
                         ELSE [] END) AS u(i)
)
"""


_SHINGLES_CTE = _shingles_cte()

NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s
  WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b,
       round(CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.a = sa.doc_id
JOIN sizes sb ON i.b = sb.doc_id
WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= {JACCARD_THRESHOLD}
"""


def _lsh_ctes(src: str = "documents") -> str:
    """Shared CTE chain shingles→signatures→bands→band rows (DuckDB),
    mirroring :func:`minhash_signatures` + banding with the md5 family.
    ``src`` lets the dedup_clusters oracle band exact-text
    representatives instead of raw documents."""
    hashes = ", ".join(
        f"min(md5('{i}|' || s)) AS h{i}" for i in range(MINHASH_HASHES)
    )
    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    bands = ", ".join(
        "md5("
        + " || '|' || ".join(
            f"h{bi * rows_per_band + r}" for r in range(rows_per_band)
        )
        + f") AS band{bi}"
        for bi in range(MINHASH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, band{bi} AS band_hash FROM banded"
        for bi in range(MINHASH_BANDS)
    )
    return f"""{_shingles_cte(src)},
sigs AS (SELECT doc_id, {hashes} FROM sh GROUP BY doc_id),
banded AS (SELECT doc_id, {bands} FROM sigs),
bandrows AS ({band_rows})"""


def minhash_lsh_oracle_sql() -> str:
    return f"""
WITH {_lsh_ctes()}
SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_bands
FROM bandrows x JOIN bandrows y
  ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
WHERE x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
"""


def dedup_clusters_oracle_sql(
    threshold: float, cc_rounds: int
) -> str:
    """Rep-level LSH candidates → exact-Jaccard verification →
    exact-duplicate star edges → ``cc_rounds`` unrolled hash-min
    components (same fixed-round grain as the Spark side, so results
    match exactly). Mirrors the Spark side's mega-bucket guard: the
    banding/verification CTEs run over one representative per
    exact-text group (min doc_id), with the star edges restoring
    member connectivity."""
    parts = [
        f"""
WITH repdocs AS (
  SELECT min(doc_id) AS doc_id, any_value(text) AS text
  FROM documents GROUP BY md5(text)
),
{_lsh_ctes("repdocs")},
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandrows x JOIN bandrows y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
  WHERE x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.s = x.s
  GROUP BY c.a, c.b
),
ver AS (
  SELECT i.a, i.b
  FROM inter i
  JOIN sizes sa ON i.a = sa.doc_id
  JOIN sizes sb ON i.b = sb.doc_id
  WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= {threshold}
),
star AS (
  SELECT r.rep AS a, d.doc_id AS b
  FROM documents d
  JOIN (SELECT md5(text) AS h, min(doc_id) AS rep
        FROM documents GROUP BY md5(text)) r
    ON md5(d.text) = r.h
  WHERE d.doc_id <> r.rep
),
alle AS (SELECT a, b FROM ver UNION SELECT a, b FROM star),
sym AS (
  SELECT a AS u, b AS v FROM alle WHERE a <> b
  UNION
  SELECT b AS u, a AS v FROM alle WHERE a <> b
),
verts AS (SELECT doc_id AS v FROM documents),
l0 AS (SELECT v AS v_id, v AS component FROM verts)"""
    ]
    for i in range(1, cc_rounds + 1):
        parts.append(
            f""",
mn{i} AS (SELECT s.v AS v_id, min(x.component) AS m
          FROM sym s JOIN l{i-1} x ON s.u = x.v_id GROUP BY s.v),
l{i} AS (SELECT l.v_id, least(l.component, coalesce(mn.m, l.component)) AS component
         FROM l{i-1} l LEFT JOIN mn{i} mn ON l.v_id = mn.v_id)"""
        )
    parts.append(
        f"""
SELECT v_id AS doc_id, component AS cluster_id,
       v_id = component AS is_canonical
FROM l{cc_rounds}"""
    )
    return "".join(parts)


def _simhash_ctes() -> str:
    """Shared CTE chain ending in ``sh(doc_id, simhash)`` — the DuckDB
    replica of :func:`cminer_spark.pipeline.dedup.simhash`."""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    recon = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
toks AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(lower(text), ' +')) AS tok
  FROM documents
),
hashed AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS h FROM toks
),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
sh AS (SELECT doc_id, {recon} AS simhash FROM votes)"""


def simhash_oracle_sql() -> str:
    return f"WITH {_simhash_ctes()}\nSELECT doc_id, simhash FROM sh"


def simhash_neardup_oracle_sql(max_hamming: int = 2) -> str:
    """Brute-force all-pairs Hamming check over the simhash CTE — the
    strongest possible oracle for the pigeonhole banding path: any
    pair the banding misses (recall < 1) or hallucinates shows up as
    a row diff."""
    return f"""
WITH {_simhash_ctes()}
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def ann_topk_oracle_sql() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    return f"""
WITH exp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS query_id, b.vec_id, sum(q.x * b.x) AS dot
  FROM exp q JOIN exp b ON q.i = b.i
  WHERE q.vec_id IN ({ids}) AND b.vec_id <> q.vec_id
  GROUP BY q.vec_id, b.vec_id
),
scored AS (
  SELECT d.query_id, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.vec_id
)
SELECT query_id, rank, vec_id, round(cosine, 6) AS cosine
FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {ANN_K}
"""


def ann_lsh_oracle_sql() -> str:
    """DuckDB replica of :func:`lsh_bucketed_topk`: the md5-derived
    hyperplanes are deterministic Python constants (similarity.
    _hyperplane) inlined as literal rows; bucket = Σ 2^p over planes
    whose ROUNDED dot (9 dp, matching the engine's cross-engine-stable
    sign test) is ≥ 0; candidates = same-(table, bucket) union;
    cosine re-rank identical to the brute-force oracle."""
    from cminer_spark.pipeline.similarity import _hyperplane

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    plane_rows = []
    for t in range(ANN_LSH_TABLES):
        for p in range(ANN_LSH_PLANES):
            vals = _hyperplane(ANN_DIM, p, t)
            for d, val in enumerate(vals):
                plane_rows.append(f"({t}, {p}, {d + 1}, {val!r})")
    planes_values = ",\n".join(plane_rows)
    return f"""
WITH exp AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
planes AS MATERIALIZED (
  SELECT * FROM (VALUES
{planes_values}
  ) pl(t, p, i, val)
),
bdot AS MATERIALIZED (
  SELECT e.vec_id, pl.t, pl.p, sum(e.x * pl.val) AS dot
  FROM exp e JOIN planes pl ON e.i = pl.i
  GROUP BY e.vec_id, pl.t, pl.p
),
buckets AS MATERIALIZED (
  SELECT vec_id, t,
         CAST(sum(CASE WHEN round(dot, 9) >= 0 THEN power(2, p) ELSE 0 END) AS BIGINT) AS b
  FROM bdot GROUP BY vec_id, t
),
qb AS (SELECT vec_id AS query_id, t, b FROM buckets WHERE vec_id IN ({ids})),
cand AS MATERIALIZED (
  SELECT DISTINCT qb.query_id, bu.vec_id
  FROM qb JOIN buckets bu ON qb.t = bu.t AND qb.b = bu.b
  WHERE bu.vec_id <> qb.query_id
),
norms AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
dots AS MATERIALIZED (
  SELECT c.query_id, c.vec_id, sum(q.x * b.x) AS dot
  FROM cand c
  JOIN exp q ON q.vec_id = c.query_id
  JOIN exp b ON b.vec_id = c.vec_id AND b.i = q.i
  GROUP BY c.query_id, c.vec_id
),
scored AS (
  SELECT d.query_id, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.vec_id
)
SELECT query_id, rank, vec_id, round(cosine, 6) AS cosine
FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {ANN_K}
"""


def ann_ivf_oracle_sql() -> str:
    """DuckDB replica of :func:`ivf_topk` with the untrained
    md5-derived centroids inlined as literal rows. Assignment = the
    cluster with the max ROUNDED (6 dp) dot, ties to the LARGER
    cluster id (matching ``ivf_assign``'s ``array_max`` over
    ``struct(d, c)``); probes = the ``ANN_IVF_PROBE`` best clusters
    per query under the same ordering; candidates = cluster equi-join;
    re-rank identical to the brute-force oracle."""
    from cminer_spark.pipeline.similarity import pseudo_random_centroids

    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cent_rows = []
    for c, vec in enumerate(pseudo_random_centroids(ANN_DIM, ANN_IVF_CENTROIDS)):
        for d, val in enumerate(vec):
            cent_rows.append(f"({c}, {d + 1}, {val!r})")
    cent_values = ",\n".join(cent_rows)
    return f"""
WITH exp AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS MATERIALIZED (
  SELECT * FROM (VALUES
{cent_values}
  ) ct(c, i, val)
),
cdot AS MATERIALIZED (
  SELECT e.vec_id, ct.c, round(sum(e.x * ct.val), 6) AS d
  FROM exp e JOIN cent ct ON e.i = ct.i
  GROUP BY e.vec_id, ct.c
),
assign AS MATERIALIZED (
  SELECT vec_id, c AS cl FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c DESC) AS rn
    FROM cdot
  ) t WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, c AS cl FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c DESC) AS rn
    FROM cdot WHERE vec_id IN ({ids})
  ) t WHERE rn <= {ANN_IVF_PROBE}
),
cand AS MATERIALIZED (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON p.cl = a.cl
  WHERE a.vec_id <> p.query_id
),
norms AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
dots AS MATERIALIZED (
  SELECT c.query_id, c.vec_id, sum(q.x * b.x) AS dot
  FROM cand c
  JOIN exp q ON q.vec_id = c.query_id
  JOIN exp b ON b.vec_id = c.vec_id AND b.i = q.i
  GROUP BY c.query_id, c.vec_id
),
scored AS (
  SELECT d.query_id, d.vec_id, d.dot / (nq.nrm * nb.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.vec_id
)
SELECT query_id, rank, vec_id, round(cosine, 6) AS cosine
FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {ANN_K}
"""


def neardup_oracle_sql() -> str:
    """DuckDB replica of :func:`cosine_near_duplicates`: single-table
    (t=0) sign-LSH buckets from the same inlined md5-derived
    hyperplanes; pairs share a bucket, threshold on round(cosine, 9)
    exactly as the engine does."""
    from cminer_spark.pipeline.similarity import _hyperplane

    plane_rows = []
    for p in range(ANN_LSH_PLANES):
        vals = _hyperplane(ANN_DIM, p, 0)
        for d, val in enumerate(vals):
            plane_rows.append(f"({p}, {d + 1}, {val!r})")
    planes_values = ",\n".join(plane_rows)
    return f"""
WITH exp AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
planes AS MATERIALIZED (
  SELECT * FROM (VALUES
{planes_values}
  ) pl(p, i, val)
),
bdot AS MATERIALIZED (
  SELECT e.vec_id, pl.p, sum(e.x * pl.val) AS dot
  FROM exp e JOIN planes pl ON e.i = pl.i
  GROUP BY e.vec_id, pl.p
),
buckets AS MATERIALIZED (
  SELECT vec_id,
         CAST(sum(CASE WHEN round(dot, 9) >= 0 THEN power(2, p) ELSE 0 END) AS BIGINT) AS b
  FROM bdot GROUP BY vec_id
),
norms AS MATERIALIZED (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
cand AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM buckets x JOIN buckets y ON x.b = y.b AND x.vec_id < y.vec_id
),
dots AS MATERIALIZED (
  SELECT c.a, c.b, sum(xa.x * xb.x) AS dot
  FROM cand c
  JOIN exp xa ON xa.vec_id = c.a
  JOIN exp xb ON xb.vec_id = c.b AND xb.i = xa.i
  GROUP BY c.a, c.b
)
SELECT a, b, round(cosine, 6) AS cosine
FROM (
  SELECT d.a, d.b, d.dot / (na.nrm * nb.nrm) AS cosine
  FROM dots d
  JOIN norms na ON na.vec_id = d.a
  JOIN norms nb ON nb.vec_id = d.b
) s
WHERE round(cosine, 9) >= {NEARDUP_THRESHOLD}
"""


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS kind,
       octet_length(encode(coalesce(text, ''))) AS n_bytes
FROM documents
"""


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(string_split_regex(text, ' +')) AS n_tokens,
       len(list_distinct(string_split_regex(text, ' +'))) AS n_distinct_tokens,
       length(text) AS n_chars_seen,
       CAST(ceil(length(regexp_replace(text, ' ', '', 'g')) / 4.0) AS BIGINT) AS n_subword_est
FROM documents
"""

_STOPWORDS_SQL = "['the','a','of','and','to','in','is','it','that','for']"

QUALITY_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), ' +') AS toks
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_tokens,
       round(length(regexp_replace(text, ' ', '', 'g')) / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
       round(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
       round((length(text) - length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))) / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS non_alpha_ratio,
       round((len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE), 6) AS repetition_ratio
FROM t
"""


def embedding_clusters_oracle_sql(cc_rounds: int) -> str:
    """Near-dup pair query (nested CTE) + ``cc_rounds`` unrolled
    hash-min components over all embedding ids — the exact fixed-round
    grain of the Spark side."""
    parts = [
        f"""
WITH pairs AS MATERIALIZED ({neardup_oracle_sql()}),
sym AS (
  SELECT a AS u, b AS v FROM pairs WHERE a <> b
  UNION
  SELECT b AS u, a AS v FROM pairs WHERE a <> b
),
verts AS (SELECT vec_id AS v FROM embeddings),
l0 AS (SELECT v AS v_id, v AS component FROM verts)"""
    ]
    for i in range(1, cc_rounds + 1):
        parts.append(
            f""",
mn{i} AS (SELECT s.v AS v_id, min(x.component) AS m
          FROM sym s JOIN l{i-1} x ON s.u = x.v_id GROUP BY s.v),
l{i} AS (SELECT l.v_id, least(l.component, coalesce(mn.m, l.component)) AS component
         FROM l{i-1} l LEFT JOIN mn{i} mn ON l.v_id = mn.v_id)"""
        )
    parts.append(
        f"""
SELECT v_id AS vec_id, component AS cluster_id,
       v_id = component AS is_canonical
FROM l{cc_rounds}"""
    )
    return "".join(parts)


def language_id_oracle_sql() -> str:
    from cminer_spark.pipeline.textstats import LANG_MARKERS

    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        lst = "[" + ",".join(f"'{m}'" for m in markers) + "]"
        score_cols.append(
            f"len(list_filter(toks, x -> list_contains({lst}, x))) AS s_{lang}"
        )
    langs = sorted(LANG_MARKERS)  # alphabetical = smallest-code tie-break
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pred = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lg in langs:
        pred += f"WHEN s_{lg} = {best} THEN '{lg}' "
    pred += "END"
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS toks FROM documents
),
scored AS (SELECT doc_id, {", ".join(score_cols)} FROM t)
SELECT doc_id, {pred} AS lang_pred, {best} AS lang_score FROM scored
"""


DOC_FINGERPRINT_SQL = f"""
WITH {_SHINGLES_CTE}
SELECT d.doc_id,
       md5(regexp_replace(lower(d.text), ' +', ' ', 'g')) AS content_hash,
       m.rf AS rolling_fingerprint
FROM documents d
LEFT JOIN (SELECT doc_id, min(md5(s)) AS rf FROM sh GROUP BY doc_id) m
  ON d.doc_id = m.doc_id
"""


def bm25_oracle_sql(
    query=BM25_QUERY, k=BM25_K, k1: float = 1.2, b: float = 0.75
) -> str:
    qlist = "[" + ",".join(f"'{t}'" for t in sorted(set(query))) + "]"
    return f"""
WITH base AS (
  SELECT doc_id,
         len(string_split_regex(lower(text), ' +')) AS dl,
         list_filter(string_split_regex(lower(text), ' +'),
                     x -> list_contains({qlist}, x)) AS hits
  FROM documents
), corpus AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM (
    SELECT doc_id, dl, unnest(hits) AS term FROM base
  ) GROUP BY doc_id, dl, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT t.doc_id,
         round(sum(
           ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({k1} + 1))
           / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / c.avgdl))
         ), 6) AS score
  FROM tf t JOIN df d USING (term) CROSS JOIN corpus c
  GROUP BY t.doc_id
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def tfidf_oracle_sql(k=TFIDF_K) -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS term
    FROM documents
  ) WHERE term <> '' GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf t JOIN df d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, term_rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS term_rank
  FROM scored
) WHERE term_rank <= {k}
"""


REPETITION_STATS_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS toks
  FROM documents
), uni AS (
  SELECT doc_id,
         sum(c) AS n_tok, max(c) AS top_c,
         sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup_chars,
         sum(c * length(g)) AS tok_chars
  FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id, unnest(toks) AS g FROM t
    ) WHERE g <> '' GROUP BY doc_id, g
  ) GROUP BY doc_id
), bi AS (
  SELECT doc_id,
         sum(c) AS n_bi,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_bi
  FROM (
    SELECT doc_id, bg, count(*) AS c FROM (
      SELECT doc_id,
             unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
      FROM t
    ) GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT u.doc_id,
       round(u.top_c / CAST(greatest(u.n_tok, 1) AS DOUBLE), 6)
         AS top_token_fraction,
       round(u.dup_chars / CAST(greatest(u.tok_chars, 1) AS DOUBLE), 6)
         AS dup_token_char_fraction,
       round(coalesce(b.dup_bi, 0) / CAST(greatest(coalesce(b.n_bi, 0), 1) AS DOUBLE), 6)
         AS dup_bigram_fraction
FROM uni u LEFT JOIN bi b USING (doc_id)
"""


_SPLIT_HASH_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{seed}'), 1, 8) "
    "AS BIGINT) / 4294967296.0"
)


def seq_pack_oracle_sql(
    max_tokens=PACK_MAX_TOKENS, groups=PACK_GROUPS, seed=SPLIT_SEED
) -> str:
    """Mirror of pipeline.packing.pack_sequences: same md5 group/order
    key (split_hash convention), same start-bin window arithmetic."""
    h = _SPLIT_HASH_SQL.format(seed=seed)
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || ':{seed}') AS full_h,
         {h} AS h
  FROM documents
), g AS (
  SELECT doc_id, n_tokens, full_h,
         CAST(floor(h * {groups}) AS BIGINT) AS pack_group
  FROM base
), c AS (
  SELECT doc_id, n_tokens, pack_group,
         CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY pack_group ORDER BY full_h ASC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / {max_tokens}) AS BIGINT) AS bin_idx
  FROM g
)
SELECT doc_id, n_tokens, pack_group, bin_idx,
       pack_group + {groups} * bin_idx AS bin_id
FROM c
"""


def split_oracle_sql(weights=SPLIT_WEIGHTS, seed=SPLIT_SEED) -> str:
    h = _SPLIT_HASH_SQL.format(seed=seed)
    names = list(weights)
    acc, cases = 0.0, []
    for name in names[:-1]:
        acc += weights[name]
        cases.append(f"WHEN h < {acc!r} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"""
SELECT doc_id, {case} AS split
FROM (SELECT doc_id, {h} AS h FROM documents)
"""


def quota_oracle_sql(n=QUOTA_N, seed=SPLIT_SEED) -> str:
    h = _SPLIT_HASH_SQL.format(seed=seed)
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source ORDER BY {h} ASC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= {n}
"""


def decontam_oracle_sql(n=DECONTAM_NGRAM) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS t FROM documents
), eg AS (
  SELECT DISTINCT array_to_string(t[i:i+{n - 1}], ' ') AS g
  FROM toks, UNNEST(CASE WHEN len(t) >= {n} THEN range(1, len(t) - {n - 2})
                         ELSE [] END) AS u(i)
  WHERE doc_id % 10 = 0
), dg AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS g
  FROM toks, UNNEST(CASE WHEN len(t) >= {n} THEN range(1, len(t) - {n - 2})
                         ELSE [] END) AS u(i)
), hits AS (
  SELECT DISTINCT doc_id FROM dg JOIN eg USING (g)
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# ----------------------------------------------------------------------
# PII redaction — the sf documents carry no real PII, so the gate
# plants it deterministically with a PORTABLE CTE (identical text on
# Spark and DuckDB), then checks the full regex redaction + counting
# pipeline over every row.
# ----------------------------------------------------------------------

PII_DOCS_CTE = """
pii_docs AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS STRING)
              || '@ex' || CAST(doc_id % 5 AS STRING) || '.com'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
                      ELSE '' END
              || CASE WHEN doc_id % 3 = 1
                      THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0')
                           || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
                      ELSE '' END
              || CASE WHEN doc_id % 4 = 0
                      THEN ' from 10.' || CAST(doc_id % 256 AS STRING) || '.0.1'
                      ELSE '' END AS text
  FROM documents
)
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.redact import redact_pii

    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    docs = spark.sql(f"WITH {PII_DOCS_CTE} SELECT doc_id, text FROM pii_docs")
    out = redact_pii(docs)
    return out.select(
        "doc_id",
        F.col("text_redacted"),
        *[F.col(c).cast("long").alias(c) for c in
          ("n_email", "n_ssn", "n_phone", "n_ipv4", "n_pii")],
    )


def redact_oracle_sql() -> str:
    from cminer_spark.pipeline.redact import redact_sql_exprs

    red, counts = redact_sql_exprs("text")
    count_cols = ",\n       ".join(f"{e} AS n_{k}" for k, e in counts)
    total = " + ".join(e for _, e in counts)
    return f"""
WITH {PII_DOCS_CTE}
SELECT doc_id,
       {red} AS text_redacted,
       {count_cols},
       {total} AS n_pii
FROM pii_docs
"""


# deterministically "messy" documents for the normalization gate:
# upper-cased + trailing runs, tab/CRLF framing, doubled spaces,
# embedded control chars — all portable expressions (chr() both
# engines). NOTE the normalize step order matters cross-engine: the
# controls pass strips \x0b BEFORE the \s+ collapse, because Java \s
# matches vertical tab and RE2's does not.
MESSY_DOCS_CTE = """
messy AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN upper(text) || '   trailing  '
           WHEN 1 THEN chr(9) || text || chr(13) || chr(10)
           WHEN 2 THEN replace(text, ' ', '  ')
           ELSE chr(7) || text || chr(11)
         END AS text
  FROM documents
)
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.curation import normalize_text

    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    messy = spark.sql(f"WITH {MESSY_DOCS_CTE} SELECT doc_id, text FROM messy")
    return normalize_text(messy).select("doc_id", "text_norm")


def normalize_oracle_sql() -> str:
    from cminer_spark.pipeline.curation import normalize_sql_expr

    return f"""
WITH {MESSY_DOCS_CTE}
SELECT doc_id, {normalize_sql_expr('text')} AS text_norm FROM messy
"""


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flattened to one row per (vector, position): the driver
    # canonicalizer sorts result columns through pandas, which cannot
    # hash array cells (round-4 red: "unhashable type: 'list'"), so
    # gate outputs must be scalar-only. The operator itself still
    # returns array<tinyint>; this posexplode is gate shaping.
    from cminer_spark.pipeline.quantize import quantize_embeddings

    out = quantize_embeddings(_embs(spark, sf_dir))
    return out.select(
        "vec_id",
        F.round("q_scale", 6).alias("q_scale"),
        F.posexplode("q").alias("pos", "code"),
    ).select(
        "vec_id",
        "q_scale",
        F.col("pos").cast("long").alias("pos"),
        F.col("code").cast("long").alias("code"),
    )


QUANTIZE_SQL = """
SELECT vec_id,
       round(s, 6) AS q_scale,
       CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS pos,
       CAST(unnest(q) AS BIGINT) AS code
FROM (
  SELECT vec_id, s,
         CASE WHEN s = 0
              THEN list_transform(embedding, e -> CAST(0 AS TINYINT))
              ELSE list_transform(
                embedding,
                e -> CAST(greatest(-127, least(127,
                       CAST(round(CAST(e AS DOUBLE) / s * 127.0) AS INT)
                     )) AS TINYINT))
         END AS q
  FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding,
                                   e -> abs(CAST(e AS DOUBLE)))) AS s
    FROM embeddings
  )
)
"""


RP_OUT_DIM = 8
RP_SEED = 17


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flattened to (vec_id, pos, val) scalar rows for the driver
    # canonicalizer — see q_quantize_int8. The operator still returns
    # array<double>.
    from cminer_spark.pipeline.projection import random_projection

    out = random_projection(
        _embs(spark, sf_dir), out_dim=RP_OUT_DIM, seed=RP_SEED
    )
    return out.select(
        "vec_id", F.posexplode("projected").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.round("val", 6).alias("val"),
    )


def projection_oracle_sql() -> str:
    from cminer_spark.pipeline.projection import projection_sign_sql

    # DuckDB lambda index i is 1-based -> shift to 0-based for the sign
    comps = ",\n         ".join(
        "round(list_sum(list_transform(embedding, (x, i) -> "
        f"CAST(x AS DOUBLE) * {projection_sign_sql('i - 1', j, RP_SEED)}))"
        f" / sqrt({RP_OUT_DIM}), 6)"
        for j in range(RP_OUT_DIM)
    )
    return f"""
SELECT vec_id,
       CAST(generate_subscripts(projected, 1) - 1 AS BIGINT) AS pos,
       unnest(projected) AS val
FROM (
  SELECT vec_id, [{comps}] AS projected
  FROM embeddings
)
"""


# multi-line documents for the line-dedup gates, built from the
# single-line synth docs with PORTABLE expressions only (the same CTE
# string runs on Spark SQL and DuckDB): literal replace() turns every
# " the " / " a " into a newline, yielding ~4 lines/doc with a real
# duplicated-line tail (sf0.01: 2036 occurrences, 99 lines shared by
# >=2 docs covering 293 occurrences).
LINE_DOCS_CTE = """
line_docs AS (
  SELECT doc_id,
         replace(replace(text, ' the ', chr(10)), ' a ', chr(10)) AS text
  FROM documents
)
"""
LINE_DEDUP_MIN_DOCS = 2


def _line_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    return spark.sql(
        f"WITH {LINE_DOCS_CTE} SELECT doc_id, text FROM line_docs"
    )


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.spans import duplicate_spans

    return duplicate_spans(
        _docs(spark, sf_dir), n=SPAN_NGRAM, min_count=SPAN_MIN_COUNT
    )


def q_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.spans import span_dup_stats

    return span_dup_stats(
        _docs(spark, sf_dir), n=SPAN_NGRAM, min_count=SPAN_MIN_COUNT
    )


def q_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.spans import strip_duplicate_spans

    return strip_duplicate_spans(
        _docs(spark, sf_dir),
        n=SPAN_NGRAM,
        min_count=SPAN_MIN_COUNT,
        keep="first",
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.lines import line_dedup

    return line_dedup(
        _line_docs(spark, sf_dir), min_dup_docs=LINE_DEDUP_MIN_DOCS
    )


def q_line_dedup_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.lines import line_dedup

    return line_dedup(
        _line_docs(spark, sf_dir),
        min_dup_docs=LINE_DEDUP_MIN_DOCS,
        keep_first=True,
    )


_SPAN_ISLANDS_CTE = """
d AS (SELECT doc_id, string_split_regex(lower(text), ' +') AS t
      FROM documents),
g AS (
  SELECT doc_id, CAST(i AS INT) AS start,
         md5(array_to_string(t[i:i+{n}-1], ' ')) AS gram
  FROM d, LATERAL (SELECT unnest(range(1, len(t) - {n} + 2)) AS i)
  WHERE len(t) >= {n}
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= {min_count}),
ds AS (SELECT doc_id, start FROM g
       WHERE gram IN (SELECT gram FROM dup)),
brk AS (
  SELECT doc_id, start,
         CASE WHEN start <= lag(start) OVER (PARTITION BY doc_id
                                             ORDER BY start) + {n}
              THEN 0 ELSE 1 END AS b
  FROM ds
),
isl AS (
  SELECT doc_id, start,
         sum(b) OVER (PARTITION BY doc_id ORDER BY start) AS island
  FROM brk
),
spans AS (
  SELECT doc_id,
         CAST(min(start) AS INT) AS span_start,
         CAST(max(start) + {n} - 1 AS INT) AS span_end,
         CAST(max(start) + {n} - min(start) AS BIGINT) AS span_tokens
  FROM isl GROUP BY doc_id, island
)
"""


def duplicate_spans_oracle_sql(
    n: int = SPAN_NGRAM, min_count: int = SPAN_MIN_COUNT
) -> str:
    """Gaps-and-islands mirror of ``pipeline.spans.duplicate_spans``:
    a duplicated-start run breaks when the next start exceeds the
    previous covered end + 1 (start > prev_start + n)."""
    cte = _SPAN_ISLANDS_CTE.format(n=n, min_count=min_count)
    return f"WITH {cte} SELECT doc_id, span_start, span_end, span_tokens FROM spans"


def span_dup_stats_oracle_sql(
    n: int = SPAN_NGRAM, min_count: int = SPAN_MIN_COUNT
) -> str:
    cte = _SPAN_ISLANDS_CTE.format(n=n, min_count=min_count)
    return f"""WITH {cte},
base AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(text), ' +')) AS BIGINT)
           AS n_tokens
  FROM documents
),
agg AS (SELECT doc_id, sum(span_tokens) AS dt FROM spans GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       CAST(coalesce(a.dt, 0) AS BIGINT) AS dup_tokens,
       round(coalesce(a.dt, 0) / greatest(b.n_tokens, 1), 6) AS dup_frac
FROM base b LEFT JOIN agg a USING (doc_id)"""


def strip_spans_oracle_sql(
    n: int = SPAN_NGRAM, min_count: int = SPAN_MIN_COUNT
) -> str:
    """keep='first' mirror: survivor per exact span content =
    smallest (doc_id, span_start); later copies' token positions are
    dropped and the doc is reassembled in token order."""
    cte = _SPAN_ISLANDS_CTE.format(n=n, min_count=min_count)
    return f"""WITH {cte},
sp2 AS (
  SELECT s.doc_id, s.span_start, s.span_end, s.span_tokens,
         md5(array_to_string(d.t[s.span_start:s.span_end], ' '))
           AS span_hash
  FROM spans s JOIN d USING (doc_id)
),
removals AS (
  SELECT doc_id, span_start, span_end, span_tokens FROM sp2
  QUALIFY row_number() OVER (PARTITION BY span_hash
                             ORDER BY doc_id, span_start) > 1
),
pos AS (
  SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS tok FROM d
),
kept AS (
  SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS text_clean
  FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM removals r
    WHERE r.doc_id = pos.doc_id
      AND pos.p BETWEEN r.span_start AND r.span_end)
  GROUP BY doc_id
),
nrm AS (SELECT doc_id, sum(span_tokens) AS nr FROM removals GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(k.text_clean, '') AS text_clean,
       CAST(coalesce(nrm.nr, 0) AS BIGINT) AS n_removed
FROM d
LEFT JOIN kept k USING (doc_id)
LEFT JOIN nrm USING (doc_id)"""


_LINE_KEYED_CTE = """
occ AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM line_docs
),
keyed AS (
  SELECT doc_id, pos, line,
         CASE WHEN length(trim(line)) >= 1 THEN md5(trim(line)) END AS key
  FROM occ
),
dup AS (
  SELECT key FROM keyed WHERE key IS NOT NULL
  GROUP BY key HAVING count(DISTINCT doc_id) >= {min_docs}
)
"""

_LINE_REASSEMBLE_SQL = """
surv AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY pos), chr(10)) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM keyed GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(s.text_clean, '') AS text_clean,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(coalesce(s.n_kept, 0) AS BIGINT) AS n_lines_kept
FROM tot t LEFT JOIN surv s ON t.doc_id = s.doc_id
"""


def line_dedup_oracle_sql(min_docs: int = LINE_DEDUP_MIN_DOCS) -> str:
    """Global policy: every occurrence of a line seen in >= min_docs
    distinct docs is removed (pipeline/lines.py semantics)."""
    keyed = _LINE_KEYED_CTE.format(min_docs=min_docs)
    return f"""
WITH {LINE_DOCS_CTE}, {keyed},
kept AS (
  SELECT k.doc_id, k.pos, k.line FROM keyed k
  LEFT JOIN dup d ON k.key = d.key WHERE d.key IS NULL
),
{_LINE_REASSEMBLE_SQL}
"""


def line_dedup_keepfirst_oracle_sql(
    min_docs: int = LINE_DEDUP_MIN_DOCS,
) -> str:
    """Keep-first policy: of a duplicated line's occurrences only the
    smallest (doc_id, pos) survives; non-duplicated and exempt lines
    always survive."""
    keyed = _LINE_KEYED_CTE.format(min_docs=min_docs)
    return f"""
WITH {LINE_DOCS_CTE}, {keyed},
firsts AS (
  SELECT key, doc_id AS fdoc, pos AS fpos FROM (
    SELECT key, doc_id, pos,
           row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
    FROM keyed WHERE key IS NOT NULL
  ) WHERE rn = 1
),
kept AS (
  SELECT k.doc_id, k.pos, k.line
  FROM keyed k
  LEFT JOIN dup d ON k.key = d.key
  LEFT JOIN firsts f ON k.key = f.key
  WHERE d.key IS NULL OR (k.doc_id = f.fdoc AND k.pos = f.fpos)
),
{_LINE_REASSEMBLE_SQL}
"""


# Gopher-filter gate thresholds, tuned so the synth corpus actually
# splits on three of the five rules (sf0.01: n_words 10-99 median 56,
# mean_word_len 3.7-5.3, 0-2 stop hits): every rule's boolean takes
# both values somewhere in the output.
GOPHER_GATE_STOPWORDS = ["the", "a", "of", "and", "to"]
GOPHER_GATE = dict(
    min_words=25,
    max_words=80,
    min_mean_word_len=4.0,
    max_mean_word_len=5.0,
    max_symbol_ratio=0.1,
    min_alpha_word_ratio=0.8,
    min_stopwords=2,
    stopwords=GOPHER_GATE_STOPWORDS,
)


def q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.textstats import gopher_quality_filters

    return gopher_quality_filters(_docs(spark, sf_dir), **GOPHER_GATE)


def gopher_oracle_sql(p: dict = GOPHER_GATE) -> str:
    stop = ", ".join(f"'{s}'" for s in p["stopwords"])
    reasons = ",\n           ".join(
        f"CASE WHEN NOT ok_{name} THEN '{name}' END"
        for name in (
            "word_count",
            "mean_word_len",
            "symbol_ratio",
            "alpha_ratio",
            "stopwords",
        )
    )
    return f"""
WITH toks AS (
  SELECT doc_id, text, string_split_regex(lower(text), ' +') AS t
  FROM documents
),
stats AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         round(list_sum(list_transform(t, w -> length(w))) * 1.0 / len(t),
               6) AS mean_word_len,
         round(((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) / 3.0)
               * 1.0 / len(t), 6) AS symbol_ratio,
         round(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
               * 1.0 / len(t), 6) AS alpha_ratio,
         CAST(len(list_filter([{stop}], s -> list_contains(t, s)))
              AS BIGINT) AS n_stopwords
  FROM toks
),
flagged AS (
  SELECT *,
         n_words >= {p['min_words']} AND n_words <= {p['max_words']}
           AS ok_word_count,
         mean_word_len >= {p['min_mean_word_len']}
           AND mean_word_len <= {p['max_mean_word_len']}
           AS ok_mean_word_len,
         symbol_ratio <= {p['max_symbol_ratio']} AS ok_symbol_ratio,
         alpha_ratio >= {p['min_alpha_word_ratio']} AS ok_alpha_ratio,
         n_stopwords >= {p['min_stopwords']} AS ok_stopwords
  FROM stats
)
SELECT *,
       ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
         AND ok_alpha_ratio AND ok_stopwords AS pass_filter,
       coalesce(array_to_string(list_filter([
           {reasons}
         ], x -> x IS NOT NULL), ','), '') AS fail_reasons
FROM flagged
"""


KMEANS_K = 4
KMEANS_ITERS = 2
KMEANS_INIT_IDS = [0, 1, 2, 3]  # centroid index == vec_id by design


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED spherical k-means under the oracle gate: explicit init
    ids + round_to=6 make the whole Lloyd loop engine-portable (the
    untrained-centroid path is gated by ann_ivf_topk; clustering
    quality on planted clusters is pytest-checked)."""
    from cminer_spark.pipeline.similarity import kmeans

    return kmeans(
        _embs(spark, sf_dir),
        k=KMEANS_K,
        n_iters=KMEANS_ITERS,
        init_ids=KMEANS_INIT_IDS,
        round_to=6,
    )


def kmeans_oracle_sql(
    n_iters: int = KMEANS_ITERS, init_ids: list[int] = KMEANS_INIT_IDS
) -> str:
    """Unrolled Lloyd loop: per iteration one argmax-assignment CTE
    (dot ROUNDED 6, ties to the larger centroid id — the ivf_assign
    convention) and one mean→normalize→round(6) centroid update with
    the empty-cluster-keeps-previous rule, then a final assignment
    with the last centroids."""
    ids = ", ".join(str(i) for i in init_ids)
    assign = """
{name} AS (
  SELECT vec_id, c, d FROM (
    SELECT vec_id, c, d,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d DESC, c DESC) AS rn
    FROM (SELECT v.vec_id, c.c, round(sum(v.nx * c.val), 6) AS d
          FROM nexp v JOIN {cent} c ON v.i = c.i
          GROUP BY v.vec_id, c.c)
  ) WHERE rn = 1
)"""
    parts = [
        f"""exp AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
norms AS MATERIALIZED (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id
),
nexp AS MATERIALIZED (
  SELECT e.vec_id, e.i, e.x / n.nrm AS nx
  FROM exp e JOIN norms n USING (vec_id) WHERE n.nrm > 0
),
c0 AS (SELECT vec_id AS c, i, nx AS val FROM nexp WHERE vec_id IN ({ids}))"""
    ]
    for t in range(1, n_iters + 1):
        parts.append(assign.format(name=f"a{t}", cent=f"c{t - 1}").strip())
        parts.append(
            f"""m{t} AS (
  SELECT a.c, v.i, avg(v.nx) AS m
  FROM a{t} a JOIN nexp v USING (vec_id)
  GROUP BY a.c, v.i
),
mn{t} AS (SELECT c, sqrt(sum(m * m)) AS mrm FROM m{t} GROUP BY c),
c{t} AS (
  SELECT p.c, p.i,
         CASE WHEN u.m IS NULL OR n.mrm IS NULL OR n.mrm = 0 THEN p.val
              ELSE round(u.m / n.mrm, 6) END AS val
  FROM c{t - 1} p
  LEFT JOIN m{t} u ON u.c = p.c AND u.i = p.i
  LEFT JOIN mn{t} n ON n.c = p.c
)"""
        )
    parts.append(assign.format(name="fin", cent=f"c{n_iters}").strip())
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT n.vec_id,
       CAST(coalesce(f.c, -1) AS BIGINT) AS cluster,
       coalesce(f.d, 0.0) AS cosine
FROM norms n LEFT JOIN fin f ON n.vec_id = f.vec_id
"""


CHUNK_TOKENS = 12
CHUNK_STRIDE = 8


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.chunking import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir),
        chunk_tokens=CHUNK_TOKENS,
        stride=CHUNK_STRIDE,
    )


def chunking_oracle_sql(
    chunk: int = CHUNK_TOKENS, step: int = CHUNK_STRIDE
) -> str:
    # constant chunk-index bound + filter (portable lateral): synth
    # docs cap at ~100 tokens, 1000 strides is a safe ceiling
    return f"""
WITH w AS (
  SELECT doc_id, string_split_regex(text, ' +') AS ts FROM documents
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       array_to_string(ts[ci * {step} + 1 : ci * {step} + {chunk}], ' ')
         AS chunk_text,
       CAST(least({chunk}, len(ts) - ci * {step}) AS BIGINT) AS n_tokens
FROM w, range(0, 1000) r(ci)
WHERE ci * {step} < len(ts)
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.textstats import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS t
  FROM documents
),
tf AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM tf)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln((c + 1.0) / (n + v))), 6) AS logprob_per_token
FROM toks JOIN tf USING (t) CROSS JOIN tot
GROUP BY doc_id
"""


MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIXTURE_TOKENS = 2000


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture selection — the bucketed threshold path
    must equal the oracle's naive per-domain cumulative window."""
    from cminer_spark.pipeline.mixture import mixture_sample

    return mixture_sample(
        _docs(spark, sf_dir),
        MIXTURE_WEIGHTS,
        MIXTURE_TOKENS,
        domain_col="source",
        seed=SPLIT_SEED,
    )


def mixture_oracle_sql(
    weights=None, total_tokens=MIXTURE_TOKENS, seed=SPLIT_SEED
) -> str:
    """Naive form of pipeline.mixture.mixture_sample: one cumulative
    window per domain over the md5 selection order; keep rows whose
    EXCLUSIVE token prefix < the domain's target."""
    weights = weights or MIXTURE_WEIGHTS
    h = _SPLIT_HASH_SQL.format(seed=seed)
    wsum = float(sum(weights.values()))
    vals = ", ".join(
        f"('{d}', {float(total_tokens) * float(w) / wsum!r})"
        for d, w in sorted(weights.items())
    )
    return f"""
WITH tgt(source, target) AS (VALUES {vals}),
base AS (
  SELECT doc_id, d.source, t.target,
         CAST(len(string_split_regex(text, ' +')) AS DOUBLE) AS n_tokens,
         {h} AS h
  FROM documents d JOIN tgt t USING (source)
),
c AS (
  SELECT doc_id, source, n_tokens, target,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY h ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl,
         row_number() OVER (
           PARTITION BY source ORDER BY h ASC, doc_id ASC) AS sel_rank
  FROM base
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(sel_rank AS BIGINT) AS sel_rank
FROM c WHERE excl < target
"""


BPE_TOP_K = 40


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.vocab import bpe_pair_counts

    out = bpe_pair_counts(_docs(spark, sf_dir), top_k=BPE_TOP_K)
    return out.select(
        "pair",
        F.col("n").cast("long").alias("n"),
        F.col("pair_rank").cast("long").alias("pair_rank"),
    )


def bpe_oracle_sql(k=BPE_TOP_K) -> str:
    """Mirror of pipeline.vocab.bpe_pair_counts: word-frequency table,
    overlapping adjacent char pairs off distinct words, frequency-
    weighted counts, deterministic top-k."""
    return f"""
WITH w AS (
  SELECT t AS word, count(*) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), ' +')) AS t
    FROM documents
  ) WHERE t <> '' GROUP BY t
),
p AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, c
  FROM (SELECT word, c, unnest(generate_series(1, len(word) - 1)) AS i
        FROM w WHERE len(word) >= 2)
)
SELECT pair, n, pair_rank FROM (
  SELECT pair, CAST(sum(c) AS BIGINT) AS n,
         row_number() OVER (ORDER BY sum(c) DESC, pair ASC) AS pair_rank
  FROM p GROUP BY pair
) WHERE pair_rank <= {k}
"""


BPE_MERGES = 4
BPE_TOKENS_TOP_K = 25


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED BPE merge loop under the oracle gate (the kmeans_assign
    pattern: Spark runs the real driver-decides/executors-apply
    trainer; DuckDB replays the same iterations unrolled). left/right
    are aliased lhs/rhs so neither engine trips on the SQL keywords."""
    from cminer_spark.pipeline.bpe import train_bpe

    merges, _ = train_bpe(_docs(spark, sf_dir), n_merges=BPE_MERGES)
    return merges.select(
        "merge_rank",
        F.col("left").alias("lhs"),
        F.col("right").alias("rhs"),
        "merged",
        "n",
    )


def _bpe_train_ctes(n_merges: int = BPE_MERGES) -> str:
    """WITH-body replaying the BPE trainer: s0 = char-segmented
    word-frequency table; per iteration pN picks the top pair
    (count desc, pair asc) and sN re-segments via the same
    left-to-right non-overlapping fold the Spark operator applies
    (list_reduce with the identical string arithmetic — see
    cminer_spark/pipeline/bpe.py:_merge_fold)."""
    parts = [
        """wc AS MATERIALIZED (
  SELECT t AS word, count(*) AS n FROM (
    SELECT unnest(string_split_regex(lower(text), ' +')) AS t
    FROM documents
  ) WHERE t <> '' GROUP BY t
),
s0 AS (
  SELECT n,
         array_to_string(list_transform(generate_series(1, length(word)),
                                        i -> substr(word, CAST(i AS INT), 1)),
                         ' ') AS seg
  FROM wc
)"""
    ]
    for t in range(1, n_merges + 1):
        parts.append(
            f"""p{t} AS (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
         pair, n
  FROM (
    SELECT pair, CAST(sum(n) AS BIGINT) AS n FROM (
      SELECT n,
             unnest(list_transform(
               generate_series(1, len(string_split(seg, ' ')) - 1),
               i -> string_split(seg, ' ')[i] || ' '
                    || string_split(seg, ' ')[i + 1])) AS pair
      FROM s{t - 1}
    ) GROUP BY pair
  ) ORDER BY n DESC, pair ASC LIMIT 1
),
s{t} AS MATERIALIZED (
  SELECT s.n,
         CASE WHEN len(string_split(s.seg, ' ')) = 1 THEN s.seg
         ELSE list_reduce(string_split(s.seg, ' '),
           (acc, x) -> CASE
             WHEN right(' ' || acc, length(p.a) + 1) = ' ' || p.a
                  AND x = p.b
             THEN left(acc, length(acc) - length(p.a)) || p.a || p.b
             ELSE acc || ' ' || x END)
         END AS seg
  FROM s{t - 1} s, p{t} p
)"""
        )
    return ",\n".join(parts)


def bpe_train_oracle_sql(n_merges: int = BPE_MERGES) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS merge_rank, a AS lhs, b AS rhs,"
        f" a || b AS merged, n FROM p{t}"
        for t in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_train_ctes(n_merges)}\n{rows}"


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency table of the corpus encoded with the merges
    q_bpe_train just learned — the apply half of the tokenizer."""
    from cminer_spark.pipeline.bpe import bpe_token_counts, train_bpe

    docs = _docs(spark, sf_dir)
    _, info = train_bpe(docs, n_merges=BPE_MERGES)
    out = bpe_token_counts(
        docs,
        [(a, b) for a, b, _, _ in info.merges],
        top_k=BPE_TOKENS_TOP_K,
    )
    return out.select(
        "token",
        F.col("n").cast("long").alias("n"),
        F.col("token_rank").cast("long").alias("token_rank"),
    )


def bpe_encode_oracle_sql(
    n_merges: int = BPE_MERGES, k: int = BPE_TOKENS_TOP_K
) -> str:
    return f"""
WITH {_bpe_train_ctes(n_merges)},
tok AS (
  SELECT token, CAST(sum(n) AS BIGINT) AS n FROM (
    SELECT n, unnest(string_split(seg, ' ')) AS token FROM s{n_merges}
  ) GROUP BY token
)
SELECT token, n, CAST(token_rank AS BIGINT) AS token_rank FROM (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token ASC) AS token_rank
  FROM tok
) WHERE token_rank <= {k}
"""


def q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.textstats import length_percentiles

    out = length_percentiles(_docs(spark, sf_dir), group_col="lang")
    return out.select(
        "lang", F.col("n_docs").cast("long").alias("n_docs"),
        "p50", "p90", "p99",
    )


LENGTH_PCTL_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.9), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents GROUP BY lang
"""


def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/fastText-style quality classification: multinomial NB
    trained on the lang labels, scoring the same corpus. The bucketed
    broadcast-join scorer must equal the oracle's naive dense grid."""
    from cminer_spark.pipeline.classifier import classify_corpus

    return classify_corpus(_docs(spark, sf_dir), label_col="lang")


# Mirror of pipeline.classifier: add-one-smoothing multinomial NB,
# rounded per-(doc,label) log posterior, deterministic argmax (rounded
# score desc, label asc), margin to runner-up off the ROUNDED scores.
NB_CLASSIFY_SQL = """
WITH toks AS (
  SELECT doc_id, lang AS label, t
  FROM (SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), ' +')) AS t
        FROM documents)
  WHERE t <> ''
),
counts AS (SELECT label, t, count(*) AS c FROM toks GROUP BY label, t),
vocab AS (SELECT count(DISTINCT t) AS v FROM counts),
totals AS (
  SELECT label, sum(c) AS t_l, any_value(v) AS v
  FROM counts CROSS JOIN vocab GROUP BY label
),
priors AS (
  SELECT lang AS label,
         ln(count(*) * 1.0 / (SELECT count(*) FROM documents)) AS ln_prior
  FROM documents GROUP BY lang
),
model AS (
  SELECT c.label, c.t, ln((c.c + 1.0) / (tt.t_l + tt.v)) AS loglik
  FROM counts c JOIN totals tt USING (label)
),
scored AS (
  -- occurrence-level sum (one addend per token occurrence), matching
  -- the Spark side's arithmetic shape exactly — a per-(doc,token)
  -- pre-count (n * loglik) changes the FP summation and can flip the
  -- 6-dp rounding on near-tied documents
  SELECT tk.doc_id, tt.label,
         round(sum(coalesce(m.loglik, ln(1.0 / (tt.t_l + tt.v))))
               + any_value(p.ln_prior), 6) AS score
  FROM toks tk
  CROSS JOIN totals tt
  LEFT JOIN model m ON m.label = tt.label AND m.t = tk.t
  JOIN priors p ON p.label = tt.label
  GROUP BY tk.doc_id, tt.label
  UNION ALL
  -- token-less documents: prior-only posterior (mirror of the Spark
  -- side's anti-join recovery)
  SELECT d.doc_id, p.label, round(p.ln_prior, 6) AS score
  FROM documents d CROSS JOIN priors p
  WHERE d.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks)
),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rk,
         lead(score) OVER (PARTITION BY doc_id
                           ORDER BY score DESC, label ASC) AS nxt
  FROM scored
)
SELECT doc_id, label AS pred_label, score,
       round(coalesce(score - nxt, 0.0), 6) AS margin
FROM ranked WHERE rk = 1
"""


def q_nb_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/f1 of the NB classifier against the
    true labels — the evaluation leg of classify-then-filter."""
    from cminer_spark.pipeline.classifier import (
        classify_corpus,
        evaluate_predictions,
    )

    docs = _docs(spark, sf_dir)
    pred = classify_corpus(docs, label_col="lang")
    return evaluate_predictions(pred, docs, truth_col="lang")


NB_EVAL_SQL = f"""
WITH pred AS ({NB_CLASSIFY_SQL}),
j AS (
  SELECT d.lang AS t, p.pred_label AS pr
  FROM documents d JOIN pred p USING (doc_id)
),
conf AS (SELECT t, pr, count(*) AS n FROM j GROUP BY t, pr),
bt AS (SELECT t AS label, sum(n) AS n_true FROM conf GROUP BY t),
bp AS (SELECT pr AS label, sum(n) AS n_pred FROM conf GROUP BY pr),
tpc AS (SELECT t AS label, n AS tp FROM conf WHERE t = pr),
rep AS (
  SELECT coalesce(bt.label, bp.label) AS label,
         CAST(coalesce(n_true, 0) AS BIGINT) AS n_true,
         CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
         CAST(coalesce(tp, 0) AS BIGINT) AS tp
  FROM bt FULL JOIN bp ON bt.label = bp.label
  LEFT JOIN tpc ON coalesce(bt.label, bp.label) = tpc.label
),
m AS (
  SELECT label, n_true, n_pred, tp,
         CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END AS prec,
         CASE WHEN n_true > 0 THEN tp * 1.0 / n_true ELSE 0.0 END AS rec
  FROM rep
)
SELECT label, n_true, n_pred, tp,
       round(prec, 6) AS precision,
       round(rec, 6) AS recall,
       round(CASE WHEN prec + rec > 0
                  THEN 2 * prec * rec / (prec + rec) ELSE 0.0 END, 6) AS f1
FROM m
"""


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.pipeline.textstats import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


# Mirror of pipeline.textstats.bigram_logprob: Laplace-smoothed
# P(w2|w1) trained on the scored corpus itself; empty tokens dropped
# before pairing; docs with <2 real tokens have no bigram rows.
BIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), ' +'),
                     x -> x <> '') AS l
  FROM documents
),
pairs AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM toks WHERE len(l) >= 2)
),
uni AS (
  SELECT t, count(*) AS cu
  FROM (SELECT unnest(l) AS t FROM toks) GROUP BY t
),
v AS (SELECT count(*) AS v FROM uni),
bi AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY w1, w2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(ln((coalesce(cb, 0) + 1.0) / (u.cu + v.v))), 6)
         AS logprob_per_pair
FROM pairs p
LEFT JOIN bi USING (w1, w2)
JOIN uni u ON u.t = p.w1
CROSS JOIN v
GROUP BY doc_id
"""


CONV_MIN_TURNS = 3
CONV_MAX_TURNS = 100
CONV_MAX_BREAKS = 5


def q_conv_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialog-level quality gate over the transcript view: stats +
    keep flag + first-failed rule per conversation."""
    from cminer_spark import gate
    from cminer_spark.pipeline.dialogs import filter_conversations

    tr = gate.transcripts_df(spark, sf_dir)
    return filter_conversations(
        tr,
        min_turns=CONV_MIN_TURNS,
        max_turns=CONV_MAX_TURNS,
        max_alternation_breaks=CONV_MAX_BREAKS,
    )


def conv_filter_oracle_sql() -> str:
    from cminer_spark import gate

    return f"""
WITH {gate.TRANSCRIPTS_CTE},
t AS (
  SELECT conv_id, role, len(coalesce(text, '')) AS chars,
         (lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) = role)
           AS brk
  FROM tr
),
st AS (
  SELECT conv_id,
    CAST(count(*) AS BIGINT) AS n_turns,
    CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_user_turns,
    CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_assistant_turns,
    CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_tool_turns,
    CAST(sum(CASE WHEN coalesce(brk, false) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_alternation_breaks,
    CAST(sum(CASE WHEN role = 'user' THEN chars ELSE 0 END) AS BIGINT)
      AS user_chars,
    CAST(sum(CASE WHEN role = 'assistant' THEN chars ELSE 0 END) AS BIGINT)
      AS assistant_chars
  FROM t GROUP BY conv_id
),
r AS (
  SELECT *,
    round(CASE WHEN user_chars > 0
               THEN assistant_chars * 1.0 / user_chars ELSE 0.0 END, 6)
      AS assistant_char_ratio,
    CASE WHEN n_turns < {CONV_MIN_TURNS} THEN 'too_short'
         WHEN n_turns > {CONV_MAX_TURNS} THEN 'too_long'
         WHEN n_assistant_turns < 1 THEN 'no_assistant'
         WHEN n_alternation_breaks > {CONV_MAX_BREAKS} THEN 'alternation'
         END AS fail_reason
  FROM st
)
SELECT conv_id, n_turns, n_user_turns, n_assistant_turns, n_tool_turns,
       n_alternation_breaks, user_chars, assistant_chars,
       assistant_char_ratio, fail_reason IS NULL AS keep, fail_reason
FROM r
"""


def q_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark import gate
    from cminer_spark.pipeline.dialogs import tool_transitions

    return tool_transitions(gate.transcripts_df(spark, sf_dir))


def tool_transitions_oracle_sql() -> str:
    from cminer_spark import gate

    return f"""
WITH {gate.TRANSCRIPTS_CTE},
seq AS (
  SELECT coalesce(
           lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx), '^'
         ) AS prev_tool,
         tool
  FROM tr WHERE tool IS NOT NULL
),
c AS (
  SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
  FROM seq GROUP BY prev_tool, tool
)
SELECT prev_tool, tool, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_tool), 6) AS p
FROM c
"""


def q_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-corpus dedup: docs with doc_id % 5 == 0 play
    the daily delta, the rest the existing corpus; survivors =
    delta docs with no verified near-dup on the existing side."""
    from cminer_spark.pipeline.dedup import dedup_against

    docs = _docs(spark, sf_dir)
    existing = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    return dedup_against(
        existing,
        new,
        threshold=JACCARD_THRESHOLD,
        num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS,
    )


def dedup_against_oracle_sql() -> str:
    """Banding is per-document, so one bandrows CTE over ALL docs with
    the % 5 split applied at the cross-join mirrors the two-sided
    Spark banding exactly."""
    return f"""
WITH {_lsh_ctes()},
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_bands
  FROM bandrows x JOIN bandrows y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
  WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
  GROUP BY x.doc_id, y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.s = x.s
  GROUP BY c.a, c.b
),
dups AS (
  SELECT DISTINCT i.b
  FROM inter i
  JOIN sizes sa ON i.a = sa.doc_id
  JOIN sizes sb ON i.b = sb.doc_id
  WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= {JACCARD_THRESHOLD}
),
nc AS (SELECT b AS doc_id, count(*) AS n FROM cand GROUP BY b)
SELECT d.doc_id,
       CAST(coalesce(nc.n, 0) AS BIGINT) AS n_lsh_candidates
FROM documents d LEFT JOIN nc USING (doc_id)
WHERE d.doc_id % 5 = 0 AND d.doc_id NOT IN (SELECT b FROM dups)
"""


PCA_DIM = 64  # testdata embeddings are 64-d at every sf
PCA_ITERS = 3


DSIR_BUCKETS = 4096


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed n-gram importance weights: every document scored
    against the lang='en' slice as the target distribution, vs the
    occurrence-level DuckDB replay of the same bucketed model."""
    from cminer_spark.pipeline.importance import importance_weights

    docs = _docs(spark, sf_dir)
    return importance_weights(
        docs, docs.where(F.col("lang") == "en"), n_buckets=DSIR_BUCKETS
    )


def importance_oracle_sql(nb: int = DSIR_BUCKETS) -> str:
    """Mirror of pipeline.importance: filtered-token unigram+bigram
    stream, md5-prefix bucket, add-one smoothing over nb buckets,
    bucket-level per-doc sum Σ c·lw over per-(doc, bucket) integer
    counts (same FP arithmetic shape as Spark — both engines sum the
    identical multiset of c·lw addends per document, and the
    histograms are exact integers either way)."""
    grams = """
  SELECT doc_id, unnest(toks) AS g FROM {src}
  UNION ALL
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM {src})
"""
    return f"""
WITH base AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), ' +'),
                     t -> t <> '') AS toks
  FROM documents
),
tb AS (SELECT doc_id, toks FROM base WHERE lang = 'en'),
rgrams AS ({grams.format(src='base')}),
tgrams AS ({grams.format(src='tb')}),
rdb AS (SELECT doc_id,
               CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {nb} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM rgrams GROUP BY 1, 2),
tcnt AS (SELECT CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {nb} AS b,
                count(*) AS c
         FROM tgrams GROUP BY 1),
rcnt AS (SELECT b, CAST(sum(c) AS BIGINT) AS c FROM rdb GROUP BY b),
ttot AS (SELECT count(*) AS n FROM tgrams),
rtot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM rdb),
bkts AS (SELECT range AS b FROM range({nb})),
lw AS (
  SELECT k.b,
         ln((coalesce(tc.c, 0) + 1.0) / (ttot.n + {nb}.0))
           - ln((coalesce(rc.c, 0) + 1.0) / (rtot.n + {nb}.0)) AS lw
  FROM bkts k
  LEFT JOIN tcnt tc ON k.b = tc.b
  LEFT JOIN rcnt rc ON k.b = rc.b
  CROSS JOIN ttot CROSS JOIN rtot
),
scored AS (
  SELECT rdb.doc_id, CAST(sum(rdb.c) AS BIGINT) AS ng,
         sum(rdb.c * lw.lw) AS w
  FROM rdb JOIN lw ON rdb.b = lw.b
  GROUP BY rdb.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.ng, 0) AS BIGINT) AS n_grams,
       round(coalesce(s.w, 0.0), 6) AS logweight
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


def q_pca_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row projection onto the power-iteration top principal
    direction — driver-side normalize must equal the oracle's
    in-query normalize (same double trajectory, final 6 dp round)."""
    from cminer_spark.pipeline.pca import power_iteration_top_pc

    _, proj = power_iteration_top_pc(_embs(spark, sf_dir), iters=PCA_ITERS)
    return proj


def q_pca_remove_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual L2 norm after ABTT-style top-component removal."""
    from cminer_spark.pipeline.pca import power_iteration_top_pc, remove_top_pc

    embs = _embs(spark, sf_dir)
    v, _ = power_iteration_top_pc(embs, iters=PCA_ITERS)
    res = remove_top_pc(embs, v)
    return res.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("embedding"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            6,
        ).alias("res_norm"),
    )


def _pca_dot_sql(vec_expr: str, v_cols: list[str]) -> str:
    """Left-assoc unrolled dot product (matches the Spark chain)."""
    return " + ".join(
        f"CAST({vec_expr}[{j + 1}] AS DOUBLE) * {v_cols[j]}"
        for j in range(len(v_cols))
    )


def pca_oracle_sql(remove: bool = False, d: int = PCA_DIM, k: int = PCA_ITERS) -> str:
    """Unrolled power iteration: v0 = 1/sqrt(d)·1; per step one
    matrix-vector aggregate + in-query normalize; final projection
    (or residual norm) rounded to 6 dp."""
    v0 = repr(1.0 / math.sqrt(d))
    parts = [
        "WITH em AS (SELECT vec_id, embedding AS e FROM embeddings),",
        f"v0 AS (SELECT {', '.join(f'{v0} AS c{j}' for j in range(d))}),",
    ]
    for i in range(1, k + 1):
        prev = [f"v.c{j}" for j in range(d)]
        dot = _pca_dot_sql("em.e", prev)
        sums = ", ".join(
            f"sum(CAST(em.e[{j + 1}] AS DOUBLE) * s.s) AS u{j}" for j in range(d)
        )
        norm = " + ".join(f"u{j} * u{j}" for j in range(d))
        vcols = ", ".join(f"u{j} / nrm AS c{j}" for j in range(d))
        parts.append(
            f"s{i} AS (SELECT em.vec_id, {dot} AS s FROM em CROSS JOIN v{i-1} v),"
            f"u{i} AS (SELECT {sums} FROM em JOIN s{i} s USING (vec_id)),"
            f"v{i} AS (SELECT {vcols} FROM (SELECT *, sqrt({norm}) AS nrm FROM u{i})),"
        )
    final_dot = _pca_dot_sql("em.e", [f"v.c{j}" for j in range(d)])
    if not remove:
        parts.append(
            f"fin AS (SELECT em.vec_id, round({final_dot}, 6) AS proj "
            f"FROM em CROSS JOIN v{k} v) SELECT * FROM fin"
        )
    else:
        # residual element r_j = e_j - s*v_j; norm via the same
        # left-assoc fold Spark's F.aggregate produces (0.0 + r0² + …)
        res_sq = " + ".join(
            f"(CAST(em.e[{j + 1}] AS DOUBLE) - s.s * v.c{j})"
            f" * (CAST(em.e[{j + 1}] AS DOUBLE) - s.s * v.c{j})"
            for j in range(d)
        )
        parts.append(
            f"sf AS (SELECT em.vec_id, {final_dot} AS s "
            f"FROM em CROSS JOIN v{k} v),"
            f"fin AS (SELECT em.vec_id, round(sqrt(0.0 + {res_sq}), 6) AS res_norm "
            f"FROM em JOIN sf s USING (vec_id) CROSS JOIN v{k} v) "
            "SELECT * FROM fin"
        )
    return "\n".join(parts)


def queries():
    return {
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard_dups": q_ngram_jaccard,
        "minhash_lsh_candidates": q_minhash_lsh,
        "simhash48": q_simhash,
        "simhash_near_dups": q_simhash_near_dups,
        "dedup_clusters": q_dedup_clusters,
        "ann_cosine_topk": q_ann_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "cosine_near_dups": q_cosine_near_dups,
        "embedding_clusters": q_embedding_clusters,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        "token_counts": q_token_counts,
        "quality_stats": q_quality_stats,
        "language_id": q_language_id,
        "doc_fingerprint": q_doc_fingerprint,
        "bm25_topk": q_bm25_topk,
        "tfidf_top_terms": q_tfidf_top_terms,
        "repetition_stats": q_repetition_stats,
        "deterministic_split": q_deterministic_split,
        "seq_pack": q_seq_pack,
        "quota_sample": q_quota_sample,
        "decontaminate": q_decontaminate,
        "redact_pii": q_redact_pii,
        "normalize_text": q_normalize_text,
        "kmeans_assign": q_kmeans,
        "gopher_filters": q_gopher_filters,
        "unigram_logprob": q_unigram_logprob,
        "chunk_documents": q_chunk_documents,
        "line_dedup": q_line_dedup,
        "line_dedup_keepfirst": q_line_dedup_keepfirst,
        "duplicate_spans": q_duplicate_spans,
        "span_dup_stats": q_span_dup_stats,
        "strip_dup_spans": q_strip_dup_spans,
        "quantize_int8": q_quantize_int8,
        "random_projection": q_random_projection,
        "mixture_sample": q_mixture_sample,
        "bpe_pairs": q_bpe_pairs,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "length_percentiles": q_length_percentiles,
        "nb_classify": q_nb_classify,
        "nb_eval": q_nb_eval,
        "bigram_logprob": q_bigram_logprob,
        "pca_top_pc": q_pca_top_pc,
        "pca_remove_top": q_pca_remove_top,
        "importance_weights": q_importance_weights,
        "dedup_against": q_dedup_against,
        "conv_filter": q_conv_filter,
        "tool_transitions": q_tool_transitions,
    }


def oracles():
    return {
        "exact_dedup": EXACT_DEDUP_SQL,
        "ngram_jaccard_dups": NGRAM_JACCARD_SQL,
        "minhash_lsh_candidates": minhash_lsh_oracle_sql(),
        "simhash48": simhash_oracle_sql(),
        "simhash_near_dups": simhash_neardup_oracle_sql(SIMHASH_NEARDUP_HAMMING),
        "dedup_clusters": dedup_clusters_oracle_sql(
            JACCARD_THRESHOLD, DEDUP_CC_ROUNDS
        ),
        "ann_cosine_topk": ann_topk_oracle_sql(),
        "ann_lsh_topk": ann_lsh_oracle_sql(),
        "ann_ivf_topk": ann_ivf_oracle_sql(),
        "cosine_near_dups": neardup_oracle_sql(),
        "embedding_clusters": embedding_clusters_oracle_sql(DEDUP_CC_ROUNDS),
        "media_features": MEDIA_FEATURES_SQL,
        "frame_sample": FRAME_SAMPLE_SQL,
        "token_counts": TOKEN_COUNTS_SQL,
        "quality_stats": QUALITY_STATS_SQL,
        "language_id": language_id_oracle_sql(),
        "doc_fingerprint": DOC_FINGERPRINT_SQL,
        "bm25_topk": bm25_oracle_sql(),
        "tfidf_top_terms": tfidf_oracle_sql(),
        "repetition_stats": REPETITION_STATS_SQL,
        "deterministic_split": split_oracle_sql(),
        "seq_pack": seq_pack_oracle_sql(),
        "quota_sample": quota_oracle_sql(),
        "decontaminate": decontam_oracle_sql(),
        "redact_pii": redact_oracle_sql(),
        "normalize_text": normalize_oracle_sql(),
        "kmeans_assign": kmeans_oracle_sql(),
        "gopher_filters": gopher_oracle_sql(),
        "unigram_logprob": UNIGRAM_SQL,
        "chunk_documents": chunking_oracle_sql(),
        "line_dedup": line_dedup_oracle_sql(),
        "line_dedup_keepfirst": line_dedup_keepfirst_oracle_sql(),
        "duplicate_spans": duplicate_spans_oracle_sql(),
        "span_dup_stats": span_dup_stats_oracle_sql(),
        "strip_dup_spans": strip_spans_oracle_sql(),
        "quantize_int8": QUANTIZE_SQL,
        "random_projection": projection_oracle_sql(),
        "mixture_sample": mixture_oracle_sql(),
        "bpe_pairs": bpe_oracle_sql(),
        "bpe_train": bpe_train_oracle_sql(),
        "bpe_encode": bpe_encode_oracle_sql(),
        "length_percentiles": LENGTH_PCTL_SQL,
        "nb_classify": NB_CLASSIFY_SQL,
        "nb_eval": NB_EVAL_SQL,
        "bigram_logprob": BIGRAM_SQL,
        "pca_top_pc": pca_oracle_sql(remove=False),
        "pca_remove_top": pca_oracle_sql(remove=True),
        "importance_weights": importance_oracle_sql(),
        "dedup_against": dedup_against_oracle_sql(),
        "conv_filter": conv_filter_oracle_sql(),
        "tool_transitions": tool_transitions_oracle_sql(),
    }
