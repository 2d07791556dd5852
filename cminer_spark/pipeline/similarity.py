"""Similarity search over embedding columns (``array<float>``).

* :func:`brute_force_cosine_topk` — exact baseline: cross join
  (broadcast query side) + JVM-side `aggregate`/`zip_with` dot
  products + window top-k. The summation is strictly left-to-right
  over the array, so results are deterministic at any parallelism.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane
  (sign) LSH buckets via deterministic md5-derived hyperplanes;
  candidates only come from matching buckets, then exact re-rank.
  At 100 TB the bucket join replaces the cross join; recall is
  tunable by n_planes/n_tables.
* :func:`cosine_near_duplicates` — embedding near-dup pairs above a
  cosine threshold within LSH buckets.

No Python UDFs anywhere — `aggregate`/`zip_with`/`transform` are
Catalyst expressions that run codegen'd in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def brute_force_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id:
    ``(query_id, rank, vec_id, cosine)``; deterministic tie-break on
    (cosine desc, vec_id asc)."""
    # norms are hoisted into the (tiny) query frame and the base scan —
    # computed once per vector, not once per (query × candidate) pair
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("vn", _norm(F.col("v")))
    queries = base.where(F.col("vec_id").isin([int(q) for q in query_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane(dim: int, plane_idx: int, table_idx: int = 0) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 —
    reproducible across engines and runs (no RNG state)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table_idx}|{plane_idx}|{d}".encode()).hexdigest()
        out.append((int(h[:12], 16) / float(0xFFFFFFFFFFFF)) * 2.0 - 1.0)
    return out


def lsh_bucket(vec_col, dim: int, n_planes: int = 8, table_idx: int = 0) -> F.Column:
    """Sign-LSH bucket id (0..2^n_planes-1) of an embedding column.

    The sign test uses the dot product ROUNDED to 9 decimals so the
    bucket id is stable across summation orders (engines/partitionings
    differ in the last ulp; a raw ``>= 0`` could flip a near-zero dot).
    """
    bucket = F.lit(0)
    v = _as_double(vec_col)
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, table_idx)])
        bucket = bucket + F.when(
            F.round(_dot(v, plane), 9) >= 0, F.lit(2**p)
        ).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: candidates are the
    union over ``n_tables`` hash tables of same-bucket vectors
    (OR-amplification: recall ≈ 1-(1-p^planes)^tables), exact cosine
    re-rank inside. Same output schema as the brute-force baseline.

    Scale shape: each vector carries ``n_tables`` (table, bucket)
    keys; the candidate join is an equi-join on that key — never a
    cross join. At 100 TB the base side is bucketed storage keyed by
    (table, bucket)."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(F.col(vec_col), dim, n_planes, table_idx=t).alias("b"),
            )
            for t in range(n_tables)
        ]
    )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        _norm(_as_double(F.col(vec_col))).alias("vn"),  # once per vector
        F.explode(buckets).alias("tb"),
    ).select("vec_id", "v", "vn", "tb.t", "tb.b")
    queries = base.where(F.col("vec_id").isin([int(q) for q in query_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
        "t",
        "b",
    )
    cands = (
        base.join(F.broadcast(queries), ["t", "b"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "qn", "vec_id", "v", "vn")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def pseudo_random_centroids(dim: int, n_centroids: int) -> list[list[float]]:
    """Deterministic md5-derived coarse-quantizer centroids (an
    UNTRAINED random-projection quantizer — valid IVF partitioner, and
    replicable as literal constants in the DuckDB oracle gate). For
    data-adapted centroids use :func:`ivf_train_centroids`."""
    return [_hyperplane(dim, c, table_idx=997) for c in range(n_centroids)]


def ivf_assign(vec_col, centroids: list[list[float]]) -> F.Column:
    """IVF cluster id of an embedding: argmax over centroids of the
    dot product ROUNDED to 6 decimals (cross-engine-stable, same
    rationale as :func:`lsh_bucket`'s sign test), ties to the LARGER
    cluster id (``array_max`` over ``struct(d, c)``)."""
    v = _as_double(vec_col)
    structs = [
        F.struct(
            F.round(_dot(v, F.array(*[F.lit(float(x)) for x in c])), 6).alias(
                "d"
            ),
            F.lit(i).alias("c"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_max(F.array(*structs))["c"]


def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    init_ids: list[int] | None = None,
    round_to: int | None = None,
) -> list[list[float]]:
    """Deterministic spherical k-means (Lloyd) centroids.

    * init: the ``n_centroids`` vectors with the smallest
      ``xxhash64(id)`` — a deterministic pseudo-random sample, no RNG
      state, reproducible at any partitioning; or, with ``init_ids``,
      the normalized vectors of exactly those ids in list order
      (engine-portable — xxhash64 is Spark-specific, explicit ids let
      a DuckDB oracle replicate the whole training loop);
    * assignment: argmax cosine (vectors L2-normalized once);
    * update: per-cluster mean, re-normalized; empty clusters keep
      their previous centroid. ``round_to`` rounds updated centroid
      values to that many decimals — with 6, cross-engine float-sum
      reassociation (~1e-15) cannot flip a later assignment, which is
      what makes the trained loop oracle-checkable.

    Scale shape: each Lloyd iteration is ONE aggregation job
    (``posexplode`` → ``groupBy(cluster, dim)``); the state crossing
    the driver is ``n_centroids × dim`` floats per iteration.
    ``sample_mod=m`` trains on the deterministic 1/m subsample
    ``pmod(xxhash64(id), m) == 0`` — at 10^12 rows Lloyd never needs
    the full table.
    """
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    if sample_mod:
        base = base.where(F.pmod(F.xxhash64("vec_id"), F.lit(sample_mod)) == 0)
    base = (
        base.withColumn("vn", _norm(F.col("v")))
        .where(F.col("vn") > 0)
        .select(
            "vec_id",
            F.transform("v", lambda x: x / F.col("vn")).alias("nv"),
        )
        .persist()
    )
    if init_ids is not None:
        ids = [int(i) for i in init_ids]
        seed_map = {
            r["vec_id"]: r["nv"]
            for r in base.where(F.col("vec_id").isin(ids)).collect()
        }
        missing = [i for i in ids if i not in seed_map]
        if missing:
            raise ValueError(f"init_ids not in embeddings: {missing}")
        centroids = [[float(x) for x in seed_map[i]] for i in ids]
    else:
        seed_rows = (
            base.withColumn("h", F.xxhash64("vec_id"))
            .orderBy("h", "vec_id")
            .limit(n_centroids)
            .collect()
        )
        centroids = [[float(x) for x in r["nv"]] for r in seed_rows]
    if not centroids:
        base.unpersist()
        return []
    dim = len(centroids[0])
    for _ in range(n_iters):
        rows = (
            base.withColumn("c", ivf_assign(F.col("nv"), centroids))
            .select("c", F.posexplode("nv").alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in rows:
            sums.setdefault(int(r["c"]), [0.0] * dim)[int(r["d"])] = float(r["s"])
            counts[int(r["c"])] = int(r["n"])
        new = []
        for i, old in enumerate(centroids):
            if i not in sums:
                new.append(old)  # empty cluster keeps its centroid
                continue
            mean = [x / counts[i] for x in sums[i]]
            nrm = sum(x * x for x in mean) ** 0.5
            cand = [x / nrm for x in mean] if nrm > 0 else old
            if round_to is not None:
                cand = [round(x, round_to) for x in cand]
            new.append(cand)
        centroids = new
    base.unpersist()
    return centroids


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_ids: list[int] | None = None,
    round_to: int | None = None,
    sample_mod: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Spherical k-means clustering of an embedding column: train
    Lloyd centroids (:func:`ivf_train_centroids`) and assign every
    vector — ``(vec_id, cluster, cosine)`` where ``cosine`` is the
    similarity to the winning centroid (rounded 6 dp). Zero-norm
    vectors get ``cluster = -1, cosine = 0.0``.

    The clustering pass of a semantic curation pipeline (SemDeDup /
    topic balancing / cluster-based mixing): train on a deterministic
    subsample (``sample_mod``), assign the full table with one
    broadcast-constant projection — no join, no shuffle, scan speed.

    With ``init_ids`` + ``round_to`` the whole trained loop is
    engine-portable and oracle-checked (gate ``kmeans_assign``);
    clustering quality on planted clusters is pytest-checked.
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings,
            n_centroids=k,
            n_iters=n_iters,
            id_col=id_col,
            vec_col=vec_col,
            sample_mod=sample_mod,
            init_ids=init_ids,
            round_to=round_to,
        )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", _norm(F.col("v")))
    # per-centroid cosine structs, dot ROUNDED 6 with ties to the
    # LARGER centroid id — the exact ivf_assign convention, so the
    # final assignment uses the same rule the training loop used
    pairs = F.array(
        *[
            F.struct(
                F.round(
                    _dot(F.col("v"), F.array(*[F.lit(float(x)) for x in c]))
                    / F.col("vn"),
                    6,
                ).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(pairs)
    return base.select(
        "vec_id",
        F.when(F.col("vn") > 0, best["c"])
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("cluster"),
        F.when(F.col("vn") > 0, best["d"])
        .otherwise(F.lit(0.0))
        .alias("cosine"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize every vector to one
    cluster (:func:`ivf_assign`), probe each query's ``n_probe`` best
    clusters, exact cosine re-rank among the candidates. Same output
    schema as the brute-force baseline.

    Scale shape: candidates come from a CLUSTER EQUI-JOIN against the
    tiny broadcast (query × probe) list — never a cross join; at
    100 TB the base side is stored bucketed/partition-pruned by
    cluster id, so a probe touches ``n_probe / n_centroids`` of the
    data. ``n_probe == n_centroids`` degrades to exact brute force
    (tested). ``centroids=None`` trains deterministic spherical
    k-means; pass :func:`pseudo_random_centroids` for the untrained
    oracle-replicable quantizer.
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings, n_centroids, n_iters, id_col, vec_col
        )
    n_probe = min(n_probe, len(centroids))
    base = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            _as_double(F.col(vec_col)).alias("v"),
        )
        .withColumn("vn", _norm(F.col("v")))
        .withColumn("cl", ivf_assign(F.col("v"), centroids))
    )
    # per-query probe list: the n_probe clusters with the largest
    # (rounded) centroid dot — desc by (d, c), the reverse of
    # array_sort's asc (d, c) order, mirroring ivf_assign's tie rule
    probe_structs = F.array(
        *[
            F.struct(
                F.round(
                    _dot(F.col("v"), F.array(*[F.lit(float(x)) for x in c])), 6
                ).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    queries = (
        base.where(F.col("vec_id").isin([int(q) for q in query_ids]))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("vn").alias("qn"),
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(probe_structs)), 1, n_probe),
                    lambda s: s["c"],
                )
            ).alias("cl"),
        )
    )
    # each base vector lives in exactly ONE cluster and probe clusters
    # are distinct, so (query_id, vec_id) pairs are already unique
    cands = base.join(F.broadcast(queries), "cl").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_overflow_buckets(
    embeddings: DataFrame,
    max_bucket_size: int,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Audit report for :func:`cosine_near_duplicates`'s
    ``max_bucket_size``: the LSH buckets it would DROP at that cap —
    ``(bucket, n_vecs)``. Same bucketing parameters ⇒ exact accounting
    of the recall-loss surface (the same seam
    :func:`cminer_spark.pipeline.dedup.lsh_overflow_buckets` provides
    for the MinHash path)."""
    return (
        embeddings.select(
            lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .where(F.col("n_vecs") > max_bucket_size)
    )


def cosine_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Embedding near-dup pairs ``(a, b, cosine)`` with cosine ≥
    threshold, candidate-limited to shared LSH buckets. The threshold
    test uses the cosine ROUNDED to 9 decimals so the pair set is
    stable across summation orders (engines / partitionings differ in
    the last ulp — same rationale as :func:`lsh_bucket`'s sign test).

    ``max_bucket_size`` (default on) is the mega-bucket guard: with
    only ``2^n_planes`` buckets, the within-bucket self-join is
    quadratic in bucket size, so one boilerplate-heavy bucket at
    corpus scale degenerates to all-pairs/2^n_planes. Buckets holding
    more than ``max_bucket_size`` vectors are dropped from the join
    (bounding output at ``max_bucket_size²`` per bucket) — the same
    cap-and-audit design as
    :func:`cminer_spark.pipeline.dedup.minhash_lsh_candidates`; audit
    the recall loss with :func:`embedding_overflow_buckets`, or raise
    ``n_planes`` so buckets shrink ``2×`` per extra plane. ``None``
    disables the cap."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    if max_bucket_size is not None:
        sizes = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
        base = (
            base.join(sizes, "bucket")
            .where(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a = base.select(F.col("vec_id").alias("a"), F.col("v").alias("va"), "bucket")
    b = base.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias(
                "cosine"
            ),
        )
        .where(F.round(F.col("cosine"), 9) >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_dedup_clusters(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cc_rounds: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Semantic (embedding-cosine) dedup clustering:
    ``(vec_id, cluster_id, is_canonical)`` for EVERY input vector.

    The pair graph is :func:`cosine_near_duplicates` (LSH-bucketed
    with the ``max_bucket_size`` mega-bucket cap, never all-pairs —
    the 100 TB path), closed transitively by fixed-round hash-min
    connected components; cluster id is the component minimum, the
    canonical vector is the one equal to its cluster id. Near-dup
    clusters are dense (diameter ≈ 2-3), so a handful of rounds
    converges; the fixed round count keeps the DuckDB gate oracle
    exactly unrollable.
    """
    from cminer_spark.operators.components import hashmin_components

    pairs = cosine_near_duplicates(
        embeddings, threshold, dim, n_planes, id_col, vec_col,
        max_bucket_size=max_bucket_size,
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = hashmin_components(
        pairs,
        rounds=cc_rounds,
        vertices=embeddings.select(F.col(id_col).alias("v_id")),
    )
    return comp.select(
        F.col("v_id").alias("vec_id"),
        F.col("component").alias("cluster_id"),
        (F.col("v_id") == F.col("component")).alias("is_canonical"),
    )
