"""int8 embedding quantization: exact codes, reconstruction quality,
degenerate vectors, oracle parity."""

from __future__ import annotations

import math

import duckdb

from cminer_spark.pipeline import dequantize_embeddings, quantize_embeddings


def test_known_codes_and_roundtrip(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),          # zero vector
        (2, [-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = {r.vec_id: (r.q_scale, list(r.q))
         for r in quantize_embeddings(df).collect()}
    assert q[0] == (1.0, [127, -64, 32, 0])   # round(0.5*127)=64 HALF_UP
    assert q[1] == (0.0, [0, 0, 0, 0])
    assert q[2] == (2.0, [-127, 127, 64, -64])

    out = dequantize_embeddings(quantize_embeddings(df)).collect()
    for r in out:
        orig, hat = r.embedding, r.embedding_hat
        n1 = math.sqrt(sum(a * a for a in orig))
        if n1 == 0:
            assert all(v == 0.0 for v in hat)
            continue
        n2 = math.sqrt(sum(a * a for a in hat))
        cos = sum(a * b for a, b in zip(orig, hat)) / (n1 * n2)
        assert cos > 0.999


def test_reconstruction_quality_random(spark):
    import random

    rng = random.Random(4)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dequantize_embeddings(quantize_embeddings(df)).collect()
    worst = 1.0
    for r in out:
        n1 = math.sqrt(sum(a * a for a in r.embedding))
        n2 = math.sqrt(sum(a * a for a in r.embedding_hat))
        cos = sum(a * b for a, b in zip(r.embedding, r.embedding_hat)) / (
            n1 * n2
        )
        worst = min(worst, cos)
    assert worst > 0.999


def test_gate_parity(spark):
    import __spark_entry__ as E
    from cminer_spark.gate_pipeline import QUANTIZE_SQL

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.vec_id, r.q_scale, r.pos, r.code)
        for r in E.queries()["quantize_int8"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        (int(a), float(b), int(p), int(c))
        for a, b, p, c in con.execute(QUANTIZE_SQL).fetchall()
    )
    assert got == want


def test_flattened_gate_rows_reconstruct_vectors(spark):
    """The flattened (vec_id, q_scale, pos, code) gate contract must
    still carry the full quantization: vectors reassembled from the
    gate rows dequantize to >0.999 cosine against the source
    embeddings (the round-trip property the pre-flattening array gate
    proved directly)."""
    import collections

    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.001"
    emb = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    rows = E.queries()["quantize_int8"](spark, sf_dir).collect()
    vecs = collections.defaultdict(dict)
    scales = {}
    for r in rows:
        vecs[r.vec_id][r.pos] = r.code
        scales[r.vec_id] = r.q_scale
    assert set(vecs) == set(emb)
    worst = 1.0
    for vid, byname in vecs.items():
        dim = len(emb[vid])
        assert sorted(byname) == list(range(dim))  # dense, 0-based
        hat = [byname[p] * scales[vid] / 127.0 for p in range(dim)]
        n1 = math.sqrt(sum(a * a for a in emb[vid]))
        n2 = math.sqrt(sum(a * a for a in hat))
        if n1 == 0 or n2 == 0:
            continue
        cos = sum(a * b for a, b in zip(emb[vid], hat)) / (n1 * n2)
        worst = min(worst, cos)
    assert worst > 0.999
