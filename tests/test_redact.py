"""PII redaction: pattern behavior, count semantics, null handling,
and Spark/DuckDB oracle parity on the planted-PII gate frame."""

import pytest

from cminer_spark.pipeline.redact import redact_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = redact_pii(df).orderBy("doc_id").collect()
    return rows


def test_each_kind_masked_and_counted(spark):
    rows = _run(
        spark,
        [
            "mail me at a.b+c@sub.example.org today",
            "ssn is 123-45-6789 ok",
            "call 555-010-4242 now",
            "host 192.168.0.1 up",
        ],
    )
    assert rows[0].text_redacted == "mail me at <EMAIL> today"
    assert (rows[0].n_email, rows[0].n_pii) == (1, 1)
    assert rows[1].text_redacted == "ssn is <SSN> ok"
    assert (rows[1].n_ssn, rows[1].n_pii) == (1, 1)
    assert rows[2].text_redacted == "call <PHONE> now"
    assert (rows[2].n_phone, rows[2].n_pii) == (1, 1)
    assert rows[3].text_redacted == "host <IP> up"
    assert (rows[3].n_ipv4, rows[3].n_pii) == (1, 1)


def test_multiple_and_mixed(spark):
    (r,) = _run(spark, ["x@y.io and z@w.dev via 10.0.0.1 ssn 000-11-2222"])
    assert r.text_redacted == "<EMAIL> and <EMAIL> via <IP> ssn <SSN>"
    assert (r.n_email, r.n_ipv4, r.n_ssn, r.n_phone) == (2, 1, 1, 0)
    assert r.n_pii == 4


def test_counts_are_on_original_text(spark):
    # an SSN-shaped span inside a phone number must not double count:
    # patterns are disjoint here, but counts must come from the
    # original text, not the partially-redacted one
    (r,) = _run(spark, ["555-010-4242 and 123-45-6789"])
    assert r.n_phone == 1 and r.n_ssn == 1 and r.n_pii == 2


def test_no_pii_passthrough_and_null(spark):
    rows = _run(spark, ["hello world 42", None])
    assert rows[0].text_redacted == "hello world 42"
    assert rows[0].n_pii == 0
    assert rows[1].text_redacted is None
    assert rows[1].n_pii is None


def test_word_boundaries_hold(spark):
    # digits embedded in longer runs are not SSNs/phones/IPs
    (r,) = _run(spark, ["x1234-45-67890 9555-010-42421 1.2.3.4.5"])
    assert r.n_ssn == 0 and r.n_phone == 0
    # 1.2.3.4.5: '.' is a non-word char so \b matches around digit
    # runs — the leading 4 octets match, the trailing .5 survives
    assert r.n_ipv4 == 1
    assert r.text_redacted.endswith(".5")


def test_kind_subset_and_unknown_kind(spark):
    df = spark.createDataFrame(
        [(0, "a@b.co 10.0.0.1")], "doc_id long, text string"
    )
    (r,) = redact_pii(df, kinds=["email"]).collect()
    assert r.text_redacted == "<EMAIL> 10.0.0.1"
    assert not hasattr(r, "n_ipv4")
    with pytest.raises(ValueError):
        redact_pii(df, kinds=["email", "nope"])


def test_gate_parity_vs_duckdb(spark):
    import duckdb

    from cminer_spark.gate_pipeline import q_redact_pii, redact_oracle_sql

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (
            (r.doc_id, r.text_redacted, r.n_email, r.n_ssn, r.n_phone,
             r.n_ipv4, r.n_pii)
            for r in q_redact_pii(spark, sf_dir).collect()
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(tuple(t) for t in con.execute(redact_oracle_sql()).fetchall())
    assert got == want
