"""PII detection/redaction column expressions (functions/pii.py).

Hand-written positives AND near-miss negatives per kind, plus a Python
`re` cross-check on every fixture string — the module's oracle contract
depends on the patterns matching identically under Java regex (Spark),
RE2 (DuckDB), and `re` (here), so any engine divergence on these shapes
must fail loudly.
"""

import re

import pyspark.sql.functions as F

from hinbox_spark.functions.pii import PII_PATTERNS, pii_count, redact_pii

CASES = [
    # (text, n_email, n_phone, n_ipv4)
    ("mail me at alice.smith+news@sub.example.co.uk today", 1, 0, 0),
    ("two: a@b.io and c_d%e@f-g.org", 2, 0, 0),
    ("call 555-867-5309 or 212.555.0142", 0, 2, 0),
    ("server at 192.168.0.1 and 10.0.0.255", 0, 0, 2),
    ("mixed bob@x.net 555-123-4567 172.16.5.9", 1, 1, 1),
    # near-misses that must NOT match
    ("not an email: alice@localhost, price@2pm", 0, 0, 0),
    ("card 4111-1111-1111-1111 is not a phone", 0, 0, 0),
    ("version 1.2.3 and 1.2.3.4.5 tail", 0, 0, 1),  # first 4 octets match
    ("", 0, 0, 0),
]


def test_counts_and_python_re_agree(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    got = (
        df.select(
            "id",
            pii_count(F.col("text"), "email").alias("e"),
            pii_count(F.col("text"), "phone").alias("p"),
            pii_count(F.col("text"), "ipv4").alias("i"),
        )
        .orderBy("id")
        .collect()
    )
    for row, (text, ne, np_, ni) in zip(got, CASES):
        assert (row.e, row.p, row.i) == (ne, np_, ni), text
        # engine-parity leg: Python `re` over the same literal pattern
        for kind, want in (("email", ne), ("phone", np_), ("ipv4", ni)):
            pat = PII_PATTERNS[kind][0]
            assert len(re.findall(pat, text)) == want, (kind, text)


def test_redaction_replaces_all_and_only_pii(spark):
    df = spark.createDataFrame(
        [(0, "bob@x.net then 555-123-4567 at 172.16.5.9 ok bob@x.net")],
        "id long, text string",
    )
    out = df.select(redact_pii(F.col("text")).alias("r")).first().r
    assert out == "<EMAIL> then <PHONE> at <IPV4> ok <EMAIL>"


def test_redaction_order_email_first(spark):
    # the email's host digits must not be pre-chewed by the IP pattern
    df = spark.createDataFrame([(0, "x@10.1.2.3mail.com end")], "id long, text string")
    out = df.select(redact_pii(F.col("text")).alias("r")).first().r
    assert out == "<EMAIL> end"


def test_pipeline_scrub_pii_flag(spark, tmp_path):
    """cfg.scrub_pii=True scrubs article text before anything persists;
    content_hash hashes the PUBLISHED (scrubbed) text; default stays
    off so the byte-identical extraction invariant holds."""
    import datetime
    import hashlib

    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    from hinbox_spark.config import DomainConfig
    from hinbox_spark.pipeline import run_pipeline

    html = (
        "<html><head><title>Leak</title></head><body><h1>Leak</h1>"
        "<article><p>The committee chair Adam Vance wrote from"
        " bob@example.com or 555-123-4567 at 10.1.2.3 about Geneva."
        "</p></article></body></html>"
    ).encode()
    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("https://x.test/a.html", ts, html, "", "en")], schema
    )

    on = run_pipeline(
        spark, pages, str(tmp_path / "on"),
        cfg=DomainConfig(scrub_pii=True), resume=False,
    )
    row = on["articles"].first()
    assert "bob@example.com" not in row.text and "<EMAIL>" in row.text
    assert "555-123-4567" not in row.text and "<PHONE>" in row.text
    assert "10.1.2.3" not in row.text and "<IPV4>" in row.text
    assert row.content_hash == hashlib.sha256(row.text.encode()).hexdigest()

    off = run_pipeline(spark, pages, str(tmp_path / "off"), resume=False)
    assert "bob@example.com" in off["articles"].first().text


def test_random_text_engine_parity(spark):
    """Seeded fuzz leg: 300 random strings over a PII-shaped alphabet,
    Spark's match counts vs Python re's, one batched DataFrame."""
    import random

    rng = random.Random(17)
    alphabet = list("ab1@._- ") + ["555-", ".com", "@x.io", "10.0."]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = (
        df.select(
            "id",
            *[
                pii_count(F.col("text"), k).alias(k)
                for k in PII_PATTERNS
            ],
        )
        .orderBy("id")
        .collect()
    )
    for row, text in zip(got, texts):
        for kind in PII_PATTERNS:
            want = len(re.findall(PII_PATTERNS[kind][0], text))
            assert row[kind] == want, (kind, text)


def test_incremental_mode_scrubs_too(spark, tmp_path):
    """A scrub-enabled domain scrubs identically in incremental mode
    (and therefore in streaming KG ingest, which delegates to it)."""
    import dataclasses
    import datetime

    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    from hinbox_spark.config import get_default_config
    from hinbox_spark.incremental import run_incremental

    html = (
        "<html><head><title>Leak</title></head><body><h1>Leak</h1>"
        "<article><p>The committee chair Adam Vance wrote from"
        " bob@example.com about Geneva.</p></article></body></html>"
    ).encode()
    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    pages = spark.createDataFrame(
        [("https://x.test/a.html", datetime.datetime(2024, 1, 1), html, "", "en")],
        schema,
    )
    cfg = dataclasses.replace(
        get_default_config(),
        scrub_pii=True,
        snapshot_store_path=str(tmp_path / "store"),
    )
    out = run_incremental(
        spark, pages, str(tmp_path / "run"), cfg=cfg, run_id="r1"
    )
    text = out["articles"].first().text
    assert "bob@example.com" not in text and "<EMAIL>" in text
