"""URL canonicalization: normalization rules + registered-domain heuristic
+ the Spark dedup path over canonical URLs."""

from hinbox_spark.functions.urltools import normalize_url, registered_domain


def test_normalize_url_rules():
    # case, default port, fragment, trailing slash
    assert (
        normalize_url("HTTPS://News.Example.COM:443/Path/?b=2&a=1#frag")
        == "https://news.example.com/Path?a=1&b=2"
    )
    # non-default port kept; tracking params dropped; blank values kept
    assert (
        normalize_url("http://x.org:8080/a/?utm_source=tw&q=&z=9")
        == "http://x.org:8080/a?q=&z=9"
    )
    # bare host gets a root path; root slash kept
    assert normalize_url("http://x.org") == "http://x.org/"
    assert normalize_url("http://x.org/") == "http://x.org/"
    assert normalize_url("") == ""
    # fbclid/gclid also dropped
    assert normalize_url("http://x.org/p?fbclid=abc&id=1") == "http://x.org/p?id=1"


def test_registered_domain():
    assert registered_domain("https://news.example.com/a") == "example.com"
    assert registered_domain("https://a.b.co.uk/x") == "b.co.uk"
    assert registered_domain("http://localhost/x") == "localhost"
    assert registered_domain("https://deep.sub.site.com.au") == "site.com.au"
    assert registered_domain("") == ""


def test_url_dedup_path(spark):
    """Canonical-URL dedup: re-crawled variants of one page collapse to a
    single canonical key; per-domain counts aggregate on registered
    domain."""
    import pyspark.sql.functions as F

    from hinbox_spark.functions.urltools import (
        normalize_url_udf, registered_domain_udf,
    )

    df = spark.createDataFrame(
        [
            (1, "https://News.Example.com/story/?utm_source=x"),
            (2, "https://news.example.com/story"),
            (3, "https://news.example.com:443/story/"),
            (4, "https://other.example.com/story"),
            (5, "https://a.b.co.uk/page"),
        ],
        "id long, url string",
    )
    keyed = df.withColumn("curl", normalize_url_udf(F.col("url"))).withColumn(
        "domain", registered_domain_udf(F.col("url"))
    )
    groups = {
        r["curl"]: r["n"]
        for r in keyed.groupBy("curl").agg(F.count("*").alias("n")).collect()
    }
    assert groups["https://news.example.com/story"] == 3
    domains = {
        r["domain"]: r["n"]
        for r in keyed.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert domains == {"example.com": 4, "b.co.uk": 1}


def test_malformed_port_returns_input_unchanged():
    """ADVICE r2: parts.port raises ValueError for 'http://x:abc/' — it must
    not escape the try and kill the whole Arrow batch."""
    from hinbox_spark.functions.urltools import normalize_url, registered_domain

    assert normalize_url("http://x:abc/") == "http://x:abc/"
    # hostname itself parses ('x'); only .port raises — no batch kill either way
    assert registered_domain("http://x:abc/") == "x"
    assert registered_domain("http://[bad") == ""
    # sane URLs in the same batch still normalize
    assert normalize_url("HTTP://Example.COM:80/a/") == "http://example.com/a"
