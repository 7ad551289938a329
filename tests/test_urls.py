"""URL canonicalization rules, case by case."""

import pyspark.sql.functions as F

from corpus_dedup_spark.functions.urls import canonical_url_expr

CASES = [
    # scheme/host case + www + default port + fragment
    ("HTTPS://WWW.Example.COM:443/a/1#frag", "https://example.com/a/1"),
    ("http://Example.com:80/a/1", "http://example.com/a/1"),
    # non-default port survives
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # https keeps :80 (not its default)
    ("https://example.com:80/x", "https://example.com:80/x"),
    # tracking params dropped, separators tidied
    ("http://e.com/p?utm_source=a&q=1", "http://e.com/p?q=1"),
    ("http://e.com/p?q=1&utm_campaign=x", "http://e.com/p?q=1"),
    ("http://e.com/p?utm_source=a", "http://e.com/p"),
    ("http://e.com/p?gclid=abc&fbclid=def&q=2", "http://e.com/p?q=2"),
    # trailing slash (also before ?)
    ("http://e.com/p/", "http://e.com/p"),
    ("http://e.com/p/?q=1", "http://e.com/p?q=1"),
    # bare root
    ("http://e.com", "http://e.com/"),
    ("http://e.com/", "http://e.com/"),
    # www only stripped as a prefix label
    ("http://wwwx.com/p", "http://wwwx.com/p"),
    # boundary anchoring: params merely CONTAINING a tracking name survive
    ("http://e.com/p?sgclid=1", "http://e.com/p?sgclid=1"),
    ("http://e.com/p?myutm_x=2&q=1", "http://e.com/p?myutm_x=2&q=1"),
    # a VALUE containing 'utm_x=' is not truncated
    ("http://e.com/p?q=utm_x=foo", "http://e.com/p?q=utm_x=foo"),
    # consecutive tracking params all drop, separators tidied
    ("http://e.com/p?utm_a=1&utm_b=2&q=3", "http://e.com/p?q=3"),
    ("http://e.com/p?utm_a=1&gclid=2", "http://e.com/p"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r["c"] for r in
           df.select(canonical_url_expr(F.col("url")).alias("c")).collect()]
    for (u, want), g in zip(CASES, got):
        assert g == want, f"{u!r}: got {g!r}, want {want!r}"


def test_canonical_merges_variant_spellings(spark):
    variants = [
        "HTTPS://WWW.Site.COM:443/a/1/?utm_source=f&q=0#sec",
        "https://site.com/a/1?q=0",
        "https://www.site.com/a/1/?q=0",
    ]
    df = spark.createDataFrame([(u,) for u in variants], ["url"])
    canon = {r["c"] for r in
             df.select(canonical_url_expr(F.col("url")).alias("c")).collect()}
    assert canon == {"https://site.com/a/1?q=0"}
