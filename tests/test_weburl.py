"""URL canonicalization (operators/weburl.py): hand-pinned normal forms,
idempotence, and the census rollup."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_hadoop_spark.operators.weburl import canonicalize_url, url_census

CASES = [
    # (raw, canon, domain)
    ("HTTPS://WWW.Site.com:443/p?utm_source=x&id=1#frag",
     "https://site.com/p?id=1", "site.com"),
    ("http://Example.org:80/A/B", "http://example.org/A/B", "example.org"),
    ("https://m.shop.co.uk/x?b=2&a=1", "https://m.shop.co.uk/x?a=1&b=2",
     "shop.co.uk"),
    ("https://news.site.com/", "https://news.site.com/", "site.com"),
    ("https://site.com/p?utm_a=1&utm_b=2", "https://site.com/p", "site.com"),
    ("https://host/path", "https://host/path", "host"),
    # :8080 is NOT a default port and must survive
    ("https://site.com:8080/p", "https://site.com:8080/p", "site.com"),
    # path case preserved
    ("https://site.com/CaseSensitive", "https://site.com/CaseSensitive",
     "site.com"),
]


def _canon(spark, urls):
    df = spark.createDataFrame([Row(url=u) for u in urls])
    c = canonicalize_url(F.col("url"))
    return [
        (r["canon"], r["domain"])
        for r in df.select(c["canon"].alias("canon"), c["domain"].alias("domain")).collect()
    ]


def test_hand_pinned_cases(spark):
    got = _canon(spark, [c[0] for c in CASES])
    for (raw, canon, domain), (g_canon, g_domain) in zip(CASES, got):
        assert g_canon == canon, raw
        assert g_domain == domain, raw


def test_idempotent(spark):
    once = [c for c, _ in _canon(spark, [c[0] for c in CASES])]
    twice = [c for c, _ in _canon(spark, once)]
    assert once == twice


def test_census(spark):
    urls = [
        "https://www.a.com/1", "https://A.com/1#x", "https://a.com/2",
        "https://b.co.uk/1",
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    got = {r["domain"]: (r["n_urls"], r["n_canon"]) for r in url_census(df).collect()}
    assert got["a.com"] == (3, 2)  # /1 twice (www + fragment), /2 once
    assert got["b.co.uk"] == (1, 1)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([Row(url=c[0]) for c in CASES])
    plan = url_census(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
