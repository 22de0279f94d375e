"""URL parse + registered-domain heuristic + per-domain caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_spark.functions.urls import (
    domain_caps, registered_domain, url_parse,
)


def _parse_one(spark, url: str):
    return (
        spark.range(1)
        .select(url_parse(F.lit(url)).alias("u"))
        .select("u.*")
        .collect()[0]
    )


def test_parse_basic(spark):
    r = _parse_one(spark, "https://www.Example.COM/a/b?q=1#frag")
    assert (r.scheme, r.host, r.port, r.path) == (
        "https", "www.example.com", -1, "/a/b")


def test_parse_port_and_bare(spark):
    r = _parse_one(spark, "http://blog.site.co.uk:8080/x")
    assert (r.host, r.port, r.path) == ("blog.site.co.uk", 8080, "/x")
    r = _parse_one(spark, "https://site.org")
    assert (r.host, r.port, r.path) == ("site.org", -1, "")


def test_parse_garbage_sentinels(spark):
    r = _parse_one(spark, "not a url at all")
    assert (r.scheme, r.host, r.port, r.path) == ("", "", -1, "")


def test_registered_domain(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.c.example.com": "example.com",
        "blog.site.co.uk": "site.co.uk",
        "x.ac.jp": "x.ac.jp",          # 2nd-to-last 'ac', 2-letter cc
        "deep.sub.gov.br": "sub.gov.br",
        "example.org": "example.org",
        "localhost": "localhost",
        # generic SLD label NOT under a 2-letter cc → plain 2-label
        "a.co.com": "co.com",
    }
    rows = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).select("host", registered_domain(F.col("host")).alias("d")).collect()
    got = {r.host: r.d for r in rows}
    assert got == cases


def test_domain_caps_exact_k(spark):
    rows = [
        (i, f"https://{'spam' if i % 2 else 'ok'}.example."
            f"{'com' if i % 2 else 'org'}/p/{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = domain_caps(df, "url", "doc_id", k=7)
    counts = {r.domain: r.n for r in
              capped.groupBy("domain").agg(F.count("*").alias("n"))
              .collect()}
    assert counts == {"example.com": 7, "example.org": 7}
    # deterministic: same rows every run
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in domain_caps(
        df, "url", "doc_id", k=7).collect())
    assert a == b


def test_parse_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example.com/x")], "doc_id long, url string"
    ).select(url_parse(F.col("url")).alias("u"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_url_blocklist_suffix_semantics(spark):
    from lens_spark.functions.urls import url_blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://ads.example.com/x"),    # subdomain -> blocked
            (2, "https://example.com/y"),        # exact -> blocked
            (3, "https://notexample.com/z"),     # substring -> KEPT
            (4, "https://deep.a.b.tracker.net/q"),  # deep subdomain
            (5, "https://clean.org/ok"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("example.com",), ("tracker.net",)], "domain string"
    )
    kept = sorted(
        r.doc_id
        for r in url_blocklist_filter(docs, "url", "doc_id", bl).collect()
    )
    assert kept == [3, 5]
    allowed = sorted(
        r.doc_id
        for r in url_blocklist_filter(
            docs, "url", "doc_id", bl, keep=True
        ).collect()
    )
    assert allowed == [1, 2, 4]


def test_url_blocklist_normalizes_entries(spark):
    from lens_spark.functions.urls import url_blocklist_filter

    docs = spark.createDataFrame(
        [(1, "https://www.shady.example/x"), (2, "https://ok.example/y")],
        "doc_id long, url string",
    )
    # messy blocklist file: whitespace, case, blank line
    bl = spark.createDataFrame(
        [("  Shady.EXAMPLE ",), ("",)], "value string"
    )
    kept = [r.doc_id for r in
            url_blocklist_filter(docs, "url", "doc_id", bl).collect()]
    assert kept == [2]
