"""URL canonicalization: hand-computed rule pins + plan gates."""

from pyspark.sql import functions as F

from carto_etl_spark.operators import urls


CASES = [
    # every rule at once: scheme/host case, www, default port, trailing
    # slash, tracking-param drop, param sort
    ("HTTPS://WWW.Shop3.Example.COM:443/Catalog/Item-5/?id=7&utm_source=f&ref=a&b=2&a=1",
     "https://shop3.example.com/Catalog/Item-5?a=1&b=2&id=7",
     "shop3.example.com", "example.com"),
    # non-default port survives; doubled trailing slash fully stripped
    ("http://ex.org:8080/a//", "http://ex.org:8080/a", "ex.org", "ex.org"),
    # default http port stripped; query that is ALL tracking drops its '?'
    ("http://ex.org:80/a?utm_x=1", "http://ex.org/a", "ex.org", "ex.org"),
    # fragment discarded; params sorted; subdomain kept, domain is last two
    ("https://sub.ex.org/p?z=9&a=1#frag", "https://sub.ex.org/p?a=1&z=9",
     "sub.ex.org", "ex.org"),
    # ftp default port; host case folded
    ("ftp://Files.Ex.org:21/pub/", "ftp://files.ex.org/pub",
     "files.ex.org", "ex.org"),
    # no path, no query: canonical is scheme://host
    ("https://ex.org", "https://ex.org", "ex.org", "ex.org"),
    # path case preserved, percent-encoding untouched
    ("https://ex.org/A%2Fb", "https://ex.org/A%2Fb", "ex.org", "ex.org"),
    # userinfo stripped before the host/port split (user@host)
    ("https://user@Ex.org/", "https://ex.org", "ex.org", "ex.org"),
    # user:pw@ must NOT make the host 'user'; port still parses after it
    ("http://user:pw@ex.org:8080/a", "http://ex.org:8080/a",
     "ex.org", "ex.org"),
    # bracketed IPv6 literal: one host token, port after the bracket
    ("http://[2001:DB8::1]:8080/a", "http://[2001:db8::1]:8080/a",
     "[2001:db8::1]", ""),
    # bracketed IPv6 with default port: port stripped, brackets kept
    ("https://[::1]:443/x/", "https://[::1]/x", "[::1]", ""),
]


def test_canonicalize_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "doc_id long, url string"
    )
    got = {
        r.doc_id: (r.canonical_url, r.host, r.domain)
        for r in urls.canonicalize(df, "url").collect()
    }
    for i, (_, canon, host, domain) in enumerate(CASES):
        assert got[i] == (canon, host, domain), f"case {i}: {got[i]}"


def test_canonicalize_plans_no_exchange_no_udf(spark):
    # the scale contract: canonicalization is a pure projection that rides
    # the scan — no shuffle, no Python
    df = spark.createDataFrame([(1, "https://ex.org/a")], "doc_id long, url string")
    plan = urls.canonicalize(df, "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_url_dedup_collapses_variants(spark):
    variants = [
        (10, "https://ex.org/p?id=1&utm_s=x"),
        (11, "HTTPS://WWW.ex.org:443/p/?id=1"),
        (12, "https://ex.org/p?ref=aff&id=1"),
        (20, "https://ex.org/p?id=2"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, url string")
    rows = {r.canonical_url: r for r in urls.url_dedup(df, "url", "doc_id").collect()}
    a = rows["https://ex.org/p?id=1"]
    assert (a.survivor, a.n_raw, a.n_spellings) == (10, 3, 3)
    b = rows["https://ex.org/p?id=2"]
    assert (b.survivor, b.n_raw, b.n_spellings) == (20, 1, 1)


def test_url_dedup_counts_repeated_spelling_once(spark):
    df = spark.createDataFrame(
        [(1, "https://ex.org/p"), (2, "https://ex.org/p"),
         (3, "https://ex.org/p/")],
        "doc_id long, url string",
    )
    (r,) = urls.url_dedup(df, "url", "doc_id").collect()
    assert (r.survivor, r.n_raw, r.n_spellings) == (1, 3, 2)


def test_custom_drop_params_and_null_url(spark):
    df = spark.createDataFrame(
        [(1, "https://ex.org/p?sess=9&id=1"), (2, None)],
        "doc_id long, url string",
    )
    out = df.select(
        "doc_id",
        urls.canonical_url_expr(F.col("url"), drop_params=("sess",)).alias("c"),
    ).orderBy("doc_id").collect()
    assert out[0].c == "https://ex.org/p?id=1"
    assert out[1].c is None


def test_canonicalization_is_a_fixpoint(spark):
    # canonical output fed back through the canonicalizer must not change —
    # the property that makes incremental re-crawls stable
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "doc_id long, url string"
    )
    once = urls.canonicalize(df, "url").select(
        "doc_id", F.col("canonical_url").alias("url")
    )
    twice = urls.canonicalize(once, "url").collect()
    for r in twice:
        assert r.canonical_url == r.url, (r.url, r.canonical_url)
