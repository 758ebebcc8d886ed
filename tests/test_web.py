"""Crawl-tier operators: HTML stripping + URL canonicalization."""

import duckdb
import pytest

from time_series_databse_engine_spark.operators.web import (
    host_profile,
    normalize_urls,
    strip_html,
)


def test_strip_html_basic(spark):
    html = (
        "<html><head><title>T</title>"
        "<script type='text/javascript'>var x = '<b>not text</b>';</script>"
        "<style>p { color: red }</style></head>"
        "<!-- a comment with <tags> inside -->"
        "<body><h1>Hello</h1>\n<p>world &amp; friends &lt;3</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = strip_html(df).collect()[0]
    assert r.text == "T Hello world & friends <3"
    assert r.raw_len == len(html)
    assert r.visible_len == len(r.text)
    assert 0 < r.visible_ratio < 0.2  # markup-dominated page


def test_strip_html_entities_and_nbsp(spark):
    df = spark.createDataFrame(
        [(1, "<p>a&nbsp;&quot;b&#39;c&quot;&gt;d</p>")], "doc_id long, html string"
    )
    r = strip_html(df).collect()[0]
    assert r.text == "a \"b'c\">d"


def test_strip_html_amp_decodes_last(spark):
    # "&amp;lt;" is the LITERAL text "&lt;" — must not double-decode to "<"
    df = spark.createDataFrame([(1, "<p>&amp;lt;</p>")], "doc_id long, html string")
    assert strip_html(df).collect()[0].text == "&lt;"


def test_strip_html_empty_and_plain(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "no tags here")], "doc_id long, html string"
    )
    got = {r.doc_id: r for r in strip_html(df).collect()}
    assert got[1].text == "" and got[1].visible_ratio == 0.0
    assert got[2].text == "no tags here" and got[2].visible_ratio == 1.0


CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/a//b/", "http://www.example.com/a/b"),
    ("https://example.com:443/", "https://example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    (
        "https://example.com/p?utm_source=tw&b=2&a=1&fbclid=XYZ#frag",
        "https://example.com/p?a=1&b=2",
    ),
    ("https://example.com/p?gclid=1&msclkid=2&utm_campaign=x", "https://example.com/p"),
    ("http://example.com", "http://example.com"),
    ("https://example.com/p?z=9&z=1&y=", "https://example.com/p?y=&z=1&z=9"),
]


def test_normalize_urls_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {r.doc_id: r.url_norm for r in normalize_urls(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {CASES[i][0]} -> {got[i]} != {want}"


def test_normalize_urls_host_path_params(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://A.B.c/Dir/Page?utm_source=x&k=v")], "doc_id long, url string"
    )
    r = normalize_urls(df).collect()[0]
    assert r.host == "a.b.c"
    assert r.path == "/Dir/Page"  # path case is semantic, preserved
    assert r.n_params == 1


def test_host_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?k=v"),
            (2, "https://a.com/x"),
            (3, "https://a.com/y"),
            (4, "https://b.com/"),
        ],
        "doc_id long, url string",
    )
    got = {r.host: r for r in host_profile(normalize_urls(df)).collect()}
    assert got["a.com"].n_pages == 3
    assert got["a.com"].n_paths == 2
    assert got["a.com"].with_query_frac == pytest.approx(1 / 3, abs=1e-6)
    assert got["b.com"].n_pages == 1 and got["b.com"].n_paths == 1


def test_strip_html_regexes_replay_in_duckdb(spark):
    """The exact patterns must behave identically under RE2 — this is
    what lets the driver's DuckDB oracle replay the operator."""
    from time_series_databse_engine_spark.operators.web import (
        _BLOCK_DROPS,
        _COMMENT,
        _TAG,
    )

    html = (
        "<script a=b>junk</script><style>s</style><noscript>n</noscript>"
        "<!-- c --><p>keep &amp; this</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    spark_text = strip_html(df).collect()[0].text

    expr = "html"
    for pat in _BLOCK_DROPS + [_COMMENT, _TAG]:
        expr = f"regexp_replace({expr}, '{pat}', ' ', 'g')"
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ]:
        expr = f"regexp_replace({expr}, '{ent}', '{ch}', 'g')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    (duck_text,) = (
        duckdb.connect()
        .execute(f"SELECT {expr} FROM (SELECT ? AS html)", [html])
        .fetchone()
    )
    assert duck_text == spark_text == "keep & this"


def test_host_profile_skew_absorbed_map_side(spark):
    """Scale claim made concrete (SCALE.md "Crawl host skew"): a crawl
    where 90% of pages sit on ONE host must not funnel 90% of raw rows
    through a host-keyed exchange.  The plan that makes that true, and
    which this pins: (a) the FIRST aggregate before any exchange is
    partial-mode keyed (host, path) — distinct-path pre-reduction rides
    the scan, and the first shuffle hash-partitions on the COMPOSITE
    key, spreading the hot host across all partitions; (b) the
    host-keyed exchange afterwards carries only merged partials (one
    row per (host, path) per mapper at most), never pages."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.plans import (
        formatted_plan,
        num_shuffle_exchanges,
    )

    n = 20_000
    skewed = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot.example.com"))
        .otherwise(
            F.concat(F.lit("h"), (F.col("id") % 97).cast("string"), F.lit(".com"))
        )
        .alias("host"),
        # worst case for map-side collapse: every hot page a unique path
        F.concat(F.lit("/p/"), F.col("id").cast("string")).alias("path"),
        (F.col("id") % 3).cast("int").alias("n_params"),
    )
    out = host_profile(skewed)
    plan = formatted_plan(out)
    assert num_shuffle_exchanges(out) == 2  # (host,path) partials + host
    # detail-section ordering: the partial-mode (host, path) aggregate
    # must appear before the first hashpartitioning exchange
    first_shuffle = plan.index("Arguments: hashpartitioning")
    before = plan[:first_shuffle]
    assert "partial_count" in before, "no map-side combine before shuffle"
    assert "Keys [2]: [host" in before, (
        "first shuffle must be keyed (host, path), not host alone — "
        "otherwise the hot host lands on one reducer with raw pages"
    )
    shuffle_line = plan[first_shuffle:].splitlines()[0]
    assert "host" in shuffle_line and "path" in shuffle_line
    rows = {r.host: r for r in out.collect()}
    hot = rows["hot.example.com"]
    assert hot.n_pages == sum(1 for i in range(n) if i % 10 < 9)
    assert hot.n_paths == hot.n_pages  # unique paths by construction
    assert len(rows) == 1 + 97


def test_registered_domain_and_domain_cap(spark):
    """eTLD+1: multi-label public suffixes keep three labels, plain TLDs
    two, bare suffixes/single labels pass through; the cap counts ALL
    subdomains of a publisher against ONE budget; order is md5(id)
    deterministic; cap < 1 raises."""
    import pytest

    from time_series_databse_engine_spark.operators.web import (
        domain_cap_sample,
        registered_domain,
    )

    hosts = spark.createDataFrame(
        [
            ("www.example.co.uk",), ("cdn.example.co.uk",), ("example.co.uk",),
            ("deep.a.b.example.com",), ("example.com",), ("co.uk",),
            ("localhost",),
        ],
        ["host"],
    )
    got = {
        r["host"]: r["d"]
        for r in hosts.select("host", registered_domain("host").alias("d")).collect()
    }
    assert got["www.example.co.uk"] == "example.co.uk"
    assert got["cdn.example.co.uk"] == "example.co.uk"
    assert got["example.co.uk"] == "example.co.uk"
    assert got["deep.a.b.example.com"] == "example.com"
    assert got["example.com"] == "example.com"
    assert got["co.uk"] == "co.uk"
    assert got["localhost"] == "localhost"

    # 12 pages spread over www./cdn./bare subdomains of ONE publisher
    # plus 2 pages of another: cap=3 keeps 3 + 2
    subs = ["www.", "cdn.", ""]
    rows = [(i, f"https://{subs[i % 3]}pub.com/p{i}") for i in range(12)]
    rows += [(100, "https://other.org/x"), (101, "https://www.other.org/y")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = domain_cap_sample(df, cap=3)
    picked = out.collect()
    by_dom = {}
    for r in picked:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert len(by_dom["pub.com"]) == 3
    assert sorted(by_dom["other.org"]) == [100, 101]
    # determinism: rerun picks the identical ids
    again = {r["doc_id"] for r in domain_cap_sample(df, cap=3).collect()}
    assert again == {r["doc_id"] for r in picked}

    with pytest.raises(ValueError):
        domain_cap_sample(df, cap=0)
