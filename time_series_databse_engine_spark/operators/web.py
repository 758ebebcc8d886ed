"""Crawl-tier text extraction: HTML stripping and URL canonicalization.

The first mile of a 100 TB training-data pipeline is crawl cleanup —
before dedup, before quality scoring, the corpus is raw HTML keyed by
messy URLs.  Two operators cover that mile, both as pure Catalyst
column expressions (chained ``regexp_replace`` / array ops — JVM
whole-stage codegen, zero shuffles, zero Python):

* :func:`strip_html` — drop script/style/comment blocks, then tags,
  decode the six ubiquitous character entities, collapse whitespace.
  Emits a ``visible_ratio`` (visible/raw length) column — the classic
  boilerplate-density quality signal (a page that is 95 % markup is
  navigation chrome, not prose).
* :func:`normalize_urls` — canonical form for dedup keys: lowercase
  scheme/host, strip default ports, drop fragments, remove tracking
  parameters (``utm_*``/``fbclid``/``gclid``), SORT the surviving
  query parameters (param order is not semantic), trim trailing
  slashes.  Same-page URLs that differ only in tracking noise collapse
  to one key.
* :func:`host_profile` — per-host crawl rollup over normalized URLs
  (page count, distinct paths, querystring share): the table a crawl
  scheduler prioritizes from.

Scale notes: all three are narrow projections — at 100 TB the scans
read (id, html|url) only, the string work rides inside the scan's
codegen stage, and only ``host_profile`` shuffles (one partial-agg
exchange keyed by host, output |hosts| rows).  Every regex below is
deliberately in the common RE2/Java subset (no backrefs, no
lookbehind) so the DuckDB oracles replay the exact same patterns.

Reference parity: the reference engine (SURVEY.md §2.1) has no text
surface; this extends the §2.2 LLM-pipeline tier next to text.py's
quality/dedup signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# Block-level elements whose *content* is invisible, not just the tags.
# One pattern per element — NO backreferences, so the identical pattern
# replays under RE2 (the DuckDB oracle) and java.util.regex alike.
_BLOCK_DROPS = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<noscript\b[^>]*>.*?</noscript\s*>",
]
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"(?s)<[^>]*>"

# The six entities that dominate real crawl text.  Order matters:
# &amp; must decode LAST or "&amp;lt;" would double-decode to "<".
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# Tracking parameters stripped during canonicalization (public lists:
# UTM campaign tags, Facebook/Google click ids).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid)="


def strip_html(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) → (id, text, raw_len, visible_len, visible_ratio).

    Regex-chain extraction — the 90 % answer a distributed pipeline
    wants (a DOM parser is per-doc Python; this is whole-stage codegen).
    Cites trafilatura/jusText only as the *concept* source for the
    visible-ratio boilerplate signal; the implementation is plain
    regex + length arithmetic.
    """
    raw = F.col(html_col)
    visible = raw
    for pat in _BLOCK_DROPS:
        visible = F.regexp_replace(visible, pat, " ")
    visible = F.regexp_replace(visible, _COMMENT, " ")
    visible = F.regexp_replace(visible, _TAG, " ")
    for ent, ch in _ENTITIES:
        visible = F.regexp_replace(visible, ent, ch)
    visible = F.trim(F.regexp_replace(visible, r"\s+", " "))
    out = df.select(
        F.col(id_col),
        visible.alias("text"),
        F.length(raw).alias("raw_len"),
        F.length(visible).alias("visible_len"),
    )
    return out.withColumn(
        "visible_ratio",
        F.round(
            F.when(F.col("raw_len") > 0, F.col("visible_len") / F.col("raw_len"))
            .otherwise(F.lit(0.0)),
            6,
        ),
    )


def normalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url) → (id, url_norm, host, path, n_params).

    Canonicalization steps (each one a pure column expression):

    1. split scheme / authority / path / query / fragment by regex;
    2. scheme + host lowercased; userinfo is NOT handled (crawl URLs
       don't carry it; a row with one keeps it in the host slot and
       still normalizes deterministically);
    3. default ports stripped (``:80`` http, ``:443`` https);
    4. fragment dropped;
    5. query split on ``&``, tracking params removed
       (``utm_*``/``fbclid``/``gclid``/``msclkid``), empties removed,
       survivors SORTED lexicographically and rejoined;
    6. path ``//`` collapsed and a single trailing ``/`` trimmed
       (root path becomes empty, canonical hosts compare equal).
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    # authority = host[:port]; host lowercased, default port dropped
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    params = F.array_sort(params)
    query_norm = F.array_join(params, "&")
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(F.size(params) > 0, F.concat(F.lit("?"), query_norm)).otherwise(
            F.lit("")
        ),
    )
    return df.select(
        F.col(id_col),
        url_norm.alias("url_norm"),
        host.alias("host"),
        path.alias("path"),
        F.size(params).cast("int").alias("n_params"),
    )


def host_profile(urls: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Normalized-URL table → per-host crawl rollup:
    (host, n_pages, n_paths, n_query_pages, with_query_frac).  ONE
    partial-aggregated exchange keyed by host; output is |hosts| rows.
    ``n_query_pages`` is the integer twin of the frac (exact under any
    hash gate; the frac is the human-facing rate)."""
    return (
        urls.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("path").alias("n_paths"),
            F.sum(F.when(F.col("n_params") > 0, 1).otherwise(0)).alias(
                "n_query_pages"
            ),
            F.round(
                F.avg(F.when(F.col("n_params") > 0, 1.0).otherwise(0.0)), 6
            ).alias("with_query_frac"),
        )
    )


# Pinned snapshot of the multi-label entries a crawl pipeline actually
# hits — the registrable-domain boundary is NOT "last two labels" for
# these registries (publicsuffix.org; swap in the full PSL table at
# production scale, the expression shape is unchanged: the list rides
# as a broadcast literal either way).
MULTI_LABEL_SUFFIXES = [
    "co.uk", "ac.uk", "org.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "com.tw", "co.za", "org.za", "com.sg", "com.hk", "com.ar",
]


def registered_domain(host_col) -> F.Column:
    """eTLD+1 (registrable domain) of an already-lowercased host — the
    unit domain-level curation actually caps on: ``www.example.co.uk``,
    ``cdn.example.co.uk`` and ``example.co.uk`` are one publisher, and a
    per-HOST cap would hand a subdomain farm cap × |subdomains| slots.

    Pure column expression: split on dots, take the last 3 labels when
    the last 2 are a pinned multi-label public suffix, else the last 2;
    bare suffixes and single labels pass through unchanged.
    """
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def domain_cap_sample(
    df: DataFrame,
    cap: int = 100,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registered-domain page cap — the RefinedWeb/C4 rebalancing
    step between URL canonicalization and text dedup: without it a
    handful of template-heavy domains (forums, e-commerce listings)
    dominate the token budget.  Keeps at most ``cap`` pages per eTLD+1
    in deterministic md5(id) order (growth/retry-invariant, uniform
    within each domain).

    Output: (id, host, domain).  Shape: the URL parse and the domain
    expression ride the scan; ONE domain-keyed exchange for the
    row_number, and the ``rn <= cap`` filter rides Spark's map-side
    WindowGroupLimit so each map task forwards at most ``cap`` rows per
    domain before the shuffle — a hot domain never concentrates its
    full page list on one task (the diverse_sample guard, re-used).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    urls = normalize_urls(df, url_col=url_col, id_col=id_col)
    keyed = urls.select(
        id_col, "host", registered_domain("host").alias("domain")
    )
    w = W.partitionBy("domain").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
