"""URL canonicalization (operators/urls.py) — RFC 3986 syntax-based
normalization + tracking-param strip, the crawl-frontier first dedup
pass. The oracle gate (`doc_url_dedup`) pins Spark/DuckDB agreement;
this pins the SEMANTICS on adversarial single cases."""

from __future__ import annotations

from graphiti_spark.operators.urls import url_dup_groups, with_canonical_url


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(1, url)], "id long, url string")
    return with_canonical_url(df).collect()[0]["canonical_url"]


def test_case_www_port_fragment_tracking(spark):
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&gclid=1#frag")
        == "https://example.com/a/b"
    )


def test_default_port_is_scheme_specific(spark):
    # :80 is default ONLY for http; on https it must survive
    assert _canon(spark, "http://example.com:80/x") == "http://example.com/x"
    assert _canon(spark, "https://example.com:80/x") == "https://example.com:80/x"
    assert _canon(spark, "https://example.com:443/x") == "https://example.com/x"
    assert _canon(spark, "http://example.com:8080/x") == "http://example.com:8080/x"


def test_param_sort_and_partial_strip(spark):
    # non-tracking params survive, sorted; tracking ones vanish
    assert (
        _canon(spark, "https://example.com/p?b=2&utm_campaign=z&a=1&fbclid=q")
        == "https://example.com/p?a=1&b=2"
    )
    # ref is tracking; refx is not (anchored prefix match, not substring)
    assert (
        _canon(spark, "https://example.com/p?refx=keep&ref=drop")
        == "https://example.com/p?refx=keep"
    )


def test_trailing_slash_and_empty_path(spark):
    assert _canon(spark, "https://example.com/a///") == "https://example.com/a"
    assert _canon(spark, "https://example.com/") == "https://example.com"
    assert _canon(spark, "https://example.com") == "https://example.com"


def test_group_assignment_keeps_min_id(spark):
    rows = [
        (7, "https://example.com/a"),
        (3, "HTTP://WWW.OTHER.ORG/b?utm_x=1"),
        (9, "https://www.example.com/a/#top"),
        (4, "http://other.org/b"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: (r["canonical_id"], r["keep"], r["n_variants"])
           for r in url_dup_groups(df).collect()}
    assert out[7] == (7, 1, 2) and out[9] == (7, 0, 2)
    assert out[3] == (3, 1, 2) and out[4] == (3, 0, 2)
