"""URL canonicalization and URL-keyed dedup."""

import pyspark.sql.functions as F
import pytest

from yckg_spark.operators.urls import canonicalize_url, url_dedup

CANON_CASES = [
    # scheme + host case, default http port, trailing slash, fragment
    ("HTTP://WWW.Example.COM:80/a/b/#frag", "http://www.example.com/a/b"),
    # default https port
    ("https://Example.com:443/x", "https://example.com/x"),
    # non-default port kept
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # :80 is only default for http — kept on https
    ("https://example.com:80/x", "https://example.com:80/x"),
    # empty path -> /
    ("http://example.com", "http://example.com/"),
    ("http://example.com?a=1", "http://example.com/?a=1"),
    # params sorted, tracking dropped, fragment dropped
    (
        "http://e.com/p?z=9&utm_source=x&a=1&fbclid=F&b=2#s",
        "http://e.com/p?a=1&b=2&z=9",
    ),
    # all params tracking -> no query at all
    ("http://e.com/p?utm_campaign=c&gclid=g", "http://e.com/p"),
    # empty query marker dropped
    ("http://e.com/p?", "http://e.com/p"),
    # repeated slashes at end all stripped, inner kept
    ("http://e.com/a//b///", "http://e.com/a//b"),
    # userinfo preserved (lowercased with the authority)
    ("http://User@Example.com/x", "http://user@example.com/x"),
    # tracking match is key-anchored: a VALUE containing utm_ survives
    ("http://e.com/p?q=utm_source", "http://e.com/p?q=utm_source"),
    # ref is a tracking key; pref is not (anchored match)
    ("http://e.com/p?ref=home&pref=2", "http://e.com/p?pref=2"),
    # whitespace trimmed
    ("  http://e.com/x  ", "http://e.com/x"),
    # no scheme -> passed through trimmed, unchanged
    (" not a url ", "not a url"),
    ("/relative/path?a=1", "/relative/path?a=1"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonicalize_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op."""
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], "i long, url string"
    )
    once = df.select("i", canonicalize_url(F.col("url")).alias("c"))
    twice = once.select("i", canonicalize_url(F.col("c")).alias("c"))
    assert sorted(once.collect()) == sorted(twice.collect())


@pytest.fixture
def dup_docs(spark):
    return spark.createDataFrame(
        [
            (1, "HTTP://E.com:80/a/?utm_source=x", 10),
            (2, "http://e.com/a", 30),
            (3, "http://e.com/a#frag", 30),  # ties with 2 -> lower id wins
            (4, "https://e.com/a", 5),
            (5, "plain string", 1),
        ],
        "doc_id long, url string, n_chars long",
    )


def test_url_dedup_winner_and_counts(spark, dup_docs):
    rows = {r["url_canon"]: r for r in url_dedup(dup_docs).collect()}
    assert rows["http://e.com/a"]["keep_id"] == 2  # max n_chars, tie -> min id
    assert rows["http://e.com/a"]["n_dups"] == 3
    assert rows["https://e.com/a"]["keep_id"] == 4
    assert rows["https://e.com/a"]["n_dups"] == 1
    assert rows["plain string"]["n_dups"] == 1


def test_url_dedup_without_canonicalization(spark, dup_docs):
    rows = url_dedup(dup_docs, canonicalize=False).collect()
    # raw strings all differ -> no collapse
    assert len(rows) == 5
    assert all(r["n_dups"] == 1 for r in rows)


def test_url_dedup_null_order_loses(spark):
    df = spark.createDataFrame(
        [(1, "http://e.com/a", None), (2, "http://e.com/a", 0)],
        "doc_id long, url string, n_chars long",
    )
    (row,) = url_dedup(df).collect()
    assert row["keep_id"] == 2 and row["n_dups"] == 2


def test_host_of_edges(spark):
    from yckg_spark.operators.urls import host_of

    cases = [
        ("HTTP://User:Pw@WWW.Ex.COM:8080/a", "www.ex.com"),
        ("https://Ex.org", "ex.org"),
        ("http://[::1]:8080/x", "[::1]"),
        ("http://[2001:db8::1]/x", "[2001:db8::1]"),
        ("relative/path", ""),
        ("  https://pad.me/  ", "pad.me"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(host_of(F.col("url"))).collect()]
    assert got == [e for _, e in cases]


def test_host_stats_grouping_and_paths(spark):
    from yckg_spark.operators.urls import host_stats

    rows = [
        (1, "http://a.com/x", 10),
        (2, "HTTP://A.COM:80/x", 20),   # same host, same path
        (3, "http://a.com/y?q=1", 30),  # same host, new path (query excluded)
        (4, "no-scheme", 5),            # relative -> host ''
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    got = {r.host: (r.n_docs, r.n_paths, r.total_chars, r.mean_chars)
           for r in host_stats(df).collect()}
    assert got["a.com"] == (3, 2, 60, 20.0)
    assert got[""] == (1, 1, 5, 5.0)
    assert sum(v[0] for v in got.values()) == len(rows)  # doc count conserved


def test_url_filter_suffix_regex_and_relative(spark):
    from yckg_spark.operators.urls import url_filter

    rows = [
        (1, "http://a.example.com/x"),      # blocked: parent-domain suffix
        (2, "http://example.com/x"),        # blocked: exact
        (3, "http://notexample.com/x"),     # kept: suffix match is dotwise
        (4, "http://ok.org/spam/page"),     # blocked: regex
        (5, "http://ok.org/fine"),          # kept
        (6, "relative/no-host"),            # kept: nothing to judge
        (7, "HTTP://EXAMPLE.COM/upper"),    # blocked: case-insensitive host
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = {
        r.doc_id
        for r in url_filter(
            df, blocked_hosts=("example.com",), blocked_url_res=(r"/spam/",)
        ).collect()
    }
    assert kept == {3, 5, 6}


def test_url_filter_join_path_matches_literal_path(spark):
    from yckg_spark.operators.urls import url_filter

    rows = [(i, "http://h%d.site%d.com/p" % (i % 5, i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    hosts = ("site3.com", "h2.site5.com")
    lit_kept = {r.doc_id for r in url_filter(df, blocked_hosts=hosts).collect()}
    join_kept = {
        r.doc_id
        for r in url_filter(df, blocked_hosts=hosts, broadcast_limit=1).collect()
    }
    assert join_kept == lit_kept and 0 < len(lit_kept) < len(rows)


def test_url_filter_noop_without_lists(spark):
    from yckg_spark.operators.urls import url_filter

    df = spark.createDataFrame([(1, "http://x.com/")], ["doc_id", "url"])
    assert url_filter(df).count() == 1
