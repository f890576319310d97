"""URL canonicalization and URL-keyed deduplication — the first dedup
pass every web-crawl pipeline runs, before any content hashing: the same
page is crawled under scheme/host case variants, default ports, tracking
query parameters, shuffled parameter order, fragments, and trailing
slashes.

Reference parity note: the reference (single-node pandas + rdflib) never
sees raw URLs; this is one of the large-scale-pipeline extensions
mandated by the build brief.

Everything here is pure JVM Column expressions (regexp + array ops) —
narrow, whole-stage-codegen-eligible except the one higher-order
parameter filter, no Python, no shuffle until the final keyed groupBy.
The regex vocabulary is kept to the common subset of Java regex (Spark)
and RE2 (the DuckDB oracle): no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that identify a click, not a resource. Anchored
# key-match against each `key=value` token.
TRACKING_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref)="
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(col: Column) -> Column:
    """Canonical form of an absolute URL:

    - scheme and host:port lowercased (ports are digits — unaffected);
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - trailing path slashes stripped, empty path normalized to ``/``;
    - tracking query parameters (TRACKING_PARAM_RE) dropped;
    - surviving parameters sorted bytewise and rejoined with ``&``;
    - the fragment dropped.

    A value with no ``scheme://`` prefix is passed through trimmed and
    unchanged (relative URLs have no canonical absolute form without a
    base). Userinfo (``user@host``) and bracketed IPv6 hosts are kept
    verbatim apart from lowercasing; a literal ``:80``/``:443`` suffix
    on an IPv6 authority is treated as a port like any other.
    """
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path_stripped = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    params = F.filter(
        F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    return F.when(scheme == "", u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
        )
    )


def host_of(col: Column) -> Column:
    """Lowercased host of an absolute URL, userinfo and port stripped
    ('' for a relative URL — no authority to extract). A bracketed IPv6
    authority keeps its brackets; only a trailing ``:digits`` port is
    removed, so the address's own colons are safe."""
    hostport = F.lower(F.regexp_extract(F.trim(col), _HOSTPORT_RE, 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^[^@]*@", ""), r":[0-9]+$", ""
    )


def host_stats(
    df,
    url_col: str = "url",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-host crawl summary — the table a crawl scheduler / per-source
    cap reads: (host, n_docs, n_paths, total_chars, mean_chars), where
    ``n_paths`` counts distinct raw paths (how much of the site the crawl
    actually covers vs re-fetching one page). Relative URLs group under
    host '' rather than vanishing, so the total doc count is conserved.

    Scale shape: the corpus is projected to (host, path, size) before
    anything moves; the distinct-path count is Spark's two-phase
    count_distinct (partial de-dup on (host, path) map-side, then the
    merge keyed on host) — the host key is exactly the skewed key of a
    web crawl, which is AQE skew-agg territory, and nothing wider than a
    path string ever shuffles.
    """
    u = F.trim(F.col(url_col))
    slim = df.select(
        host_of(F.col(url_col)).alias("host"),
        F.regexp_extract(u, _PATH_RE, 1).alias("_path"),
        F.col(size_col).cast("long").alias("_size"),
    )
    return slim.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(F.col("_path")).cast("long").alias("n_paths"),
        F.sum("_size").alias("total_chars"),
        F.round(F.avg("_size"), 4).alias("mean_chars"),
    )


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: a.b.c -> [a.b.c, b.c, c] — the domain
    match set a blocklist entry tests against (blocking example.com must
    block every subdomain)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def url_filter(
    df: DataFrame,
    blocked_hosts: tuple[str, ...] = (),
    blocked_url_res: tuple[str, ...] = (),
    url_col: str = "url",
    id_col: str = "doc_id",
    broadcast_limit: int = 10_000,
) -> DataFrame:
    """Crawl-hygiene blocklist filter: drop documents whose URL host (or
    any parent domain of it) is in ``blocked_hosts``, or whose raw URL
    matches any of the ``blocked_url_res`` regexes — the
    robots/spam/adult-list pass every crawl pipeline runs before curation
    touches content. Host matching is by dot-suffix (blocking
    ``example.com`` blocks ``a.example.com`` but NOT ``notexample.com``),
    case-insensitive via the canonical lowercased host; relative URLs
    (no authority) are kept — they have no host to judge.

    Scale shape: below ``broadcast_limit`` entries the blocklist is
    inlined as a literal array and the whole filter is one narrow
    whole-stage-codegen pass — ZERO shuffle (the common case: public
    blocklists are 10^3-10^4 domains). Above it, blocked ids are found by
    exploding each doc's <=#labels host suffixes into an ids-only sliver
    joined against the list (broadcast if it fits, hash join otherwise)
    and the corpus takes one left-anti by id — text never rides the
    suffix exchange. The regex pass is always narrow: patterns are
    OR-combined into one ``rlike``.
    """
    out = df
    if blocked_hosts:
        host = host_of(F.col(url_col))
        sufs = _host_suffixes(host)
        if len(blocked_hosts) <= broadcast_limit:
            blocked = F.array(*[F.lit(h.lower()) for h in blocked_hosts])
            hit = F.exists(sufs, lambda s: F.array_contains(blocked, s))
            out = out.filter((host == "") | ~hit)
        else:
            spark = df.sparkSession
            bl = spark.createDataFrame(
                [(h.lower(),) for h in blocked_hosts], ["_blocked_host"]
            )
            sliver = out.select(F.col(id_col), F.explode(sufs).alias("_suf"))
            bad = (
                sliver.join(bl, sliver["_suf"] == bl["_blocked_host"], "left_semi")
                .select(id_col)
                .distinct()
            )
            out = out.join(bad, on=id_col, how="left_anti")
    if blocked_url_res:
        combined = "|".join(f"(?:{r})" for r in blocked_url_res)
        out = out.filter(~F.col(url_col).rlike(combined))
    return out


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    canonicalize: bool = True,
) -> DataFrame:
    """Collapse documents that share a canonical URL, keeping the one
    with the largest ``order_col`` (ties broken by the smallest id — a
    total, replayable order). Returns one row per canonical URL:
    (url_canon, keep_id, n_dups). Anti-join ``n_dups > 1`` groups' losers
    back onto the corpus to drop them, or semi-join ``keep_id``.

    Scale shape: the corpus is projected to (canonical-url, id, order)
    before anything moves — document text never rides the exchange — and
    the winner is picked by ``max_by`` inside a single map-side-partial
    groupBy: one shuffle of url-sized keys, no window over a hot
    partition, no join back unless the caller wants one.
    """
    canon = canonicalize_url(F.col(url_col)) if canonicalize else F.col(url_col)
    slim = df.select(
        canon.alias("url_canon"),
        F.col(id_col),
        F.coalesce(F.col(order_col), F.lit(-1)).cast("long").alias("_ord"),
    )
    return slim.groupBy("url_canon").agg(
        F.max_by(
            F.col(id_col), F.struct(F.col("_ord"), (-F.col(id_col)).alias("neg"))
        ).alias("keep_id"),
        F.count("*").cast("long").alias("n_dups"),
    )
