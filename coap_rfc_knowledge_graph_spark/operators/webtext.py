"""Web-corpus URL curation — the first pass a Common-Crawl-style
pipeline runs before any text op (RefinedWeb §3.1 "URL filtering",
CCNet's per-snapshot dedup): parse and canonicalize URLs, collapse
re-crawls of the same page to the latest snapshot, aggregate per-domain
statistics, and drop blocklisted / over-represented domains.

All pure Catalyst — every per-row step is a regexp/array projection
(zero shuffles, codegen, pushdown-friendly); the two aggregating ops
are each a single hash aggregate with map-side partial combine, and the
head-cap filter joins the fact table only against a broadcast list of
over-cap hosts (by construction at most ``1/head_cap_frac`` rows), so
nothing here re-shuffles the 100 TB side more than once.

Not present in the reference repo (its corpus is four fixed RFC text
files, no URLs beyond identifiers); this family belongs to the
"training-data pipeline at web scale" surface, same tier as
``operators/dedup.py`` / ``operators/text_stats.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC 3986-shaped component patterns, deliberately kept to constructs
# whose semantics are identical in Java regex (Spark) and RE2 (DuckDB)
# so the DuckDB oracle can mirror them verbatim.
_SCHEME_PAT = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_PAT = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_PAT = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
# the query is the first '?'..'#' span BEFORE any '#': an unanchored
# \?([^#]*) would match a '?' inside the fragment (SPA hash routes like
# /p#/route?x=1) and leak fragment content into the canonical URL
_QUERY_PAT = r"^[^#]*?\?([^#]*)"
_FRAGMENT_PAT = "#(.*)$"
_HOST_PAT = "^(?:[^@]*@)?([^:]+)"
_PORT_PAT = ":([0-9]+)$"

# tracking parameters stripped by normalization (utm_* family + the two
# big click ids) — key=value prefix match on each &-separated pair
TRACKING_PARAM_PAT = "^(utm_[a-z]+|gclid|fbclid)="


# Two-level public suffixes for registered-domain extraction — a small
# built-in subset of the Mozilla Public Suffix List covering the common
# ccTLD second-level registries; swap in the full list (a ~10k-entry
# isin / broadcast map) for production. Kept sorted for determinism.
TWO_LEVEL_SUFFIXES = (
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.sg", "com.tr",
    "gov.uk", "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)


def registered_domain_expr(host_col: Column) -> Column:
    """Registrable domain of a host (``a.b.example.co.uk`` ->
    ``example.co.uk``; ``sub.example.org`` -> ``example.org``): the last
    two labels, or three when the last two form a known two-level public
    suffix. Domain-level grouping (stats, caps, dedup keys) should key
    on this, not the raw host — one site's subdomains otherwise dodge
    the head cap. Pure codegen (split + element_at + literal IN)."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    # F.get (0-based, null on out-of-bounds) rather than element_at:
    # element_at THROWS on out-of-bounds under ANSI mode (Spark 4
    # default), and branch laziness is not a contract worth betting on
    # once common-subexpression elimination enters the picture
    last2 = F.concat_ws(".", F.get(parts, n - 2), F.get(parts, n - 1))
    last3 = F.concat_ws(".", F.get(parts, n - 3), F.get(parts, n - 2), F.get(parts, n - 1))
    return (
        F.when(n <= 2, host_col)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose ``url_col`` into scheme/host/port/path/query/fragment
    columns (empty string where the component is absent). One codegen
    projection, no shuffle."""
    u = F.col(url_col)
    auth = F.regexp_extract(u, _AUTH_PAT, 1)
    return df.withColumns(
        {
            "scheme": F.lower(F.regexp_extract(u, _SCHEME_PAT, 1)),
            "host": F.lower(F.regexp_extract(auth, _HOST_PAT, 1)),
            "port": F.regexp_extract(auth, _PORT_PAT, 1),
            "path": F.regexp_extract(u, _PATH_PAT, 1),
            "query": F.regexp_extract(u, _QUERY_PAT, 1),
            "fragment": F.regexp_extract(u, _FRAGMENT_PAT, 1),
        }
    )


def norm_url_expr(url_col: Column) -> Column:
    """Canonical form of a URL, as one Catalyst expression:

    - scheme and host lowercased
    - userinfo and fragment dropped
    - default ports dropped (http:80, https:443)
    - tracking query params dropped (``TRACKING_PARAM_PAT``), remaining
      params kept in original order
    - empty path -> ``/``; trailing slashes stripped otherwise

    Mirrored verbatim by the ``weburl_*`` DuckDB oracles in
    ``__spark_entry__.py`` — change both together.
    """
    scheme = F.lower(F.regexp_extract(url_col, _SCHEME_PAT, 1))
    auth = F.regexp_extract(url_col, _AUTH_PAT, 1)
    host = F.lower(F.regexp_extract(auth, _HOST_PAT, 1))
    port = F.regexp_extract(auth, _PORT_PAT, 1)
    path = F.regexp_extract(url_col, _PATH_PAT, 1)
    query = F.regexp_extract(url_col, _QUERY_PAT, 1)

    keep_port = ~(
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))

    stripped = F.regexp_replace(path, "/+$", "")
    norm_path = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    clean_query = F.array_join(
        F.filter(F.split(query, "&"), lambda kv: ~kv.rlike(TRACKING_PARAM_PAT)),
        "&",
    )
    query_part = F.when(clean_query == "", F.lit("")).otherwise(F.concat(F.lit("?"), clean_query))

    return F.concat(scheme, F.lit("://"), host, port_part, norm_path, query_part)


def normalize_urls(df: DataFrame, url_col: str = "url", out_col: str = "norm_url") -> DataFrame:
    return df.withColumn(out_col, norm_url_expr(F.col(url_col)))


def latest_snapshot(
    df: DataFrame,
    key_col: str = "norm_url",
    order_cols: tuple[str, ...] = ("warc_ts",),
    payload_cols: tuple[str, ...] = ("url", "text"),
) -> DataFrame:
    """Collapse re-crawls: one row per ``key_col`` — the row that is max
    under ``order_cols`` (make the composite unique, e.g. include a doc
    id, or ties break on the payload struct) — plus ``n_crawls``.

    Single hash aggregate on the key (map-side ``max`` partials, then
    one shuffle of one packed row per key per map task). This is the
    scale-correct shape for snapshot dedup at 10^12 rows: no window, no
    sort, and AQE splits any pathologically hot key's partial stream.
    """
    packed = F.struct(
        *[F.col(c) for c in order_cols],
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
    )
    agg = df.groupBy(key_col).agg(
        F.max(packed).alias("__m"), F.count(F.lit(1)).alias("n_crawls")
    )
    return agg.select(
        key_col,
        *[F.col(f"__m.{c}").alias(c) for c in order_cols],
        *[F.col(f"__m.__p.{c}").alias(c) for c in payload_cols],
        "n_crawls",
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Diff two crawl snapshots by content fingerprint:
    (url, old_fp, new_fp, status) with status in
    added / removed / changed / unchanged — the incremental-refresh
    driver: only 'added'/'changed' pages re-enter the extract pipeline
    and 'removed' retracts triples whose provenance is exclusively that
    url, so a re-crawl costs O(delta), not O(corpus).

    One full-outer equi-join on the url key (each side pre-collapsed by
    :func:`latest_snapshot`, so keys are unique) + a codegen status
    projection — a single shuffle; AQE handles any skewed key. At
    10^12 rows both sides are bucketed by url in storage and the join
    is co-located."""
    o = old.select(F.col(key_col).alias(key_col), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias(key_col), F.col(fp_col).alias("new_fp"))
    return o.join(n, key_col, "full_outer").select(
        key_col,
        "old_fp",
        "new_fp",
        F.when(F.col("old_fp").isNull(), "added")
        .when(F.col("new_fp").isNull(), "removed")
        .when(F.col("old_fp") != F.col("new_fp"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def host_stats(df: DataFrame, host_col: str = "host", url_key_col: str | None = None) -> DataFrame:
    """Per-domain corpus statistics: document count, total/mean text
    chars, distinct page count (when ``url_key_col`` given). One hash
    aggregate; ``count(distinct)`` expands to the standard two-phase
    partial-distinct plan, still a single logical shuffle on the host."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(F.length("text")), 4).alias("mean_chars"),
    ]
    if url_key_col is not None:
        aggs.append(F.countDistinct(F.col(url_key_col)).alias("n_pages"))
    return df.groupBy(host_col).agg(*aggs)


def domain_filter(
    df: DataFrame,
    host_col: str = "host",
    blocklist: tuple[str, ...] = (),
    head_cap_frac: float | None = None,
) -> DataFrame:
    """Drop rows from blocklisted domains, then (optionally) from any
    domain holding more than ``head_cap_frac`` of the remaining corpus
    (RefinedWeb-style head-domain cap — the web's host distribution is
    zipfian, and an uncapped head domain both skews every downstream
    host-keyed shuffle and over-represents boilerplate in training data).

    Cost at scale: the blocklist is a literal IN filter (no join); the
    cap pass is one count aggregate over the corpus plus a broadcast
    anti-join against the over-cap host list, which by construction has
    at most ``floor(1/head_cap_frac)`` entries.
    """
    out = df
    if blocklist:
        out = out.filter(~F.col(host_col).isin(*blocklist))
    if head_cap_frac is not None:
        counts = out.groupBy(host_col).agg(F.count(F.lit(1)).alias("__n"))
        total = counts.agg(F.sum("__n").alias("__total"))
        over = (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("__n") > F.lit(float(head_cap_frac)) * F.col("__total"))
            .select(host_col)
        )
        out = out.join(F.broadcast(over), on=host_col, how="left_anti")
    return out


def curate_urls(
    pages: DataFrame,
    blocklist: tuple[str, ...] = (),
    head_cap_frac: float | None = None,
    drop_invalid: bool = True,
    cap_by_registered_domain: bool = False,
) -> DataFrame:
    """The composed ingest pre-pass for a Common-Crawl-style pages table
    (url, warc_ts, html, text, lang): canonicalize URLs, drop
    blocklisted / over-cap domains (crawl-weighted — computed before the
    snapshot collapse, so a domain's re-crawl volume counts against its
    cap), then collapse re-crawls to the latest snapshot. Returns the
    same five-column schema with ``url`` replaced by its canonical form.

    Cost: one codegen projection + one count aggregate + broadcast
    anti-join + one hash aggregate — two shuffles of the corpus total,
    both keyed on URL-derived values (uniformly distributed at web
    scale; the head-domain cap is what bounds host-keyed skew
    downstream).
    """
    p = normalize_urls(url_parts(pages))
    if drop_invalid:
        # null / relative / scheme-less URLs all normalize to the same
        # degenerate key and would silently MERGE into one "page" (one
        # arbitrary survivor) in the snapshot collapse — drop them
        # instead; curation semantics, and the loss is explicit
        p = p.filter(F.col("host") != "")
    if blocklist:
        p = domain_filter(p, blocklist=tuple(blocklist))
    if head_cap_frac is not None:
        # cap on the registrable domain when asked — a site's subdomains
        # (cdn.x.com, www.x.com, ...) otherwise each get their own cap
        cap_col = "host"
        if cap_by_registered_domain:
            p = p.withColumn("__rd", registered_domain_expr(F.col("host")))
            cap_col = "__rd"
        p = domain_filter(p, host_col=cap_col, head_cap_frac=head_cap_frac)
        if cap_by_registered_domain:
            p = p.drop("__rd")
    snap = latest_snapshot(
        p, "norm_url", order_cols=("warc_ts", "url"), payload_cols=("html", "text", "lang")
    )
    return snap.select(
        F.col("norm_url").alias("url"), "warc_ts", "html", "text", "lang"
    )
