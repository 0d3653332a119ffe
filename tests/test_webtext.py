"""URL curation operators (operators/webtext.py): parse/normalize
semantics on handcrafted edge cases, snapshot collapse, domain stats
and filtering, plus the plan shapes the docstrings claim (zero-shuffle
projection; broadcast anti-join for the head cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.webtext import (
    domain_filter,
    host_stats,
    latest_snapshot,
    norm_url_expr,
    normalize_urls,
    url_parts,
)


def _norm(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(norm_url_expr(F.col("url")).alias("n")).head()["n"]


def test_url_parts_components(spark):
    df = spark.createDataFrame(
        [("https://User:Pw@WWW.Example.ORG:8443/A/b/?x=1&y=2#Frag",)], "url string"
    )
    r = url_parts(df).head()
    assert r.scheme == "https"
    assert r.host == "www.example.org"  # userinfo stripped, case folded
    assert r.port == "8443"
    assert r.path == "/A/b/"  # path case preserved
    assert r.query == "x=1&y=2"
    assert r.fragment == "Frag"


def test_url_parts_absent_components_are_empty(spark):
    r = url_parts(spark.createDataFrame([("http://example.com",)], "url string")).head()
    assert (r.port, r.path, r.query, r.fragment) == ("", "", "", "")
    assert r.host == "example.com"


def test_normalize_default_ports_and_fragment(spark):
    assert _norm(spark, "HTTPS://Example.COM:443/a#frag") == "https://example.com/a"
    assert _norm(spark, "http://example.com:80/") == "http://example.com/"
    # non-default port survives
    assert _norm(spark, "https://example.com:8443/a") == "https://example.com:8443/a"


def test_normalize_tracking_params(spark):
    # first / middle / last position, non-tracking params keep order
    assert (
        _norm(spark, "https://e.com/p?utm_source=x&a=1&fbclid=z&b=2&gclid=q")
        == "https://e.com/p?a=1&b=2"
    )
    # all-tracking query -> no '?'
    assert _norm(spark, "https://e.com/p?utm_campaign=x") == "https://e.com/p"
    # utm-like VALUES are not keys and survive
    assert _norm(spark, "https://e.com/p?q=utm_source=x") == "https://e.com/p?q=utm_source=x"
    # a '?' inside the fragment is NOT a query (SPA hash routes): the
    # whole fragment drops, nothing leaks into the canonical URL
    assert _norm(spark, "https://e.com/p#?q=1") == "https://e.com/p"
    assert _norm(spark, "https://e.com/p#/route?x=1") == "https://e.com/p"
    assert _norm(spark, "https://e.com/p?a=1#?b=2") == "https://e.com/p?a=1"


def test_normalize_paths(spark):
    assert _norm(spark, "https://e.com") == "https://e.com/"
    assert _norm(spark, "https://e.com/a/b///") == "https://e.com/a/b"
    assert _norm(spark, "https://e.com/") == "https://e.com/"


def test_registered_domain(spark):
    from coap_rfc_knowledge_graph_spark.operators.webtext import registered_domain_expr

    cases = {
        "www.news.bbc.co.uk": "bbc.co.uk",
        "a.b.site.com.au": "site.com.au",
        "deep.sub.example.org": "example.org",
        "example.org": "example.org",
        "localhost": "localhost",
        "co.uk": "co.uk",  # the bare suffix is returned as-is (n<=2 short-circuits)
        "x.co.uk": "x.co.uk",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r.host: r.rd
        for r in df.select("host", registered_domain_expr(F.col("host")).alias("rd")).collect()
    }
    assert got == cases


def test_latest_snapshot_keeps_max_and_counts(spark):
    rows = [
        ("u1", 3, "u1-a", "t3"),
        ("u1", 7, "u1-b", "t7"),
        ("u1", 5, "u1-c", "t5"),
        ("u2", 1, "u2-a", "t1"),
    ]
    df = spark.createDataFrame(rows, "norm_url string, crawl long, url string, text string")
    out = {
        r.norm_url: r
        for r in latest_snapshot(
            df, "norm_url", order_cols=("crawl",), payload_cols=("url", "text")
        ).collect()
    }
    assert out["u1"].crawl == 7 and out["u1"].url == "u1-b" and out["u1"].text == "t7"
    assert out["u1"].n_crawls == 3
    assert out["u2"].crawl == 1 and out["u2"].n_crawls == 1


def test_host_stats(spark):
    rows = [("a.com", "u1", "xy"), ("a.com", "u1", "zzz"), ("b.com", "u2", "q")]
    df = spark.createDataFrame(rows, "host string, norm_url string, text string")
    out = {r.host: r for r in host_stats(df, url_key_col="norm_url").collect()}
    assert out["a.com"].n_docs == 2 and out["a.com"].total_chars == 5
    assert out["a.com"].n_pages == 1
    assert out["b.com"].n_docs == 1 and out["b.com"].n_pages == 1


def test_domain_filter_blocklist_and_head_cap(spark):
    # 10 docs: 6 on head.com, 2 on a.com, 1 each on b.com / blocked.com
    rows = (
        [("head.com", i) for i in range(6)]
        + [("a.com", 10), ("a.com", 11), ("b.com", 20), ("blocked.com", 30)]
    )
    df = spark.createDataFrame(rows, "host string, doc_id long")
    kept = domain_filter(df, blocklist=("blocked.com",), head_cap_frac=0.5)
    hosts = {r.host for r in kept.collect()}
    # post-blocklist corpus is 9 docs; head.com holds 6/9 > 0.5 -> dropped
    assert hosts == {"a.com", "b.com"}
    # exactly-at-cap is NOT dropped (strict >): a.com at 2/3 of remaining
    kept2 = domain_filter(df, blocklist=("blocked.com", "head.com"), head_cap_frac=2 / 3)
    assert {r.host for r in kept2.collect()} == {"a.com", "b.com"}


def _plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_normalize_is_zero_shuffle_and_filter_has_broadcast(spark):
    df = spark.createDataFrame([("https://e.com/a?utm_source=1",)], "url string")
    p = _plan_str(normalize_urls(url_parts(df)))
    assert "Exchange" not in p, p

    data = spark.createDataFrame([("h%d.com" % (i % 3), i) for i in range(30)], "host string, doc_id long")
    p2 = _plan_str(domain_filter(data, head_cap_frac=0.4))
    assert "BroadcastExchange" in p2, p2


def test_curate_urls_end_to_end(spark):
    """Pages-shaped input: re-crawls collapse to the latest snapshot
    under the canonical url, blocklist and head cap apply, and the
    output keeps the five-column pages schema."""
    import datetime

    from coap_rfc_knowledge_graph_spark.operators.webtext import curate_urls

    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    rows = [
        # one page, three crawls with cosmetic URL variation
        ("https://E.com:443/a/?utm_source=x", ts(1), None, "old", "en"),
        ("https://e.com/a", ts(3), None, "new", "en"),
        ("https://e.com/a#frag", ts(2), None, "mid", "en"),
        ("https://other.com/b", ts(1), None, "b", "en"),
        ("https://blocked.com/c", ts(1), None, "c", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = curate_urls(pages, blocklist=("blocked.com",))
    assert out.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {r.url: r for r in out.collect()}
    assert set(got) == {"https://e.com/a", "https://other.com/b"}
    assert got["https://e.com/a"].text == "new"  # latest crawl wins
    assert got["https://e.com/a"].warc_ts == ts(3)

    # head cap: e.com holds 3/4 of post-blocklist crawl rows -> capped at 0.5
    capped = curate_urls(pages, blocklist=("blocked.com",), head_cap_frac=0.5)
    assert {r.url for r in capped.collect()} == {"https://other.com/b"}


def test_curate_urls_cap_by_registered_domain(spark):
    """Subdomain dodge: 3 subdomains of big.com each hold 25% of the
    corpus — under a 0.5 host-level cap all survive; capping by
    registrable domain drops the whole site."""
    from coap_rfc_knowledge_graph_spark.operators.webtext import curate_urls

    rows = [
        (f"https://{sub}.big.com/p{i}", None, None, "t", "en")
        for sub in ("www", "cdn", "m")
        for i in range(2)
    ] + [("https://small.org/a", None, None, "t", "en"), ("https://tiny.net/b", None, None, "t", "en")]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    host_capped = curate_urls(pages, head_cap_frac=0.5)
    assert host_capped.count() == 8  # each subdomain only 2/8 = 0.25 -> survives
    rd_capped = curate_urls(pages, head_cap_frac=0.5, cap_by_registered_domain=True)
    assert {r.url for r in rd_capped.collect()} == {"https://small.org/a", "https://tiny.net/b"}


def test_curate_urls_drops_malformed(spark):
    """Null / relative / scheme-less URLs are dropped, not merged into
    one degenerate page (all of them normalize to the same key)."""
    from coap_rfc_knowledge_graph_spark.operators.webtext import curate_urls

    rows = [
        (None, None, None, "a", "en"),
        ("", None, None, "b", "en"),
        ("no-scheme.com/x", None, None, "c", "en"),
        ("https://ok.com/x", None, None, "d", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = curate_urls(pages).collect()
    assert [r.url for r in out] == ["https://ok.com/x"]
    # opt-out keeps the degenerate buckets: ok.com + ':///' (the '' and
    # scheme-less rows merged) + the null-url group
    assert curate_urls(pages, drop_invalid=False).count() == 3


def test_weburl_contract_round_trip(spark):
    """The synthesized contract corpus behaves as documented: re-crawls
    unify (100 pages get 2 crawls at 500 docs), the head domain holds
    half the corpus, and the filter output is the 9 surviving hosts."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    snap = entry.q_weburl_latest_snapshot(spark, sf)
    agg = snap.groupBy("n_crawls").count().collect()
    by = {r.n_crawls: r["count"] for r in agg}
    assert by == {1: 300, 2: 100}
    stats = {r.host: r.n_docs for r in entry.q_weburl_host_stats(spark, sf).collect()}
    assert stats["hub.example.org"] == 250
    kept = entry.q_weburl_domain_filter(spark, sf)
    hosts = {r.host for r in kept.collect()}
    assert len(hosts) == 9 and "hub.example.org" not in hosts and "src0.example.org" not in hosts


def test_normalization_spark_duckdb_differential_fuzz(spark):
    """Cross-engine differential test over adversarial URL-ish strings:
    the Spark normalizer and the DuckDB oracle CTE must agree byte-for-
    byte on EVERY input — the weburl_* oracle contract rests on the two
    regex dialects (Java vs RE2) behaving identically on these patterns.
    Seeded generator, 240 cases: userinfo, odd ports, repeated ?/#/@,
    percent-escapes, empty components, tracking params in every slot."""
    import random

    import duckdb

    rng = random.Random(4242)
    schemes = ["https", "HTTP", "ftp", "a+b-c."]
    hosts = ["Example.COM", "a.b.c.d", "LOCALHOST", "x_y.org", "127.0.0.1", ""]
    users = ["", "user@", "User:Pw@", "@", "a@b@"]
    ports = ["", ":443", ":80", ":8080", ":0", ":"]
    paths = ["", "/", "/a/b", "/A//b///", "/p%20q", "/~u", "/a?b", "/#"]
    queries = [
        "", "?", "?a=1", "?utm_source=x", "?a=1&utm_medium=m&b=2",
        "?gclid=&fbclid=1", "?utm_x=1", "?&&", "?a=utm_source=x", "?=v", "?a==b",
    ]
    frags = ["", "#", "#f", "#a#b", "#?q=1"]
    cases = []
    for _ in range(240):
        u = (
            rng.choice(schemes) + "://" + rng.choice(users) + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        )
        cases.append(u)
    # plus some deliberately broken ones
    cases += ["", "http:/x", "://host/p", "https://", "https://#f", "https://?q"]

    from coap_rfc_knowledge_graph_spark.operators.webtext import norm_url_expr

    sdf = spark.createDataFrame([(c,) for c in cases], "url string")
    spark_out = [
        r.n for r in sdf.select(norm_url_expr(F.col("url")).alias("n")).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    duck_out = [
        r[0]
        for r in con.execute(
            r"""
        WITH parts AS (
          SELECT i, url,
                 lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                 regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS auth,
                 regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
                 regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS rawquery
          FROM t
        )
        SELECT scheme || '://' || lower(regexp_extract(auth, '^(?:[^@]*@)?([^:]+)', 1)) ||
               CASE WHEN regexp_extract(auth, ':([0-9]+)$', 1) = ''
                         OR (scheme = 'https' AND regexp_extract(auth, ':([0-9]+)$', 1) = '443')
                         OR (scheme = 'http' AND regexp_extract(auth, ':([0-9]+)$', 1) = '80')
                    THEN '' ELSE ':' || regexp_extract(auth, ':([0-9]+)$', 1) END ||
               CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
                    ELSE regexp_replace(rawpath, '/+$', '') END ||
               CASE WHEN coalesce(array_to_string(list_filter(string_split(rawquery, '&'),
                          x -> NOT regexp_matches(x, '^(utm_[a-z]+|gclid|fbclid)=')), '&'), '') = ''
                    THEN ''
                    ELSE '?' || coalesce(array_to_string(list_filter(string_split(rawquery, '&'),
                          x -> NOT regexp_matches(x, '^(utm_[a-z]+|gclid|fbclid)=')), '&'), '') END
        FROM parts ORDER BY i
        """
        ).fetchall()
    ]
    mismatches = [
        (c, s, d) for c, s, d in zip(cases, spark_out, duck_out) if s != d
    ]
    assert not mismatches, mismatches[:5]


def test_crawl_delta_statuses(spark):
    """All four statuses; full-outer key coalescing; partitioning
    invariance."""
    from coap_rfc_knowledge_graph_spark.operators.webtext import crawl_delta

    old = spark.createDataFrame(
        [("u1", "fa"), ("u2", "fb"), ("u3", "fc")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u1", "fa"), ("u2", "fb2"), ("u4", "fd")], "url string, fingerprint string"
    )
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "removed", "u4": "added"}
    again = {
        r.url: r.status
        for r in crawl_delta(old.repartition(5), new.repartition(3)).collect()
    }
    assert again == got


def test_lang_ngram_six_languages_and_und(spark):
    """Char-trigram language ID: one natural sentence per profile
    language classifies correctly; junk and NULL fall to 'und'; the
    projection is zero-shuffle."""
    from pyspark.sql import functions as F

    from coap_rfc_knowledge_graph_spark.operators.text_stats import lang_ngram

    rows = [
        ("en", "The meaning of the information and the running of things."),
        ("de", "Der Unterschied zwischen der Einrichtung und dem Licht ist nicht wichtig."),
        ("fr", "Les questions et les chaleurs que des entiers auront toujours."),
        ("es", "La nación quiere que los colores hayan adelantado por completo."),
        ("it", "Ogni persona che ha la dimensione della creazione per il colore."),
        ("pt", "A criação de que os contos da paragem para a nação."),
        ("und", "xqz kjv wfp zzz 123"),
        ("und", None),
    ]
    df = spark.createDataFrame(rows, "expected string, text string")
    out = lang_ngram(df)
    assert all(r.lang_ngram == r.expected for r in out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # prefix bound: trigram evidence past prefix_chars is invisible
    long = spark.createDataFrame(
        [("x" * 2000 + " the and of the ing",)], "text string"
    )
    assert lang_ngram(long, prefix_chars=1000).collect()[0].lang_ngram == "und"


def test_lang_ngram_tie_breaks_lexicographic(spark):
    from coap_rfc_knowledge_graph_spark.operators.text_stats import lang_ngram

    # 'que'/' qu'/'ent' hit fr and pt equally (3 each, above es's 2):
    # the lexicographically smaller code wins deterministically
    df = spark.createDataFrame([("que ent",)], "text string")
    r = lang_ngram(df, min_hits=2).collect()[0]
    assert r.hits_fr == r.hits_pt == 3 and r.hits_es == 2
    assert r.lang_ngram == "fr"


def test_compression_ratio_parity_and_signal(spark):
    """zlib permille matches direct zlib; repetitive text scores far
    below prose; NULL/empty stay NULL; zero shuffle."""
    import zlib

    from coap_rfc_knowledge_graph_spark.operators.text_stats import compression_ratio

    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "wizards brew quince jelly behind the opaque glass furnace."
    )
    spam = "buy now " * 200
    rows = [(0, prose), (1, spam), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = compression_ratio(df)
    got = {r.doc_id: r.zlib_permille for r in out.collect()}
    for i, t in rows:
        expect = (
            None if not t else len(zlib.compress(t.encode(), 6)) * 1000 // len(t.encode())
        )
        assert got[i] == expect, i
    assert got[1] < 100 < got[0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
