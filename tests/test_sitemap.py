"""Sitemap ingestion: sitemaps.org urlset + sitemapindex parsing,
gzip sniffing, malformed-XML fallback, exact integer priorities."""

import gzip

from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.sitemap import (
    _priority_millis,
    parse_sitemap_text,
    parse_sitemaps,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url>
    <loc>https://a.example/p1</loc>
    <lastmod>2026-08-01T10:00:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/p2?x=1&amp;y=2</loc></url>
  <url><lastmod>2026-08-02</lastmod></url>
</urlset>"""

INDEX = f"""<?xml version="1.0"?>
<sitemapindex {NS}>
  <sitemap>
    <loc>https://a.example/sitemap-1.xml.gz</loc>
    <lastmod>2026-07-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.9</priority>
  </sitemap>
</sitemapindex>"""


def test_urlset_fields_and_entity_unescape():
    got = parse_sitemap_text(URLSET)
    # the loc-less third entry contributes nothing
    assert got == [
        ("url", "https://a.example/p1", "2026-08-01T10:00:00Z", "daily", 800),
        ("url", "https://a.example/p2?x=1&y=2", None, None, None),
    ]


def test_index_pointers_drop_noise_fields():
    # changefreq/priority are not index-pointer fields: stripped even
    # when a site emits them
    assert parse_sitemap_text(INDEX) == [
        ("sitemap", "https://a.example/sitemap-1.xml.gz", "2026-07-01", None, None)
    ]


def test_gzip_sniff_and_invalid_utf8():
    raw = URLSET.encode() + b"\xff\xfe"  # trailing junk bytes
    assert parse_sitemap_text(gzip.compress(raw)) == parse_sitemap_text(URLSET)
    assert parse_sitemap_text(b"\x1f\x8b not actually gzip") == []


def test_malformed_xml_falls_back_to_regex_scan():
    # unclosed urlset + undeclared namespace prefix: ET.fromstring
    # raises, the regex pass still recovers both entries
    broken = """<urlset>
      <url><loc>https://b.example/x</loc><priority>1</priority></url>
      <url><ns:loc>https://b.example/y</ns:loc></url>
    """
    assert parse_sitemap_text(broken) == [
        ("url", "https://b.example/x", None, None, 1000),
        ("url", "https://b.example/y", None, None, None),
    ]


def test_priority_is_exact_decimal_scaling():
    assert _priority_millis("0.8") == 800
    assert _priority_millis("0.3") == 300  # float would give 300.00000000000003
    assert _priority_millis("1") == 1000
    assert _priority_millis("0.1234") == 123
    assert _priority_millis("7") == 1000  # clamped
    assert _priority_millis("high") is None
    assert parse_sitemap_text(
        f"<urlset {NS}><url><loc>u</loc><priority>0.55</priority></url></urlset>"
    ) == [("url", "u", None, None, 550)]


def test_bogus_changefreq_dropped():
    xml = (
        f"<urlset {NS}><url><loc>u</loc>"
        "<changefreq>fortnightly</changefreq></url></urlset>"
    )
    assert parse_sitemap_text(xml) == [("url", "u", None, None, None)]


def test_spark_parse_sitemaps_mixed_payloads(spark):
    rows = [
        ("a.example", URLSET.encode()),
        ("b.example", gzip.compress(INDEX.encode())),
        ("c.example", None),
        ("d.example", b"<html>not a sitemap</html>"),
    ]
    df = spark.createDataFrame(rows, "host string, payload binary")
    got = parse_sitemaps(df).orderBy("host", "loc").collect()
    assert [(r.host, r.kind, r.loc, r.priority_millis) for r in got] == [
        ("a.example", "url", "https://a.example/p1", 800),
        ("a.example", "url", "https://a.example/p2?x=1&y=2", None),
        ("b.example", "sitemap", "https://a.example/sitemap-1.xml.gz", None),
    ]
    # zero shuffle: the parse is one mapInPandas over the scan
    plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_spark_partitioning_invariance(spark):
    rows = [(f"h{i}.example", URLSET.encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "host string, payload binary")
    a = sorted(map(tuple, parse_sitemaps(df.repartition(1)).collect()))
    b = sorted(map(tuple, parse_sitemaps(df.repartition(13)).collect()))
    assert a == b and len(a) == 40
