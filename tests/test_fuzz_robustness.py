"""Hypothesis fuzz: the document-at-a-time functions must be total —
deterministic, character-preserving, and crash-free on arbitrary input
(a 10^12-page crawl WILL contain every byte sequence)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from coap_rfc_knowledge_graph_spark.functions.pdf_text import PDFDocument
from coap_rfc_knowledge_graph_spark.functions.text_extract import (
    extract_web_sentences,
    sent_tokenize,
    strip_html,
)


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_sent_tokenize_preserves_non_space_chars(text):
    """Splitting only cuts at whitespace runs: the concatenation of all
    sentences equals the input minus inter-sentence whitespace — no
    characters invented, dropped, or reordered."""
    sentences = sent_tokenize(text)
    joined = "".join("".join(s.split()) for s in sentences)
    assert joined == "".join(text.split())
    assert sentences == sent_tokenize(text)  # deterministic


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_web_sentence_path_total(text):
    out = extract_web_sentences(text)
    for s in out:
        assert s == s.strip() and s != ""
        assert any(c.isalpha() for c in s)


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_strip_html_total(data):
    assert isinstance(strip_html(data), str)


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_pdf_parser_never_crashes_unexpectedly(data):
    """Arbitrary bytes (with or without a %PDF magic prefix) must yield
    either a parsed page list or ValueError — never a hang or an
    unhandled internal exception."""
    for payload in (data, b"%PDF-1.4\n" + data):
        try:
            doc = PDFDocument(payload)
            doc.pages()
        except ValueError:
            pass


@given(st.binary(max_size=600))
@settings(max_examples=200, deadline=None)
def test_sitemap_parser_total(data):
    """parse_sitemap_text never raises on arbitrary bytes (crawled
    sitemaps are routinely malformed, truncated, or not XML at all);
    every emitted row has a non-empty loc and a valid kind."""
    from coap_rfc_knowledge_graph_spark.operators.sitemap import parse_sitemap_text

    for kind, loc, lastmod, changefreq, prio in parse_sitemap_text(data):
        assert kind in ("url", "sitemap") and loc
        assert prio is None or 0 <= prio <= 1000


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_robots_directive_parsers_total(text):
    """All three robots directive parsers are total over arbitrary text
    and agree on group semantics (shared iterator)."""
    from coap_rfc_knowledge_graph_spark.operators.robots import (
        parse_crawl_delay_text,
        parse_robots_text,
    )

    for allow, prefix in parse_robots_text(text):
        assert isinstance(allow, bool) and prefix
    d = parse_crawl_delay_text(text)
    assert d is None or d >= 0


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_media_hash_scaffold_skips_garbage(data):
    """image/audio hash extraction treats undecodable bytes as absent
    rows, never a raised task — the pure decode path must swallow any
    payload shape."""
    from coap_rfc_knowledge_graph_spark.operators.multimodal import (
        decode_backend,
        sniff_mime,
    )

    mime = sniff_mime(data)
    if mime.startswith(("image/", "audio/")):
        try:
            decode_backend(data, mime)
        except Exception:
            pass  # any exception class is fine — the scaffold catches all
