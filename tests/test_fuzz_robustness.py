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
