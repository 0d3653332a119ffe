"""Unicode normalization pass: NFC/NFKC semantics, control stripping,
whitespace collapse, null safety, and the cross-engine NFC contract
(Python unicodedata vs DuckDB nfc_normalize) the driver oracle rests on."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coap_rfc_knowledge_graph_spark.operators.normalize import (  # noqa: E402
    collapse_whitespace,
    normalize_corpus,
    normalize_text,
    strip_controls,
)

DECOMPOSED = "café Å ﬃx ①"  # e+acute, A+ring, ffi, circled 1


def test_nfc_composes_nfkc_folds(spark):
    df = spark.createDataFrame([(1, DECOMPOSED), (2, None)], "doc_id long, text string")
    nfc = {r["doc_id"]: r["norm_text"] for r in normalize_text(df, "NFC").collect()}
    assert nfc[1] == "café Å ﬃx ①"  # composed; ligature kept
    assert nfc[2] is None
    nfkc = {r["doc_id"]: r["norm_text"] for r in normalize_text(df, "NFKC").collect()}
    assert nfkc[1] == "café Å ffix 1"  # ligature + circled folded
    import pytest

    with pytest.raises(ValueError):
        normalize_text(df, "NFX")


def test_strip_controls_and_collapse(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\x9fc\tkeep\nline"), (2, "  x   y\t z \n  w  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in strip_controls(df).collect()}
    assert out[1] == "abc\tkeep\nline"  # \t \n survive, C0/C1 gone
    out = {r["doc_id"]: r["text"] for r in collapse_whitespace(df).collect()}
    assert out[2] == "x y z\nw"  # runs collapsed, newline preserved, trimmed


def test_normalize_corpus_composed_and_invariant(spark):
    rows = [(i, f"doc {i} \x07 {DECOMPOSED}   end") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in normalize_corpus(df).collect())
    b = sorted(tuple(r) for r in normalize_corpus(df.repartition(7)).collect())
    assert a == b
    assert a[0][1] == "doc 0 café Å ﬃx ① end"


def test_nfc_matches_duckdb(spark):
    """The unicode_normalize driver oracle contract: unicodedata NFC ==
    DuckDB nfc_normalize byte-for-byte on adversarial composition
    cases."""
    import duckdb

    cases = [
        DECOMPOSED,
        "é́",  # composed e-acute + ANOTHER acute (stays decomposed-tail)
        "ṩ",  # s with dot below and dot above, composed
        "ṩ",  # same, fully decomposed (non-adjacent reorder case)
        "À̖",  # combining class reordering: grave + below
        "À̖",  # same marks, swapped input order -> same NFC
        "가",  # hangul syllable
        "가",  # hangul jamo pair -> composes to ac00
        "plain ascii",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(cases)), "i long, text string")
    got = {r["i"]: r["norm_text"] for r in normalize_text(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    want = dict(con.execute("SELECT i, nfc_normalize(text) FROM t").fetchall())
    assert got == want


def test_nfc_fuzz_unicodedata_vs_duckdb():
    """No-Spark cross-engine fuzz: 2,000 seeded strings over the
    normalization-relevant assigned ranges (combining marks, hangul
    jamo/syllables, CJK compat, ligatures, enclosed) — Python
    unicodedata and DuckDB nfc_normalize must agree byte-for-byte, or
    the unicode_normalize driver oracle would drift with a Unicode
    version bump."""
    import random
    import unicodedata

    import duckdb

    rng = random.Random(99)
    ranges = [
        (0x20, 0x7E), (0xA0, 0x17F), (0x300, 0x36F), (0x370, 0x3FF), (0x400, 0x4FF),
        (0x1E00, 0x1EFF), (0x1100, 0x11FF), (0xAC00, 0xD7A3), (0xF900, 0xFA6D),
        (0xFB00, 0xFB06), (0x2460, 0x24FF), (0x3040, 0x30FF),
    ]
    # ASSIGNED code points only: the normalization stability guarantee
    # covers assigned characters — an unassigned gap (U+0378, U+3040,
    # ...) assigned later with a decomposition would make two engines
    # straddling that Unicode version disagree, a spurious failure
    pool = [
        chr(c)
        for lo, hi in ranges
        for c in range(lo, hi + 1)
        if unicodedata.name(chr(c), None) is not None
    ]

    def rand_str():
        return "".join(rng.choice(pool) for _ in range(rng.randint(1, 24)))

    cases = [rand_str() for _ in range(2000)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    want = dict(con.execute("SELECT i, nfc_normalize(s) FROM t").fetchall())
    for i, s in enumerate(cases):
        assert unicodedata.normalize("NFC", s) == want[i], repr(s)
