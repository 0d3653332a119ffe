"""Property-based tests (hypothesis) for the WordPiece tokenizer —
the invariants the realignment path depends on must hold for ARBITRARY
words, not just the fixture vocabulary. Pure Python, no Spark session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from coap_rfc_knowledge_graph_spark.functions.wordpiece import (
    CLS,
    PAD,
    SEP,
    UNK,
    WordPieceTokenizer,
)

VOCAB = [PAD, UNK, CLS, SEP] + [
    "a", "b", "c", "ab", "bc", "abc", "##a", "##b", "##c", "##ab", "##bc",
    "server", "co", "##ap", "##s",
]
TOK = WordPieceTokenizer(VOCAB)

words = st.text(alphabet="abc", min_size=1, max_size=12)
any_words = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)


@given(words)
@settings(max_examples=300, deadline=None)
def test_pieces_reassemble_to_the_word(w):
    """For words over the in-vocab alphabet, stripping ## and
    concatenating the pieces must reproduce the (lowercased) word —
    WordPiece is a segmentation, never a rewrite."""
    pieces = TOK.tokenize_word(w)
    assert pieces != [UNK]  # 'a','b','c' are all in vocab -> always segmentable
    joined = "".join(p[2:] if p.startswith("##") else p for p in pieces)
    assert joined == w.lower()
    # only the first piece may be continuation-free
    assert not pieces[0].startswith("##")
    assert all(p.startswith("##") for p in pieces[1:])


@given(any_words)
@settings(max_examples=300, deadline=None)
def test_unknown_words_collapse_to_unk(w):
    """Any word is either fully segmented or exactly [UNK] — never a
    partial segmentation (the HF WordPiece contract)."""
    pieces = TOK.tokenize_word(w)
    if pieces == [UNK]:
        return
    joined = "".join(p[2:] if p.startswith("##") else p for p in pieces)
    assert joined == w.lower()


@given(st.lists(words, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_word_ids_are_complete_and_monotone(ws):
    """word_ids must be None exactly at [CLS]/[SEP], cover every word
    index 0..n-1 contiguously, and be non-decreasing — the realignment
    relies on first-occurrence-per-word scanning."""
    ids, wids = TOK.encode_words(ws)
    assert wids[0] is None and wids[-1] is None
    inner = [w for w in wids[1:-1]]
    assert all(w is not None for w in inner)
    assert inner == sorted(inner)
    assert sorted(set(inner)) == list(range(len(ws)))
    assert len(ids) == len(wids)


@given(st.lists(st.lists(words, min_size=1, max_size=6), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_batch_padding_preserves_rows(batches):
    mat, wids = TOK.encode_batch(batches)
    assert mat.shape[0] == len(batches)
    pad_id = TOK.ids[PAD]
    for r, ws in enumerate(batches):
        row_ids, row_wids = TOK.encode_words(ws)
        assert list(mat[r, : len(row_ids)]) == row_ids
        assert all(x == pad_id for x in mat[r, len(row_ids):])
        assert wids[r][: len(row_wids)] == row_wids
        assert all(w is None for w in wids[r][len(row_wids):])
