"""M11 data-prep operators (NSP pair generation + MLM masking) —
reference semantics ``src/pretrain_iot_BERT.py:23-43`` (50/50 next-vs-
random partner; 15% masking, specials exempt). The train loop is out of
scope; the Spark engine owns the example-generation pipeline.

Both operators are also DuckDB-hash-verified via the driver contract
(``__spark_entry__.oracle_sql()['nsp_pairs'|'mlm_examples']``); these
tests pin the SEMANTIC properties the hash can't explain.
"""

from __future__ import annotations

import pytest

from coap_rfc_knowledge_graph_spark.operators.pretrain import (
    mlm_examples,
    nsp_pairs,
    split_sentences_native,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(40 + (i % 3) * 16)))
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_sentences_16_word_windows(spark, docs):
    sents = split_sentences_native(docs).collect()
    by_doc = {}
    for r in sents:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.sent_id)
        n_words = 40 + (doc_id % 3) * 16
        assert len(rs) == -(-n_words // 16)  # ceil
        joined = " ".join(r.sentence for r in rs)
        assert joined == " ".join(f"w{doc_id}x{j}" for j in range(n_words))
        assert all(len(r.sentence.split(" ")) == 16 for r in rs[:-1])


def test_nsp_is_next_partner_is_per_doc_next(spark, docs):
    sents = {(r.doc_id, r.sent_id): r.sentence for r in split_sentences_native(docs).collect()}
    pairs = nsp_pairs(docs).collect()
    assert pairs and {r.is_next for r in pairs} == {0, 1}  # both draw branches hit
    corpus = set(sents.values())
    for r in pairs:
        assert r.sent_a == sents[(r.doc_id, r.sent_id)]
        if r.is_next == 1:
            assert r.sent_b == sents[(r.doc_id, r.sent_id + 1)]
        else:
            assert r.sent_b in corpus  # random partner drawn from the corpus
    # doc-final sentence has no next: any is_next=1 draw there is dropped
    last_ids = {}
    for (d, s) in sents:
        last_ids[d] = max(last_ids.get(d, -1), s)
    for r in pairs:
        if r.is_next == 1:
            assert r.sent_id < last_ids[r.doc_id]


def test_nsp_deterministic_under_partitioning(spark, docs):
    a = sorted(map(tuple, nsp_pairs(docs).collect()))
    b = sorted(map(tuple, nsp_pairs(docs.repartition(7)).collect()))
    assert a == b


def test_nsp_negative_partner_decorrelated_from_label(spark):
    """ADVICE r3 (medium): with partner_idx and is_next derived from the
    SAME congruential draw h, a corpus of n sentences with gcd(n, 100)>1
    could only draw negative partners from ranks with rank%100 >= 50.
    Fixture: 100 single-sentence docs -> n = 100, the worst case — under
    the coupled draw NO negative partner rank below 50 could ever occur.
    The independent second draw must sample both halves."""
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(16))) for i in range(100)]
    docs100 = spark.createDataFrame(rows, "doc_id long, text string")
    sents = split_sentences_native(docs100).collect()
    assert len(sents) == 100
    rank_of = {
        r.sentence: k
        for k, r in enumerate(sorted(sents, key=lambda r: (r.doc_id, r.sent_id)))
    }
    neg_ranks = {rank_of[r.sent_b] for r in nsp_pairs(docs100).collect() if r.is_next == 0}
    assert any(k < 50 for k in neg_ranks), sorted(neg_ranks)
    assert any(k >= 50 for k in neg_ranks), sorted(neg_ranks)


def test_mlm_specials_exempt_and_counts(spark, docs):
    out = mlm_examples(docs).collect()
    assert out
    total = masked = 0
    for r in out:
        toks = r.masked_text.split(" ")
        assert toks[0] == "[CLS]" and toks[-1] == "[SEP]" and toks.count("[SEP]") == 2
        assert r.n_masked == toks.count("[MASK]")
        total += len(toks) - 3  # maskable positions
        masked += r.n_masked
    # congruential draw targets 15%; allow generous tolerance on small n
    assert 0.08 < masked / total < 0.22, (masked, total)


def test_mlm_plan_has_no_python_worker(spark, docs):
    plan = mlm_examples(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pack_sequences_tiles_windows_exactly(spark, docs):
    """Concat-and-chunk packing map: slices must tile every window
    exactly (full L tokens per window except the last), cover every
    document token exactly once, and be invariant to input partitioning
    (the prefix sum is the distributed two-stage form)."""
    from coap_rfc_knowledge_graph_spark.operators.pretrain import pack_sequences

    L = 32
    rows = pack_sequences(docs, context_len=L).collect()
    total_tokens = sum(40 + (i % 3) * 16 for i in range(12))
    assert sum(r.slice_len for r in rows) == total_tokens
    by_win = {}
    for r in rows:
        by_win.setdefault(r.window_id, []).append(r)
    last_win = max(by_win)
    for w, slices in by_win.items():
        slices.sort(key=lambda r: r.win_offset)
        pos = 0
        for s in slices:
            assert s.win_offset == pos  # contiguous tiling, no gaps
            assert s.slice_len > 0
            pos += s.slice_len
        assert pos == (L if w != last_win else total_tokens - last_win * L)
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, pack_sequences(docs.repartition(7), context_len=L).collect()))
    assert a == b
