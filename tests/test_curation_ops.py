"""Round-4 curation operators: corpus-LM scoring, paragraph dedup,
PII redaction, hash split / stratified sampling, lexical retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coap_rfc_knowledge_graph_spark.operators.corpus_lm import (
    lm_coverage,
    lm_coverage_filter,
    lm_logprob,
    lm_logprob_reference,
    prune_top_bigrams,
    train_bigram_lm,
)
from coap_rfc_knowledge_graph_spark.operators.dedup import (
    dedup_lines_in_doc,
    paragraph_dedup,
    split_paragraphs,
)
from coap_rfc_knowledge_graph_spark.operators.pii import redact_pii
from coap_rfc_knowledge_graph_spark.operators.retrieval import lexical_topk
from coap_rfc_knowledge_graph_spark.operators.sampling import (
    hash_split,
    stratified_exact_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- corpus LM ------------------------------------------------------------------


def test_lm_coverage_hand_values(spark):
    ref = _docs(spark, [(0, "a b a b"), (1, "a b c")])
    # ref bigrams: (a b) x2 + (b a) + (a b) + (b c) -> counts: a b=3, b a=1, b c=1
    docs = _docs(spark, [(10, "a b c d"), (11, "x"), (12, "d d")])
    cov = {r.doc_id: r for r in lm_coverage(docs, train_bigram_lm(ref)).collect()}
    # doc 10: bigrams (a b)(b c)(c d): total 3, matched 2, sum 3+1=4
    assert (cov[10].total_bigrams, cov[10].matched_bigrams, cov[10].sum_match_count) == (3, 2, 4)
    # doc 11 has no bigrams -> no row; doc 12: (d d) unmatched
    assert 11 not in cov
    assert (cov[12].total_bigrams, cov[12].matched_bigrams, cov[12].sum_match_count) == (1, 0, 0)


def test_lm_coverage_filter_gate(spark):
    ref = _docs(spark, [(0, "a b c")])
    docs = _docs(spark, [(1, "a b c"), (2, "a b z z")])
    kept = {r.doc_id for r in lm_coverage_filter(docs, train_bigram_lm(ref), min_permille=700).collect()}
    # doc 1: 2/2 matched (1000‰); doc 2: 1/3 (333‰)
    assert kept == {1}


def test_lm_coverage_broadcast_path_equal_and_broadcasts(spark):
    ref = _docs(spark, [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5}") for i in range(20)])
    docs = _docs(spark, [(100 + i, f"w{i % 5} w{(i + 3) % 5}") for i in range(10)])
    lm = prune_top_bigrams(train_bigram_lm(ref), top_m=6)
    a = sorted(map(tuple, lm_coverage(docs, lm).collect()))
    b_df = lm_coverage(docs, lm, broadcast_lm=True)
    assert sorted(map(tuple, b_df.collect())) == a
    assert "BroadcastHashJoin" in b_df._jdf.queryExecution().executedPlan().toString()


def test_prune_top_bigrams_two_level_equals_global_order(spark):
    """The two-level top-M (per-partition candidates -> bounded final
    rank) must equal the naive global order exactly, including the
    (cnt desc, bigram asc) tie-break, across partitionings — the raw
    LM is corpus-sized, so the old global Window was a single-task
    sort on the scale path."""
    ref = _docs(
        spark,
        [(i, f"t{i % 17} t{(i * 7) % 17} t{(i * 3) % 17} t{i % 5}") for i in range(200)],
    )
    lm = train_bigram_lm(ref)
    for parts in (1, 7, 32):
        got = prune_top_bigrams(lm.repartition(parts), top_m=10).collect()
        expected = sorted(lm.collect(), key=lambda r: (-r.cnt, r.bigram))[:10]
        assert sorted(map(tuple, got)) == sorted(map(tuple, expected)), parts


def test_lm_logprob_matches_pure_python(spark):
    ref_texts = ["a b a b c", "b c a a"]
    texts = ["a b c", "c c c", "a"]
    ref = _docs(spark, list(enumerate(ref_texts)))
    docs = _docs(spark, [(10 + i, t) for i, t in enumerate(texts)])
    got = {r.doc_id: r.mean_logprob for r in lm_logprob(docs, ref, alpha=0.1).collect()}
    exp = lm_logprob_reference(texts, ref_texts, alpha=0.1)
    assert abs(got[10] - exp[0]) < 1e-9 and abs(got[11] - exp[1]) < 1e-9
    assert 12 not in got and exp[2] is None  # single-token doc: no transitions


# --- paragraph dedup --------------------------------------------------------------


def test_paragraph_dedup_first_occurrence_wins(spark):
    paras = spark.createDataFrame(
        [
            (0, 0, "alpha beta"),
            (0, 1, "gamma"),
            (1, 0, "alpha beta"),  # dup of (0,0) -> dropped
            (1, 1, "delta"),
            (2, 0, "alpha beta"),  # dup -> dropped
            (2, 1, "gamma"),       # dup of (0,1) -> dropped: doc 2 keeps nothing
        ],
        "doc_id long, para_id long, paragraph string",
    )
    got = {r.doc_id: r for r in paragraph_dedup(paras).collect()}
    assert (got[0].n_paras, got[0].n_kept, got[0].text_kept) == (2, 2, "alpha beta gamma")
    assert (got[1].n_paras, got[1].n_kept, got[1].text_kept) == (2, 1, "delta")
    assert 2 not in got  # lost every paragraph


def test_paragraph_dedup_within_doc_and_order(spark):
    paras = spark.createDataFrame(
        [(0, 0, "x"), (0, 1, "y"), (0, 2, "x"), (0, 3, "z")],
        "doc_id long, para_id long, paragraph string",
    )
    row = paragraph_dedup(paras).collect()[0]
    assert (row.n_paras, row.n_kept, row.text_kept) == (4, 3, "x y z")


def test_dedup_lines_in_doc_is_per_document(spark):
    """Within-doc repeats collapse to the first occurrence; the SAME
    line in another document is untouched (the global form of that is
    paragraph_dedup)."""
    paras = spark.createDataFrame(
        [
            (0, 0, "nav"), (0, 1, "body a"), (0, 2, "nav"), (0, 3, "body b"),
            (1, 0, "nav"), (1, 1, "other"),
        ],
        "doc_id long, para_id long, paragraph string",
    )
    got = {r.doc_id: r for r in dedup_lines_in_doc(paras).collect()}
    assert (got[0].n_lines, got[0].n_kept, got[0].text_kept) == (4, 3, "nav body a body b")
    assert (got[1].n_lines, got[1].n_kept, got[1].text_kept) == (2, 2, "nav other")


def test_job_line_dedup_prepass(spark):
    """--line-dedup: per-page first occurrences survive, other pages'
    identical lines untouched."""
    import argparse
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
    )
    import run_pipeline

    rows = [
        ("u0", None, "nav bar here\n\nreal content zero\n\nnav bar here\n\nfooter line", "en"),
        ("u1", None, "nav bar here\n\nreal content one", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, text string, lang string")
    args = argparse.Namespace(
        url_curation=False, pii_redact=False, paragraph_dedup=False, line_dedup=True,
        clean=False, decontaminate=None, lm_select_permille=None, lm_reference=None,
    )
    out = {r.url: r.text for r in run_pipeline._apply_prepasses(spark, pages, args, F).collect()}
    assert out["u0"] == "nav bar here real content zero footer line"
    assert out["u1"] == "nav bar here real content one"


def test_split_paragraphs_sep_and_windows(spark):
    docs = _docs(spark, [(0, "p one\n\np two"), (1, "a b c d e")])
    by_sep = split_paragraphs(docs.filter("doc_id = 0"), sep=r"\n\n").collect()
    assert [(r.para_id, r.paragraph) for r in sorted(by_sep, key=lambda r: r.para_id)] == [
        (0, "p one"), (1, "p two"),
    ]
    by_win = split_paragraphs(docs.filter("doc_id = 1"), words=2).collect()
    assert [r.paragraph for r in sorted(by_win, key=lambda r: r.para_id)] == ["a b", "c d", "e"]


# --- PII ------------------------------------------------------------------------


def test_pii_redaction_masks_and_counts(spark):
    docs = _docs(
        spark,
        [
            (0, "mail a.user+x@sub.example.co.uk now"),
            (1, "server at 192.168.1.20 and 10.0.0.1"),
            (2, "call +1-555-0134 or +44-201-9999 today"),
            (3, "clean text only"),
        ],
    )
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[0].redacted == "mail <EMAIL> now" and got[0].n_emails == 1
    assert got[1].redacted == "server at <IP> and <IP>" and got[1].n_ips == 2
    assert got[2].redacted == "call <PHONE> or <PHONE> today" and got[2].n_phones == 2
    assert got[3].redacted == "clean text only"
    assert (got[3].n_emails, got[3].n_ips, got[3].n_phones) == (0, 0, 0)


def test_pii_email_swallows_ip_shaped_host(spark):
    # the ip-shaped substring inside the email host must vanish with the
    # email, not survive as user@<IP>
    docs = _docs(spark, [(0, "x u@10.0.0.9.example.com y 10.0.0.9 z")])
    row = redact_pii(docs).collect()[0]
    assert row.redacted == "x <EMAIL> y <IP> z"
    assert (row.n_emails, row.n_ips) == (1, 1)


def test_pii_zero_shuffle_plan(spark):
    docs = _docs(spark, [(0, "t")])
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- hash split / stratified sample ----------------------------------------------


def test_hash_split_deterministic_and_proportional(spark):
    docs = _docs(spark, [(i, "t") for i in range(2000)])
    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(7)).collect()}
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.07 < c["val"] / 2000 < 0.13
    assert 0.07 < c["test"] / 2000 < 0.13


def test_stratified_sample_rates_and_stability(spark):
    rows = [(i, "t", "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "xx")) for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = stratified_exact_sample(docs, "lang", {"en": 500, "de": 1000}).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert "xx" not in by_lang  # default_permille=0 drops unlisted strata
    assert len(by_lang["de"]) == 1000  # rate 1000‰ keeps every de row
    assert 0.4 < len(by_lang["en"]) / 2000 < 0.6
    # stable under repartitioning
    kept2 = {r.doc_id for r in stratified_exact_sample(docs.repartition(9), "lang", {"en": 500, "de": 1000}).collect()}
    assert kept2 == {r.doc_id for r in kept}


# --- lexical retrieval ------------------------------------------------------------


def test_lexical_topk_ranking(spark):
    corpus = _docs(
        spark,
        [
            (0, "apple banana apple"),   # tf(apple)=2
            (1, "apple cherry"),
            (2, "banana banana banana"),
            (3, "durian"),
        ],
    )
    queries = spark.createDataFrame([(100, "apple banana")], "query_id long, text string")
    got = sorted(lexical_topk(corpus, queries, k=4).collect(), key=lambda r: r.rank)
    # df: apple=2 (w=500000), banana=2 (w=500000), doc0 = 2*500000+1*500000
    assert [(r.doc_id, r.score) for r in got] == [
        (0, 1_500_000), (2, 1_500_000), (1, 500_000),
    ][: len(got)]
    # tie between doc0 (1.5M) and doc2 (3*500000 = 1.5M) breaks by doc_id
    assert got[0].doc_id == 0 and got[1].doc_id == 2


def test_lexical_topk_max_df_prunes_stopwords(spark):
    corpus = _docs(spark, [(i, f"the w{i}") for i in range(10)])
    queries = spark.createDataFrame([(0, "the w3")], "query_id long, text string")
    got = lexical_topk(corpus, queries, k=10, max_df=5).collect()
    # "the" (df=10) is pruned; only w3 matches
    assert [(r.doc_id, r.rank) for r in got] == [(3, 1)]


def test_pii_adjacent_spans_all_masked(spark):
    """Space- or comma-separated IP runs (server lists, log dumps) must
    be FULLY masked: one replace pass leaks every second span because
    the left guard char is consumed by the neighbouring match — the
    second IPv4 pass closes that (review r4). Chains longer than two
    and the count column are pinned too."""
    from coap_rfc_knowledge_graph_spark.operators.pii import redact_pii

    rows = [
        (0, "1.2.3.4 5.6.7.8"),
        (1, "1.1.1.1,2.2.2.2,3.3.3.3,4.4.4.4,5.5.5.5"),
        (2, "srv 10.0.0.1 10.0.0.2 10.0.0.3 10.0.0.4 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.redacted, r.n_ips) for r in redact_pii(df).collect()}
    assert got[0] == ("<IP> <IP>", 2)
    assert got[1] == ("<IP>,<IP>,<IP>,<IP>,<IP>", 5)
    assert got[2] == ("srv <IP> <IP> <IP> <IP> end", 4)


def test_pii_spark_duckdb_differential_fuzz(spark):
    """Cross-engine differential test: the PII masking chain (email ->
    ipv4 -> phone, global replace) must produce byte-identical output in
    Spark (Java regex) and DuckDB (RE2) on adversarial inputs — the
    pii_redact oracle contract rests on that equivalence. Seeded
    generator: at-sign pileups, ip-shaped hosts, overlong octets,
    boundary digits, plus-less phones, unicode neighbors."""
    import random

    import duckdb

    rng = random.Random(777)
    locals_ = ["a", "a.b", "a_b%c+d-", "", "A9", "..", "a@b"]
    hosts_ = ["ex.com", "10.0.0.9.net", "x.CO.uk", "a-b.c", "q", "9.9.9.9", ""]
    ips = ["1.2.3.4", "255.255.255.255", "256.1.1.1", "01.2.3.4", "1.2.3", "1.2.3.4.5"]
    phones = ["+1-555-0134", "+44-201-99999", "+999-123-4567", "1-555-0134", "+1-55-0134"]
    fillers = ["", " ", "x", " word ", "@", ".", "(", "é", "3"]
    cases = []
    for _ in range(300):
        parts = [
            rng.choice(fillers),
            rng.choice(locals_) + "@" + rng.choice(hosts_),
            rng.choice(fillers),
            rng.choice(ips),
            rng.choice(fillers),
            rng.choice(phones),
            rng.choice(fillers),
        ]
        rng.shuffle(parts)
        cases.append("".join(parts))

    from coap_rfc_knowledge_graph_spark.operators.pii import redact_pii

    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "doc_id long, text string")
    sp = {
        r.doc_id: (r.redacted, r.n_emails, r.n_ips, r.n_phones)
        for r in redact_pii(sdf).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    rows = con.execute(
        r"""
        WITH s1 AS (
          SELECT i, text,
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                                '<EMAIL>', 'g') AS ae
          FROM t
        ),
        s2 AS (
          SELECT *, regexp_replace(ae,
                      '(^|[^0-9.])([0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})(\z|[^0-9.])',
                      '\1<IP>\3', 'g') AS ai1
          FROM s1
        ),
        s3 AS (
          SELECT *, regexp_replace(ai1,
                      '(^|[^0-9.])([0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})(\z|[^0-9.])',
                      '\1<IP>\3', 'g') AS ai
          FROM s2
        )
        SELECT i,
               regexp_replace(ai, '(\+[0-9]{1,3}-[0-9]{3}-[0-9]{4})(\z|[^0-9])', '<PHONE>\2', 'g'),
               len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
               len(regexp_extract_all(ae,
                   '(^|[^0-9.])([0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})(\z|[^0-9.])'))
               + len(regexp_extract_all(ai1,
                   '(^|[^0-9.])([0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})(\z|[^0-9.])')),
               len(regexp_extract_all(ai, '(\+[0-9]{1,3}-[0-9]{3}-[0-9]{4})(\z|[^0-9])'))
        FROM s3
        """
    ).fetchall()
    mismatches = [
        (cases[i], sp[i], (red, ne, ni, np_))
        for i, red, ne, ni, np_ in rows
        if sp[i] != (red, ne, ni, np_)
    ]
    assert not mismatches, mismatches[:5]


# --- token budget / mixture rates ---------------------------------------------


def test_token_budget_counts_and_share(spark):
    from coap_rfc_knowledge_graph_spark.operators.mixture import token_budget

    docs = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "d e", "en"), (2, "f g h i j", "de")],
        "doc_id long, text string, lang string",
    )
    got = {r.lang: r for r in token_budget(docs, ("lang",)).collect()}
    assert (got["en"].n_docs, got["en"].n_tokens) == (2, 5)
    assert (got["de"].n_docs, got["de"].n_tokens) == (1, 5)
    assert got["en"].share_permille == 500 and got["de"].share_permille == 500


def test_mixture_rates_binding_group_keeps_all(spark):
    from coap_rfc_knowledge_graph_spark.operators.mixture import mixture_rates, token_budget

    # en supplies 900 tokens, de 100; target 50/50. de is binding ->
    # rate_de = 1000, en downsamples to ~100 tokens -> rate ~111
    docs = spark.createDataFrame(
        [(i, "w " * 9, "en") for i in range(100)] + [(1000 + i, "w", "de") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    b = token_budget(docs, ("lang",))
    got = {r.lang: r.rate_permille for r in mixture_rates(b, {"en": 500, "de": 500}, "lang").collect()}
    assert got["de"] == 1000
    assert 105 <= got["en"] <= 112  # (500 * C) div 900 with C = 100*1000//500 = 200 -> 111
    # post-sampling expected tokens: en 900*111/1000 ~ 100 == de's kept 100


def test_mixture_rates_drops_untargeted_groups(spark):
    from coap_rfc_knowledge_graph_spark.operators.mixture import mixture_rates, token_budget

    docs = spark.createDataFrame(
        [(0, "a b", "en"), (1, "c d", "xx")], "doc_id long, text string, lang string"
    )
    got = {r.lang: r.rate_permille for r in mixture_rates(
        token_budget(docs, ("lang",)), {"en": 1000}, "lang"
    ).collect()}
    assert got == {"en": 1000, "xx": 0}


def test_tokenization_spark_duckdb_differential_fuzz(spark):
    """The lm_coverage / lexical_topk / token_budget oracles all rest on
    `filter(split(lower(text), '\\s+'), t <> '')` behaving identically
    in Spark and DuckDB. Differential-fuzz that primitive: unicode case
    folding (lower), exotic whitespace, leading/trailing separators,
    empty strings.

    KNOWN divergence (found by this fuzz, documented here as the
    contract boundary): Java's lower('\u0130' U+0130) follows Unicode
    SpecialCasing and yields 'i' + U+0307 combining dot; DuckDB's
    utf8proc yields plain 'i'. The assertion therefore requires that
    EVERY mismatch involves U+0130 — any other divergence class is a
    new bug. Spark's (Unicode-correct) behavior is the engine of
    record; the DuckDB oracles are exact for text without U+0130."""
    import random

    import duckdb

    rng = random.Random(999)
    atoms = [
        "word", "WORD", "Wörd", "ÉTÉ", "İstanbul", "ß", "ΣΙΓΜΑ", "x",
        "", " ", "\t", "\n", "\r\n", " ", " ", "  ", "a-b", "1.2",
    ]
    cases = ["".join(rng.choice(atoms) for _ in range(rng.randint(0, 12))) for _ in range(300)]

    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, text string")
    sp = {
        r.i: list(r.toks)
        for r in sdf.select(
            "i",
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "").alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    rows = con.execute(
        r"SELECT i, list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') FROM t"
    ).fetchall()
    mismatches = [(cases[i], sp[i], list(d)) for i, d in rows if sp[i] != list(d)]
    unexplained = [m for m in mismatches if "\u0130" not in m[0]]
    assert not unexplained, unexplained[:5]
    # and the U+0130 divergence itself must exist — if a DuckDB upgrade
    # starts matching Java here, this fires so the caveat can be removed
    assert any("\u0130" in c for c in cases)
    assert mismatches, "U+0130 divergence vanished — update the documented contract boundary"
