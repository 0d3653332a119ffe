"""Engine-exact NATIVE variant of the flagship triple-extraction chain.

The flagship path (``plans/pipeline.extract_stage``) routes through model
UDFs (tokenizer + NER tagger + relation classifier) that no SQL engine
can reproduce, so the driver's correctness gate could only count its
rows. This module re-expresses the SAME chain shape — sentence split ->
mention detection -> span decode -> pair fan-out -> relation classify ->
(subj, pred, obj) — entirely in Catalyst expressions built on
md5-prefix hashes, making every VALUE reproducible in DuckDB (the
``simhash_native`` pattern, VERDICT r2 item 1).

Reference parity targets (semantics studied, not copied):
- mention runs:   ``src/extract_all_MQTT_entities.py:107-138`` (maximal
  runs of entity-tagged tokens -> spans)
- pair fan-out:   ``src/relation_extractor.py:42-56`` (C(n,2) pairs in
  sentence order, subj/obj = (e1, e2))
- relation model: ``src/relation_extractor.py:59-68`` — here the
  deterministic 60-bit md5 hash family (same ~40% non-zero rate as the
  stub model, value-computable in any engine)

Scale shape: every window partitions by (doc_id, sent_id) — no global
sort anywhere; the span self-join is an equi-join on the same key, so
the whole chain runs on one hash partitioning of the corpus. Pure
whole-stage-codegen: zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import MODAL_KEYWORDS, RELATION_NAMES
from ..functions.ranking import zip_with_rank
from ..functions.stub_models import _LEXICON

# native variant's relation-hash family: first 15 md5 hex chars = 60-bit
# signed-safe int (same trick as dedup.simhash_pairs_native)
_N_REL = len(RELATION_NAMES)
_REL_NAMES = [RELATION_NAMES[i] for i in range(_N_REL)]


def _hash60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def native_sentences(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sent_id, sentence): split on '. ' — the native stand-in
    for the Punkt stage (P4), reproducible as regexp_split in SQL."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), r"\. ")).alias("sent_id", "sentence"),
        )
        .filter(F.trim("sentence") != "")
    )


def native_mentions(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sent_id, sentence, begin, end, surface): maximal runs of
    entity tokens, via the gaps-and-islands pattern (island id = token
    position minus entity-run rank — constant within a run).

    Entity-token rule mirrors the stub tagger's
    (``functions/stub_models._is_entity_token``): alphabetic first char,
    not an RFC-2119 modal, and (capitalized OR in the lexicon); the
    sentence's first token must be in the lexicon (positional
    capitalization doesn't count).
    """
    sents = native_sentences(docs, id_col, text_col)
    toks = sents.select(
        "doc_id",
        "sent_id",
        "sentence",
        F.posexplode(F.split(F.col("sentence"), " ")).alias("raw_pos", "token"),
    ).filter(F.col("token") != "")
    by_sent = Window.partitionBy("doc_id", "sent_id")
    toks = toks.withColumn("tpos", F.row_number().over(by_sent.orderBy("raw_pos")))
    lex = F.array(*[F.lit(w) for w in sorted(_LEXICON)])
    modals = F.array(*[F.lit(m) for m in MODAL_KEYWORDS])
    in_lex = F.array_contains(lex, F.lower(F.col("token")))
    cap = F.col("token").rlike("^[A-Z]")
    alpha_start = F.col("token").rlike("^[A-Za-z]")
    is_ent = (
        alpha_start
        & ~F.array_contains(modals, F.col("token"))
        & F.when(F.col("tpos") == 1, in_lex).otherwise(cap | in_lex)
    )
    ent = toks.filter(is_ent).withColumn(
        "island", F.col("tpos") - F.row_number().over(by_sent.orderBy("tpos"))
    )
    return (
        ent.groupBy("doc_id", "sent_id", "sentence", "island")
        .agg(
            F.min("tpos").alias("begin"),
            F.max("tpos").alias("end"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("surface"),
        )
        .drop("island")
    )


def native_triples(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sent_id, subj, pred, obj): C(n,2) mention pairs per
    sentence in span order, classified by the 60-bit md5 hash family over
    the marker representation ``sentence|b1:e1|b2:e2``; pairs hashing to
    NO RELATION (same 60% rate as the stub model) are dropped."""
    spans = native_mentions(docs, id_col, text_col)
    by_sent = Window.partitionBy("doc_id", "sent_id").orderBy("begin", "end")
    spans = spans.withColumn("k", F.row_number().over(by_sent))
    a = spans.select(
        "doc_id", "sent_id", "sentence", F.col("k").alias("ka"),
        F.col("begin").alias("b1"), F.col("end").alias("e1"), F.col("surface").alias("subj_surface"),
    )
    b = spans.select(
        "doc_id", "sent_id", F.col("k").alias("kb"),
        F.col("begin").alias("b2"), F.col("end").alias("e2"), F.col("surface").alias("obj_surface"),
    )
    pairs = a.join(b, on=["doc_id", "sent_id"]).filter(F.col("ka") < F.col("kb"))
    marked = F.concat_ws(
        "|",
        F.col("sentence"),
        F.concat_ws(":", F.col("b1"), F.col("e1")),
        F.concat_ws(":", F.col("b2"), F.col("e2")),
    )
    # `div` (integer division), NOT `/`: float division of a 60-bit hash
    # loses precision past 2^53 and would diverge from the SQL oracle
    pred_id = F.when(F.col("__h") % 100 < 60, F.lit(0)).otherwise(
        (F.lit(1) + F.expr("__h div 100") % (_N_REL - 1)).cast("int")
    )
    names = F.array(*[F.lit(n) for n in _REL_NAMES])
    return (
        pairs.withColumn("__h", _hash60(marked))
        .withColumn("pred_id", pred_id)
        .filter(F.col("pred_id") != 0)
        .select(
            "doc_id",
            "sent_id",
            F.col("subj_surface").alias("subj"),
            F.element_at(names, F.col("pred_id") + 1).alias("pred"),
            F.col("obj_surface").alias("obj"),
        )
    )


def native_entities(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(entity_id, canonical): the native analog of the N1 dictionary —
    distinct lowercased mention surfaces, id = lexicographic rank (the
    flagship uses first-seen rank + embedding merge; the native variant's
    value-verifiable contract is the rank of the distinct surface set)."""
    surfaces = (
        native_mentions(docs, id_col, text_col)
        .select(F.lower(F.col("surface")).alias("canonical"))
        .distinct()
    )
    # distributed zipWithIndex, not Window.orderBy (VERDICT r3 #2: the
    # global window is a single-task sort) — identical lexicographic rank
    return zip_with_rank(surfaces, ["canonical"], idx_col="entity_id").select(
        "entity_id", "canonical"
    )


def native_variables(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sent_id, variables): the value-verifiable native analog
    of the M13 sentence-only variable extractor — rule sentences (RFC
    2119 modal match, the reference's uppercase-substring filter,
    ``variable_extractor_generate_GPT-2.py:43-50``) mapped to the
    ``entity @ behaviour = True|False;`` grammar with the stub head's
    branch chain re-expressed as pure Catalyst (every branch computable
    verbatim in DuckDB). Entity = the sentence's first native mention
    span; behaviour = the keyword-branch chain of
    ``stub_models.generate_properties``; sentiment = negated-modal scan.

    Scale shape: one (doc_id, sent_id) equi-join between the rule
    filter and the mention spans (both already partitioned by that key
    in native_mentions), then a projection — no extra shuffle, zero
    Python."""
    sents = native_sentences(docs, id_col, text_col)
    # case-insensitive + the stream/window extensions, matching the
    # modal_filter contract entry: the synthetic web-text corpus is
    # lowercase, so the reference's uppercase-substring filter would be
    # vacuous on it (documented divergence — the RFC-corpus path keeps
    # the uppercase semantics via operators/rule_filter.py)
    modal_re = r"(?i)\b(must|shall|should|required|recommended|may|optional|stream|window)\b"
    rules = sents.filter(F.col("sentence").rlike(modal_re))
    first_ent = (
        native_mentions(docs, id_col, text_col)
        .groupBy("doc_id", "sent_id")
        .agg(F.min_by("surface", "begin").alias("entity_surface"))
    )
    joined = rules.join(first_ent, on=["doc_id", "sent_id"], how="left")

    s = F.col("sentence")
    low = F.lower(s)
    entity = F.lower(F.coalesce(F.col("entity_surface"), F.lit("unknown entity")))
    sentiment = F.when(
        s.rlike(r"\b(MUST NOT|SHALL NOT|SHOULD NOT|MAY NOT|NOT RECOMMENDED)\b"),
        F.lit("False"),
    ).otherwise(F.lit("True"))
    bet_lo = F.regexp_extract(s, r"(?i)\bbetween (\d+) and (\d+)\b", 1)
    bet_hi = F.regexp_extract(s, r"(?i)\bbetween (\d+) and (\d+)\b", 2)
    set_to = F.trim(F.regexp_extract(s, r'(?i)\bset to ([\w." ]{1,24}?)(?:[,.;]|$)', 1))
    digits = F.expr(r"regexp_extract_all(sentence, '\\b(\\d+)\\b', 1)")
    code = F.when(F.size(digits) == 0, F.lit("4.04")).otherwise(
        F.array_join(F.slice(digits, 1, 2), ".")
    )
    last_word = F.element_at(F.expr("regexp_extract_all(lower(sentence), '([a-z]+)', 1)"), -1)
    behaviour = (
        F.when(bet_lo != "", F.concat(F.lit("be between "), bet_lo, F.lit(" and "), bet_hi))
        .when(set_to != "", F.concat(F.lit("be set to "), set_to))
        .when(low.contains("ignored"), F.lit("be ignored"))
        .when(low.contains("ignore"), F.lit("ignore the option"))
        .when(low.contains("message format error"), F.lit("be processed as a message format error"))
        .when(low.contains("reject") & low.contains("message"), F.lit("reject the message"))
        .when(low.contains("rejected"), F.lit("be rejected"))
        .when(low.contains("idempotent"), F.lit("be idempotent"))
        .when(low.contains("empty"), F.lit("be Empty"))
        .when(low.contains("default value"), F.lit("use the default value"))
        .when(low.contains("response code"), F.concat(F.lit("return a Response Code "), code))
        .otherwise(F.concat(F.lit("value be "), F.coalesce(last_word, F.lit("unspecified"))))
    )
    return joined.select(
        "doc_id",
        "sent_id",
        F.concat(entity, F.lit(" @ "), behaviour, F.lit(" = "), sentiment, F.lit(";")).alias(
            "variables"
        ),
    )
