"""M4-M5: entity-pair generation + [E1]/[E2] marker insertion.

Reference: all C(n,2) ordered combinations of a sentence's entity spans,
markers inserted into the token list at offset-adjusted positions
(``src/relation_extractor.py:25-39``), then special tokens dropped and
the text re-decoded / space-collapsed (``:79-84``).

Spark shape: the pair fan-out is ARRAY-LOCAL — each sentence row carries
its mention array, and one Arrow-batched UDF tokenizes the sentence ONCE
and emits every marked pair, which is then ``posexplode``d. No shuffle
at all: this replaces the naive theta self-join on (url, sent_id) (an
equi-join + filter that reshuffles the corpus and re-tokenizes per
pair). At 10^12 documents the blowup is bounded per row (mentions per
sentence <= tens), never per partition, and the stage stays narrow —
pipelined straight from the mention stage.

``generate_pairs_selfjoin`` keeps the join formulation for reference/
comparison (used in plan tests to show the explain difference).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import tokenizer

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("e1", T.StringType()),
        T.StructField("e2", T.StringType()),
        T.StructField("marked_sentence", T.StringType()),
    ]
)


def _mark_tokens(toks: list[str], b1: int, e1: int, b2: int, e2: int) -> str:
    """Marker insertion replicating the reference's ``list.insert``
    sequence (offsets +2/+4 after earlier inserts,
    ``src/relation_extractor.py:25-39``)."""
    t = list(toks)
    t.insert(b1, "[E1]")
    t.insert(e1 + 2, "[/E1]")
    t.insert(b2 + 2, "[E2]")
    t.insert(e2 + 4, "[/E2]")
    kept = [x for x in t if x not in (tokenizer.PAD, tokenizer.CLS, tokenizer.SEP)]
    return re.sub(" +", " ", tokenizer.decode(kept, skip_special_tokens=False))


def generate_pairs_from_arrays(mentions_arr: DataFrame) -> DataFrame:
    """mentions in array form (url, sent_id, sentence, mentions) ->
    pairs(url, sent_id, e1, e2, marked_sentence). Narrow, shuffle-free.

    The fan-out happens INSIDE ``mapInPandas`` (the UDF emits exploded
    rows directly) instead of UDF->array->``explode``: a Generate over a
    fat UDF-produced array<struct> column costs ~4x the UDF itself in
    copy overhead, measured at sf0.1 (35.6s -> 8s for 448k pairs).

    NOTE deliberately no ``filter(size(mentions) >= 2)`` here: a native
    filter on a UDF-produced column makes Catalyst evaluate the mention
    UDF TWICE (once for the predicate, once for the projection — two
    ArrowEvalPython nodes); the <2-mention rows are skipped inside the
    loop instead (tests/test_plans.py pins the single-evaluation shape)."""
    pruned = mentions_arr.select("url", "sent_id", "sentence", "mentions")

    def fn(batches):
        for pdf in batches:
            urls: list[str] = []
            sids: list[int] = []
            e1s: list[str] = []
            e2s: list[str] = []
            marked: list[str] = []
            for url, sid, sent, ms in zip(pdf["url"], pdf["sent_id"], pdf["sentence"], pdf["mentions"]):
                if ms is None or len(ms) < 2:
                    continue
                toks = tokenizer.tokenize(sent, pad=False)
                spans = sorted(
                    ((int(m["begin"]), int(m["end"]), m["surface"]) for m in ms),
                    key=lambda x: (x[0], x[1]),
                )
                for i in range(len(spans)):
                    b1, e1, s1 = spans[i]
                    for j in range(i + 1, len(spans)):
                        b2, e2, s2 = spans[j]
                        urls.append(url)
                        sids.append(sid)
                        e1s.append(s1)
                        e2s.append(s2)
                        marked.append(_mark_tokens(toks, b1, e1, b2, e2))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "sent_id": pd.array(sids, dtype="int32"),
                    "e1": e1s,
                    "e2": e2s,
                    "marked_sentence": marked,
                }
            )

    return pruned.mapInPandas(fn, PAIRS_SCHEMA)


def generate_pairs(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """Compatibility entry: exploded mentions + sentences -> pairs.

    Regroups mentions per sentence (one url-keyed shuffle both inputs
    already share) then runs the array-local path. Callers holding the
    array form should use :func:`generate_pairs_from_arrays` directly.
    """
    arr = (
        mentions.groupBy("url", "sent_id")
        .agg(F.collect_list(F.struct("begin", "end", "surface")).alias("mentions"))
        .join(sentences.select("url", "sent_id", "sentence"), on=["url", "sent_id"])
    )
    return generate_pairs_from_arrays(arr)


def generate_pairs_selfjoin(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """The theta-self-join formulation (kept for plan comparison; the
    array-local path above produces identical rows without the shuffle)."""

    @pandas_udf(T.StringType())
    def _mark_udf(sentence: pd.Series, b1: pd.Series, e1: pd.Series, b2: pd.Series, e2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _mark_tokens(tokenizer.tokenize(s, pad=False), int(a), int(b), int(c), int(d))
                for s, a, b, c, d in zip(sentence, b1, e1, b2, e2)
            ]
        )

    a = mentions.select(
        "url", "sent_id",
        F.col("begin").alias("b1"), F.col("end").alias("e1"), F.col("surface").alias("e1_surface"),
    )
    b = mentions.select(
        "url", "sent_id",
        F.col("begin").alias("b2"), F.col("end").alias("e2"), F.col("surface").alias("e2_surface"),
    )
    pairs = a.join(b, on=["url", "sent_id"]).filter(F.col("b1") < F.col("b2"))
    pairs = pairs.join(sentences.select("url", "sent_id", "sentence"), on=["url", "sent_id"])
    return pairs.select(
        "url",
        "sent_id",
        F.col("e1_surface").alias("e1"),
        F.col("e2_surface").alias("e2"),
        _mark_udf("sentence", "b1", "e1", "b2", "e2").alias("marked_sentence"),
    )
