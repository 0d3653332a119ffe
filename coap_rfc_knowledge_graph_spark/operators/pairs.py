"""M4-M5: entity-pair generation + [E1]/[E2] marker insertion.

Reference: all C(n,2) ordered combinations of a sentence's entity spans,
markers inserted into the token list at offset-adjusted positions
(``src/relation_extractor.py:25-39``), then special tokens dropped and
the text re-decoded / space-collapsed (``:79-84``).

Spark shape: a **theta self-join** of the mentions table on
``(url, sent_id)`` with ``a.begin < b.begin`` — an equi-join plus filter,
so it shuffles once on the url-keyed partitioning both sides already
share (SURVEY §2.3 M4). The marker insertion itself is string work in an
Arrow-batched pandas UDF that replicates the reference's ``list.insert``
sequence exactly (including its behaviour on the B->B overlap quirk).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import tokenizer


def _mark(sentence: str, b1: int, e1: int, b2: int, e2: int) -> str:
    toks = tokenizer.tokenize(sentence, pad=False)
    toks = list(toks)
    toks.insert(b1, "[E1]")
    toks.insert(e1 + 2, "[/E1]")
    toks.insert(b2 + 2, "[E2]")
    toks.insert(e2 + 4, "[/E2]")
    kept = [t for t in toks if t not in (tokenizer.PAD, tokenizer.CLS, tokenizer.SEP)]
    return re.sub(" +", " ", tokenizer.decode(kept, skip_special_tokens=False))


@pandas_udf(T.StringType())
def _mark_udf(sentence: pd.Series, b1: pd.Series, e1: pd.Series, b2: pd.Series, e2: pd.Series) -> pd.Series:
    return pd.Series(
        [_mark(s, int(a), int(b), int(c), int(d)) for s, a, b, c, d in zip(sentence, b1, e1, b2, e2)]
    )


def generate_pairs(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """mentions + sentences -> pairs(url, sent_id, e1, e2, marked_sentence).

    Both inputs are url-keyed; the self-join and the sentence join are
    equi-joins on (url, sent_id) — co-partitioned, one shuffle total under
    AQE. At 10^12 scale mentions-per-sentence is small (<=tens), so the
    C(n,2) blowup is bounded per row, never per partition.
    """
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
