"""P9 + M8: pronoun detection and coreference resolution.

Reference semantics:
- pronoun finder (``src/corefernece_resolution.py:108, 148-163``): for
  each of 10 pronouns, a ``\\b``-bounded regex search including the
  capitalized form, emitting one row per occurrence with its 1-based
  occurrence number.
- QA resolution (``:238-243, 277-305``): context = the sentence plus its
  5 preceding document sentences; question "What does '<pronoun>' number
  <n> refer to?"; a BertForQuestionAnswering span predictor returns the
  antecedent text.

Spark shape: the pronoun fan-out is native (regexp_extract_all counts ->
sequence -> explode, codegen end-to-end); the context is the same window
frame as conditions.with_context; only the QA model itself is a pandas
UDF (deterministic stub here; swap point documented in
``stub_models.answer_coref``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import PRONOUNS
from ..functions import stub_models
from .conditions import with_context


def find_pronouns(sentences: DataFrame, pronouns: list[str] | None = None) -> DataFrame:
    """sentences -> pronoun_mentions(url, sent_id, sentence, pronoun,
    occurrence). One row per occurrence; capitalized forms count toward
    the same pronoun (reference searches both forms).

    Native: per-pronoun occurrence count via regexp_extract_all (the
    pronoun list is a static config -> a union of projections that
    Catalyst collapses into one pass), fan-out via sequence+explode."""
    pronouns = pronouns if pronouns is not None else PRONOUNS
    parts = []
    for p in pronouns:
        cap = p[0].upper() + p[1:]
        pat = r"\b(" + p + "|" + cap + r")\b"
        cnt = F.size(F.regexp_extract_all(F.col("sentence"), F.lit(pat), 1))
        # sequence(1, 0) would yield a DESCENDING [1, 0]; gate on cnt > 0
        occ = F.when(cnt > 0, F.sequence(F.lit(1), cnt)).otherwise(F.array().cast("array<int>"))
        parts.append(
            sentences.select(
                "url",
                "sent_id",
                "sentence",
                F.lit(p).alias("pronoun"),
                F.explode(occ).alias("occurrence"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


@pandas_udf(T.StringType())
def _coref_udf(context: pd.Series, pronoun: pd.Series, occurrence: pd.Series) -> pd.Series:
    """QA model stand-in (swap point: BertForQuestionAnswering batch,
    start/end span argmax over the tokenized context)."""
    rows = list(zip(context, pronoun, (int(o) for o in occurrence)))
    return pd.Series(stub_models.answer_coref_batch(rows))


def resolve_coreferences(sentences: DataFrame, pronouns: list[str] | None = None) -> DataFrame:
    """sentences -> coref(url, sent_id, pronoun, occurrence, antecedent).

    Window context (5 preceding sentences) + QA UDF; rows whose model
    answer is empty are dropped (reference treats no-span as no answer).
    """
    found = find_pronouns(sentences, pronouns).drop("sentence")
    ctx = with_context(found, sentences)
    resolved = ctx.withColumn(
        "antecedent", _coref_udf(F.col("context"), F.col("pronoun"), F.col("occurrence"))
    )
    return resolved.filter(F.col("antecedent") != "").select(
        "url", "sent_id", "pronoun", "occurrence", "antecedent"
    )
