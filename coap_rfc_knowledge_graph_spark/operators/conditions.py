"""M8-M10: context windows, condition splitting, properties generation.

Reference semantics:
- context = the rule sentence plus its 5 preceding document sentences,
  joined with " " (``construct_context``,
  ``src/properties_extractor.py:74-78``; k=5 at ``:95-111``). The
  reference locates the sentence by ``list.index`` (first occurrence);
  we use the true ``sent_id`` — strictly more correct on duplicate
  sentences (documented divergence, FIXTURES.md §4).
- condition split (``src/condition_split.py:60-66`` prompt; consumption
  at ``src/properties_extractor.py:95-111``): each rule sentence becomes
  one "Entity rule" clause, or an "Antecedent rule" clause + a
  "Consequent rule" clause.
- properties generation (``src/properties_extractor.py:64-71``): per
  (context, clause) emit an ``entity @ behaviour = True|False;`` string.

Spark shape: the context is a **window frame** (rowsBetween(-5, 0) +
collect_list) over the url-partitioned sentences — one shuffle, reused
from the url partitioning upstream. Both generative models are Arrow-
batched pandas UDFs over that frame; the split fan-out is an explode of
an array<struct> column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import CONTEXT_WINDOW
from ..functions import stub_models

# --- M8 context construction --------------------------------------------------


def with_context(rule_sentences_df: DataFrame, sentences: DataFrame, k: int = CONTEXT_WINDOW) -> DataFrame:
    """Attach ``context`` (k preceding document sentences + the sentence
    itself, space-joined) to each rule sentence.

    The frame runs over ALL document sentences (reference indexes into
    the full document list), then inner-joins back to the rule subset on
    (url, sent_id) — both sides url-partitioned, equi-join.
    """
    w = Window.partitionBy("url").orderBy("sent_id").rowsBetween(-k, 0)
    ctx = sentences.withColumn("context", F.concat_ws(" ", F.collect_list("sentence").over(w)))
    return rule_sentences_df.join(ctx.select("url", "sent_id", "context"), on=["url", "sent_id"])


# --- M9 condition split -------------------------------------------------------

_SPLIT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("condition", T.StringType()),  # Entity|Antecedent|Consequent rule
            T.StructField("clause", T.StringType()),
        ]
    )
)


@pandas_udf(_SPLIT_SCHEMA)
def _split_udf(sentences: pd.Series) -> pd.Series:
    """Generative condition splitter stand-in (swap point: GPT-2 prompt
    "Sentence: X\\nAntecedent:" batch generation, parse A/C pairs)."""
    return pd.Series(stub_models.split_condition_batch(list(sentences)))


def split_conditions(rule_sentences_df: DataFrame) -> DataFrame:
    """rule sentences -> clauses(url, sent_id, rule_num, is_strong,
    sentence, condition, clause, clause_id)."""
    arr = rule_sentences_df.withColumn("splits", _split_udf(F.col("sentence")))
    return arr.select(
        "url",
        "sent_id",
        "rule_num",
        "is_strong",
        "sentence",
        F.posexplode("splits").alias("clause_id", "s"),
    ).select("url", "sent_id", "rule_num", "is_strong", "sentence", "clause_id", "s.condition", "s.clause")


# --- M10 properties generation ------------------------------------------------


@pandas_udf(T.StringType())
def _properties_udf(clauses: pd.Series, entities: pd.Series) -> pd.Series:
    """Generative properties model stand-in (swap point: GPT-2 prompt
    "Context: C\\nSentence: S\\nProperties:" batch generation)."""
    return pd.Series(stub_models.generate_properties_batch(list(clauses), list(entities)))


def generate_behaviours(clauses: DataFrame, mentions: DataFrame) -> DataFrame:
    """clauses + mentions -> behaviours: each clause gains a ``subject``
    (the sentence's first mention surface — the reference's generative
    model infers the subject from context; the stub needs it explicit)
    and the generated ``behaviours`` grammar string."""
    first_mention = (
        mentions.groupBy("url", "sent_id")
        .agg(F.min_by("surface", "begin").alias("subject"))
    )
    joined = clauses.join(first_mention, on=["url", "sent_id"], how="left")
    return joined.withColumn(
        "behaviours",
        _properties_udf(F.col("clause"), F.coalesce(F.col("subject"), F.lit("unknown entity"))),
    )
