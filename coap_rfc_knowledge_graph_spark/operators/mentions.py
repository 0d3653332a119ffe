"""M1-M3: tokenize -> NER tag -> BIO span decode -> mentions table.

The reference runs a fine-tuned ``BertForTokenClassification`` in
mini-batches of 16 (``src/extract_all_MQTT_entities.py:86-102``) then a
BIO state machine (``:107-138``). Here the whole chain is ONE Arrow-
batched pandas UDF returning ``array<struct<begin,end,surface>>`` which
is then exploded — no per-row Python at the Spark boundary, no shuffle
(narrow transformation over the url-partitioned sentences).

Model swap point: replace ``stub_models.tag_batch`` with a broadcast
torch checkpoint scoring the batch under ``no_grad`` (scalar-iterator UDF
so the model loads once per executor, not once per batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import stub_models, tokenizer

MENTION_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("begin", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("surface", T.StringType()),
        ]
    )
)


@pandas_udf(MENTION_STRUCT)
def _mentions_udf(sentences: pd.Series) -> pd.Series:
    token_lists = [tokenizer.tokenize(s, pad=False) for s in sentences]
    tag_lists = stub_models.tag_batch(token_lists)
    out = []
    for toks, tags in zip(token_lists, tag_lists):
        spans = stub_models.decode_spans(tags)
        row = []
        for b, e in spans:
            surface = tokenizer.decode_span(toks, b, e)
            if surface != "":  # ref drops empty decodes (CoAP_contradiction_checking.py:259)
                row.append((b, e, surface))
        out.append(row)
    return pd.Series(out)


def extract_mentions(sentences: DataFrame, explode: bool = True) -> DataFrame:
    """sentences -> mentions(url, sent_id, begin, end, surface).

    ``explode=False`` returns the array form (one row per sentence) for
    consumers that need per-sentence mention sets (pair generation)."""
    with_arr = sentences.withColumn("mentions", _mentions_udf(F.col("sentence")))
    if not explode:
        return with_arr
    return (
        with_arr.select("url", "sent_id", F.explode("mentions").alias("m"))
        .select("url", "sent_id", "m.begin", "m.end", "m.surface")
    )
