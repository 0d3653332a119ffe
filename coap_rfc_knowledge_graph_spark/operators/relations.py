"""M6: relation classification -> the (subj, pred, obj) triples table.

Reference: ``BertForSequenceClassification`` over marked sentences, 8
classes (``src/relation_extractor.py:59-68``; inference twin
``src/MQTT_relation.py:114-146``); pairs predicted NO RELATION (0) are
dropped, the rest become triples.

Spark shape: one Arrow-batched pandas UDF producing ``pred`` + a native
filter + projection. The relation-id -> name decode is a broadcast-free
native CASE (``element_at`` on an array literal), so everything after the
UDF stays in whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import RELATION_NAMES
from ..functions import stub_models

_NAMES = [RELATION_NAMES[i] for i in range(len(RELATION_NAMES))]


@pandas_udf(T.IntegerType())
def _relation_udf(marked: pd.Series) -> pd.Series:
    return pd.Series(stub_models.classify_relation_batch(list(marked)), dtype="int32")


def classify_pairs(pairs: DataFrame) -> DataFrame:
    """pairs -> pairs + pred (int) + pred_name."""
    names = F.array(*[F.lit(n) for n in _NAMES])
    return pairs.withColumn("pred", _relation_udf(F.col("marked_sentence"))).withColumn(
        "pred_name", F.element_at(names, F.col("pred") + 1)
    )


def extract_triples(pairs: DataFrame) -> DataFrame:
    """classified pairs -> triples(subj, pred, obj, url, sent_id).

    Directionality: the reference's label set encodes both directions
    (HAS TYPE vs TYPE OF), so subj/obj are always (e1, e2) in sentence
    order, as in ``src/relation_extractor.py:42-56``.
    """
    classified = classify_pairs(pairs)
    return classified.filter(F.col("pred") != 0).select(
        F.col("e1").alias("subj"),
        F.col("pred_name").alias("pred"),
        F.col("e2").alias("obj"),
        "url",
        "sent_id",
    )
