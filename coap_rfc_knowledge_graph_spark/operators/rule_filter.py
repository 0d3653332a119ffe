"""P8: the RFC-2119 modal rule filter (SURVEY §2.2).

Reference semantics (``src/condition_split.py:70-80``,
``src/CoAP_contradiction_checking.py:232-238``): keep a sentence if any
modal keyword substring-matches; optionally drop the first match per
document (the RFC-2119 boilerplate sentence — the ``[1:]`` splice).

Fully native: an ``rlike`` filter (pushed into the scan when the source
supports it) + a ranking window for the boilerplate drop. ``rule_num``
is the per-document 0-based index of the rule sentence after the drop —
the reference's ``rule_sentence_num`` alignment key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import MODAL_REGEX, STRONG_MODAL_REGEX


def rule_sentences(
    sentences: DataFrame,
    drop_boilerplate: bool = True,
    pattern: str = MODAL_REGEX,
    strong_pattern: str = STRONG_MODAL_REGEX,
) -> DataFrame:
    """sentences -> rule_sentences(url, sent_id, sentence, rule_num, is_strong).

    ``pattern``/``strong_pattern`` default to the reference's RFC-2119
    substring semantics; corpora with other norm vocabularies pass their
    own regex (the operator shape — filter + boilerplate-drop window —
    is the contract, the keyword list is data)."""
    flagged = sentences.filter(F.col("sentence").rlike(pattern))
    w = Window.partitionBy("url").orderBy("sent_id")
    flagged = flagged.withColumn("rn", F.row_number().over(w))
    if drop_boilerplate:
        flagged = flagged.filter(F.col("rn") > 1).withColumn("rule_num", F.col("rn") - 2)
    else:
        flagged = flagged.withColumn("rule_num", F.col("rn") - 1)
    return flagged.drop("rn").withColumn(
        "is_strong", F.col("sentence").rlike(strong_pattern)
    )
