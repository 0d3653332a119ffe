"""M12: retrieval-augmented few-shot prompt construction.

The reference (``src/variable_extraction_GPT-3.py:21-41,203-233``) ranks
annotated example sentences by embedding cosine against each unannotated
query sentence, takes the top-k, and assembles a GPT-3 prompt::

    Sentence: <context 1>\nBehaviours: <labels 1>\n...
    Sentence: <query>\nBehaviours:

The engine-side deliverable is the deterministic PROMPT TABLE — the
external completion call (``openai.Completion.create``, ``:214-224``) is
an API egress, not a data transformation, and stays out of engine scope
(callers feed ``prompt`` to whatever completion backend they use, e.g.
via a mapInPandas batch client).

Determinism: similarity ranking uses scaled-integer dot products
(``round(x * 1e6)`` longs — the same engine-exact trick as the kNN
contract query), and ties break on example id DESCENDING, matching the
reference's ``sorted((sim, j), reverse=True)`` tuple order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scaled_int_vec(col, scale: int = 1_000_000):
    """array<float> -> array<long> of round(x * scale): exact integer
    arithmetic downstream, identical in any engine."""
    return F.transform(col, lambda x: F.round(x.cast("double") * scale).cast("long"))


def fewshot_prompts(
    queries: DataFrame,
    examples: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(query_id, sentence, iv) x (ex_id, sentence, behaviours, iv)
    -> (query_id, prompt).

    The annotated example pool is broadcast (the reference pool is 50
    hand-labels; pools are small by construction — they are hand-written)
    so the only wide operation is the per-query top-k window, partitioned
    by query_id: no skew (each query contributes exactly |pool| rows).
    """
    ex = examples.select(
        F.col("ex_id"),
        F.col("sentence").alias("ex_sentence"),
        F.col("behaviours"),
        F.col("iv").alias("ev"),
    )
    dot = F.aggregate(
        F.zip_with("iv", "ev", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = queries.join(F.broadcast(ex)).withColumn("idot", dot)
    w = Window.partitionBy("query_id").orderBy(F.desc("idot"), F.desc("ex_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    ctx = ranked.groupBy("query_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "ex_sentence", "behaviours"))),
                lambda s: F.concat(
                    F.lit("Sentence: "), s["ex_sentence"],
                    F.lit("\nBehaviours: "), s["behaviours"], F.lit("\n"),
                ),
            ),
            "",
        ).alias("ctx")
    )
    return (
        queries.select("query_id", "sentence")
        .join(ctx, on="query_id")
        .select(
            "query_id",
            F.concat(
                F.col("ctx"), F.lit("Sentence: "), F.col("sentence"), F.lit("\nBehaviours: ")
            ).alias("prompt"),
        )
    )
