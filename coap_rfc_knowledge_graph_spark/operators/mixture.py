"""Data-mixture accounting — the token-budget bookkeeping a training
run does before sampling its corpus (the Pile / LLaMA-style "X% web,
Y% code, Z% wiki" tables): per-group token totals, corpus shares, and
the per-group sampling rates that hit a target distribution.

All integer arithmetic (BIGINT token counts, permille shares via floor
division) — engine-exact, hash-verifiable cross-engine, and immune to
the float-ratio drift that plagues percentage bookkeeping.

Scale shape: one hash aggregate over the corpus (map-side combine;
group cardinality = languages x domains, tiny), then group-level joins
against broadcast scalars. Nothing after the first aggregate touches
corpus-sized data — the rates table feeds
``sampling.stratified_exact_sample`` for the actual downsample pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_budget(
    docs: DataFrame, group_cols: tuple[str, ...] = ("lang",), text_col: str = "text"
) -> DataFrame:
    """Per-group (n_docs, n_tokens, share_permille): whitespace token
    totals with the group's floor-permille share of the corpus. One
    aggregate + a broadcast scalar join."""
    from ..functions.tokens import tokens_expr

    toks = tokens_expr(text_col)
    counts = docs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # coalesce: a group of all-null text sums to null, not 0
        F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("long").alias("n_tokens"),
    )
    total = counts.agg(F.sum("n_tokens").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        # nullif: an all-empty corpus (total 0) yields null shares, not
        # an ANSI DIVIDE_BY_ZERO that kills the whole accounting job
        .withColumn("share_permille", F.expr("(n_tokens * 1000) div nullif(__total, 0)"))
        .drop("__total")
    )


def mixture_rates(
    budget: DataFrame,
    targets_permille: dict[str, int],
    group_col: str,
) -> DataFrame:
    """Per-group sampling rates (permille) that realize a target token
    distribution WITHOUT upsampling: the binding group — the one whose
    target is largest relative to its supply — keeps 1000‰, every other
    group downsamples proportionally:

        C      = min over g of (n_tokens_g * 1000) div target_g
        rate_g = (target_g * C) div n_tokens_g      (<= 1000 by C's def)

    Exact integers throughout; groups absent from ``targets_permille``
    get rate 0 (dropped from the mix). A targeted group with ZERO token
    supply (all-empty text) also gets rate 0 and is excluded from the
    binding-group min — it cannot supply tokens, and including it would
    both drive C (hence every rate) to 0 and divide by its own zero
    n_tokens, an ANSI-mode DIVIDE_BY_ZERO. Output: (group, n_tokens,
    rate_permille)."""
    t = None
    for k, v in sorted(targets_permille.items()):
        t = F.when(F.col(group_col) == k, v) if t is None else t.when(F.col(group_col) == k, v)
    t = F.lit(0) if t is None else t.otherwise(0)
    with_t = budget.withColumn("__target", t.cast("long"))
    c = (
        with_t.filter((F.col("__target") > 0) & (F.col("n_tokens") > 0))
        .select(F.min(F.expr("(n_tokens * 1000) div __target")).alias("__c"))
    )
    return (
        with_t.crossJoin(F.broadcast(c))
        .withColumn(
            "rate_permille",
            F.when(
                (F.col("__target") == 0) | (F.col("n_tokens") == 0), F.lit(0).cast("long")
            ).otherwise(F.expr("(__target * __c) div n_tokens")),
        )
        .select(group_col, "n_tokens", "rate_permille")
    )
