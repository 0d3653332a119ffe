"""Distributed total-order ranking (zipWithIndex semantics) in pure
DataFrame ops — the shared scale-path replacement for a global
``Window.orderBy(...)`` (a single-task sort).

Shape: range-partition on the order keys -> per-partition row_number
(parallel window — partitionBy prevents the global sort) -> broadcast
per-partition cumulative offsets. No DF->RDD round-trip (which would
eagerly execute under AQE), no single-task stage.

The pid-stamped frame is localCheckpoint-ed: the offsets side and the
row_number side must see the SAME physical partitioning (a re-evaluated
range exchange may re-sample split points); a plain persist could
silently recompute through a NEW exchange on executor loss, corrupting
the rank — the truncated-lineage checkpoint fails loudly instead.

Used by ``operators.linking.embedded_surfaces`` (N1 first-seen index)
and ``operators.rules.value_dictionary`` (N7 non-float value ids —
VERDICT r2 item 3: the distinct-behaviour-string set grows with the
corpus, so the previous dictionary-sized global window was a
single-task sort on the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_with_rank(df: DataFrame, order_cols: list[str], idx_col: str = "idx") -> DataFrame:
    """Add ``idx_col``: the 0-based rank of each row under the total
    lexicographic order of ``order_cols`` (which must be a unique key —
    ties would make the rank nondeterministic across partitionings)."""
    spark = df.sparkSession
    # defaultParallelism, NOT df.rdd.getNumPartitions(): under AQE the
    # .rdd access eagerly executes the upstream query stages
    n_parts = spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n_parts, *order_cols)
    part = ordered.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=False)
    in_part = Window.partitionBy("__pid").orderBy(*order_cols)
    local = part.withColumn("__local", F.row_number().over(in_part) - 1)
    counts = part.groupBy("__pid").count()
    off_w = (
        Window.orderBy("__pid")  # tiny: one row per partition
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("count").over(off_w), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), on="__pid")
        .withColumn(idx_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def two_level_topk(df: DataFrame, order_by: list, k: int) -> DataFrame:
    """Global top-k under ``order_by`` (a list of Column sort
    expressions forming a deterministic total order) WITHOUT a global
    sort: level 1 takes the top k per partition in parallel (every
    global top-k row is necessarily in its own partition's top k, so no
    candidate is lost); level 2 re-ranks the <= k * n_partitions
    survivors — bounded by construction, the only single-task step.
    Exactly equal to the naive ``Window.orderBy`` form, including
    tie-breaks. Shared by ``corpus_lm.prune_top_bigrams`` and
    ``data_selection.dsir_resample``."""
    per_part = Window.partitionBy("__pid").orderBy(*order_by)
    candidates = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__r", F.row_number().over(per_part))
        .filter(F.col("__r") <= k)
        .drop("__pid", "__r")
    )
    final = Window.orderBy(*order_by)
    return (
        candidates.withColumn("__r", F.row_number().over(final))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def two_level_topk_per_key(
    df: DataFrame, key_cols: list[str], order_by: list, k: int, rank_col: str | None = None
) -> DataFrame:
    """Top-k PER KEY under ``order_by`` without funneling a head key
    through one task: a plain ``Window.partitionBy(key)`` sorts ALL of
    a key's rows in one task, which at crawl scale means the biggest
    host owns the longest task (the same head-skew class the salted
    top-1 in ``operators.linking`` exists for). Level 1 ranks within
    (key, physical input partition) — a head key's rows stay spread
    over however many partitions they arrived in — and keeps k per
    cell; level 2 re-ranks the <= k * n_partitions survivors per key,
    bounded by construction. Exactly equal to the naive per-key window,
    tie-breaks included (``order_by`` must be a deterministic total
    order within each key). Pass ``rank_col`` to keep the 1-based
    within-key rank on the output."""
    per_cell = Window.partitionBy(*key_cols, "__pid").orderBy(*order_by)
    candidates = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__r", F.row_number().over(per_cell))
        .filter(F.col("__r") <= k)
        .drop("__pid", "__r")
    )
    final = Window.partitionBy(*key_cols).orderBy(*order_by)
    out = candidates.withColumn("__r", F.row_number().over(final)).filter(F.col("__r") <= k)
    return out.withColumnRenamed("__r", rank_col) if rank_col else out.drop("__r")


def zip_with_rank_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str], idx_col: str = "idx"
) -> DataFrame:
    """Add ``idx_col``: the 0-based rank of each row WITHIN its key
    under ``order_cols`` — without a per-key window (which sorts a
    head key in one task). Shape: one global :func:`zip_with_rank`
    over (key, order) — range-partitioned, no single-task stage — then
    subtract each key's minimum global rank (a key-sized aggregate).
    (key_cols + order_cols) must be a unique row key, same as
    :func:`zip_with_rank`'s determinism requirement."""
    ranked = zip_with_rank(df, [*key_cols, *order_cols], idx_col="__g")
    offsets = ranked.groupBy(*key_cols).agg(F.min("__g").alias("__o"))
    return (
        ranked.join(offsets, on=key_cols)
        .withColumn(idx_col, (F.col("__g") - F.col("__o")).cast("long"))
        .drop("__g", "__o")
    )


def zip_with_cumsum(
    df: DataFrame, order_cols: list[str], value_col: str, out_col: str = "cum"
) -> DataFrame:
    """Add ``out_col``: the EXCLUSIVE prefix sum of ``value_col`` under
    the total lexicographic order of ``order_cols`` — the same two-stage
    shape as :func:`zip_with_rank` (parallel per-partition window +
    broadcast per-partition offsets), so no single-task global sort at
    any size. Used by ``operators.pretrain.pack_sequences`` (global
    token offsets for concat-and-chunk packing)."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n_parts, *order_cols)
    part = ordered.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=False)
    in_part = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("__local", F.coalesce(F.sum(value_col).over(in_part), F.lit(0)))
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(off_w), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), on="__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__pid", "__local", "__off")
    )
