"""Table layout discipline: bucketed url-keyed tables, Iceberg-shaped.

Production target (north rule) is Iceberg: ``pages`` partitioned by
``bucket(url, B) + days(warc_ts)``, every derived table bucketed on its
join key, written with ``df.writeTo(cat.db.tbl)``. Iceberg jars are not
in this container, so this module implements the same layout discipline
on Spark's native bucketed managed tables — which deliver the actual
scale property the layout exists for: **two tables bucketed on the same
key join WITHOUT a shuffle** (SortMergeJoin with no Exchange on either
side; pinned by tests/test_bucketing.py). Swap point: replace
``save_bucketed`` internals with ``writeTo(...).partitionedBy(bucket(B,
key)).createOrReplace()`` when an Iceberg catalog is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 16,
    key: str = "url",
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed managed table (overwrite)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], hint: str | None = None
) -> DataFrame:
    """Join two same-key bucketed tables — the planner uses the bucketing:
    no ShuffleExchange on either side (the co-located join the
    url-bucketed layout buys at 10^12 rows). With a genuinely small side
    the planner still prefers broadcast (also shuffle-free); pass
    ``hint='merge'`` to force the sort-merge shape both-sides-big data
    would get."""
    left = spark.table(left_table)
    if hint:
        left = left.hint(hint)
    return left.join(spark.table(right_table), on=on)
