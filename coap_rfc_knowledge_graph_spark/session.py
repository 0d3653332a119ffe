"""SparkSession factory tuned for the KG-construction workload.

Local mode stands in for a multi-executor cluster; every setting below is
what we would ship in spark-defaults on a 1000-executor cluster reading
100 TB, with the two knobs that must scale with cluster size
(shuffle.partitions, maxRecordsPerBatch) parameterized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "kg-construct",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession.

    - AQE on: runtime coalescing of shuffle partitions, skew-join
      splitting for the head-entity link join (SURVEY §2.4 N4).
    - Arrow on: every model stage is an Arrow-batched pandas UDF; batch
      size 2048 keeps per-batch model latency amortized without blowing
      executor memory at 512-token sequences.
    - shuffle.partitions defaults to 2x cores locally; on a real cluster
      set it to 2-4x total executor cores (AQE coalesces the excess).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
