"""SparkSession factory.

Pins the session configuration the whole engine assumes:
- UTC session timezone (the reference stores naive-UTC ``utcnow()``
  timestamps, SURVEY.md §2.8 F5; parity with the DuckDB oracle requires a
  fixed zone).
- AQE on (runtime shuffle-partition coalescing, skew-join handling) — the
  scale posture for 100 TB runs.
- Arrow on for any pandas interchange (multimodal stubs, ``toPandas``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tmdb-sync-spark", *, cpus: str | None = None,
              shuffle_partitions: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    # getOrCreate on a pre-existing session ignores every builder
    # .config(); enforce ALL the runtime-settable SQL confs the engine's
    # documented posture assumes (not just the timezone — review finding:
    # a pre-built session with Arrow off would silently run every
    # mapInPandas stage through row-pickling). JVM-launch settings
    # (master, driver memory, UI) cannot be changed post-hoc and are
    # honestly the caller's.
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.shuffle.partitions", shuffle_partitions),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.parquet.aggregatePushdown", "true"),
    ):
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark
