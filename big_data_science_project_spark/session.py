"""SparkSession factory tuned for the engine.

The reference creates ad-hoc sessions per entry point
(``/root/reference/main.py:13-15``, ``feature extraction.py:102-105``).
Here one factory pins the settings every operator relies on:

- AQE on (runtime coalesce, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage.
- Arrow on — every Python-side kernel is an Arrow-batched pandas UDF, never
  a pickled row loop like the reference's ``df.rdd.map`` path.
- UTC session timezone — parquet timestamps compare identically across
  engines (DuckDB oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "big_data_science_project_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned local session.

    ``shuffle_partitions`` defaults to the core count: on local[N] there is
    no network shuffle, so partitions ≈ cores minimizes task overhead; on a
    real cluster this would be sized to keep post-shuffle partitions in the
    100-200 MB range (AQE coalesces down when the default is too high).
    """
    n = cpus or default_cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long and convert in the loader (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # tz-less parquet timestamps (timestamp[us]) must stay instants
        # (TIMESTAMP, UTC session) — NTZ would break unix_micros/watermarks
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
