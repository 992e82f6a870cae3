"""Streaming semantics under REAL multi-micro-batch execution: the
registry's availableNow queries consume the fixture in one batch, so
this splits events into several files and forces one file per trigger —
verifying the stateful aggregation accumulates across batches to the
exact batch-mode result (the online-Welford property the reference's
add_sample intended, outlier_detection.py:15-25)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_science_project_spark.functions.numeric import dsum
from big_data_science_project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events_dir(spark):
    d = tempfile.mkdtemp(prefix="events_split_")
    ev = load_table(spark, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_files >= 3, "need multiple files to get multiple micro-batches"
    return d


def test_stateful_agg_across_micro_batches(spark, split_events_dir):
    schema = spark.read.parquet(split_events_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(split_events_dir))
    agg = (stream.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.avg("value"), 6).alias("mean_value"),
                F.round(F.stddev_samp("value"), 6).alias("stddev_value")))
    q = (agg.writeStream.format("memory").queryName("inc_welford")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected multiple micro-batches, got {n_batches}"

    got = {r["event_type"]: (r["n"], r["mean_value"], r["stddev_value"])
           for r in spark.table("inc_welford").collect()}
    batch = {r["event_type"]: (r["n"], r["mean_value"], r["stddev_value"])
             for r in spark.read.parquet(split_events_dir)
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.avg("value"), 6).alias("mean_value"),
                  F.round(F.stddev_samp("value"), 6).alias("stddev_value"))
             .collect()}
    assert got == batch


def test_custom_stateful_operator_accumulates(spark):
    """applyInPandasWithState: per-user stats must build up over multiple
    micro-batches — some user must emit several cumulative rows, and the
    final rows must equal the batch aggregate (the registry oracle)."""
    from big_data_science_project_spark.streaming.events import (
        stream_user_stats_stateful)

    final = stream_user_stats_stateful(spark, SF)
    got = {r["user_id"]: (r["n"], r["mean_value"]) for r in final.collect()}

    batch = {r["user_id"]: (r["n"], r["mean_value"])
             for r in load_table(spark, SF, "events")
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum(F.col("value").cast("decimal(28,2)"))
                          .cast("double") / F.count(F.lit(1)), 6)
                  .alias("mean_value"))
             .collect()}
    assert got == batch

    # cross-batch emission: the operator's memory sink (stable name) must
    # hold more rows than users (cumulative updates from several batches)
    n_updates = spark.table("stream_result_user_stats_stateful").count()
    assert n_updates > len(got), (n_updates, len(got))


def test_windowed_append_respects_watermark(spark, split_events_dir):
    """Append mode only emits windows the watermark has closed — after
    availableNow drains everything, all-but-the-latest windows are out."""
    schema = spark.read.parquet(split_events_dir).schema
    # the split copy was written from the loader's output, so ts is already
    # a micros timestamp (no nanosAsLong step on re-read)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(split_events_dir))
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("memory").queryName("inc_windows")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    emitted = spark.table("inc_windows").count()
    total_windows = (spark.read.parquet(split_events_dir)
                     .select(F.date_trunc("hour", "ts")).distinct().count())
    # final watermark closes every window except those within 1h of max ts
    assert 0 < emitted < total_windows
