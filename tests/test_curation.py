"""Curation-operator goldens that go beyond the oracle-parity replay:
the shard-shuffle WRITE path (curate_shard_shuffle audits an
assignment; this executes it) — plan shape, on-disk shard layout, and
within-shard order."""

from __future__ import annotations

import re

import pytest

from big_data_science_project_spark.operators.curation import (
    N_SHARDS, curate_shard_shuffle, shard_writer)
from big_data_science_project_spark.plans.inspect import (
    formatted_plan, shuffle_exchange_count)

SF = "/root/testdata/sf0.001"


def test_shard_writer_single_exchange_local_sort(spark):
    """SCALING.md's claim made mechanical: the epoch permutation costs
    exactly ONE shuffle exchange, and the order-key sort is local
    (global=false) — no corpus-sampling range partitioner."""
    w = shard_writer(spark, SF)
    plan = formatted_plan(w)
    assert shuffle_exchange_count(w) == 1, plan
    # the Sort node's detail prints "Arguments: [keys], <global>, 0"
    assert re.search(r"Arguments: \[shard#\d+L ASC NULLS FIRST, "
                     r"okey#\d+L ASC NULLS FIRST\], false, 0",
                     plan), plan
    assert "], true, 0" not in plan, plan


def test_shard_writer_layout_and_order(spark, tmp_path):
    """Execute the write: one parquet file per shard, shard populations
    equal to the audit query's, and every shard internally ordered by
    the deterministic order key."""
    out = str(tmp_path / "shards")
    shard_writer(spark, SF).write.partitionBy("shard").parquet(out)

    back = spark.read.parquet(out)
    audit = {r["shard"]: r["n_docs"]
             for r in curate_shard_shuffle(spark, SF).collect()}
    from pyspark.sql import functions as F
    got = {r["shard"]: r["n"]
           for r in back.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == audit

    # one data file per shard (each shard hashes wholly into one task)
    import glob
    for shard in audit:
        files = glob.glob(f"{out}/shard={shard}/*.parquet")
        assert len(files) == 1, (shard, files)

    # within-shard order: parquet preserves row order per file
    import pyarrow.parquet as pq
    for shard in audit:
        [f] = glob.glob(f"{out}/shard={shard}/*.parquet")
        okeys = pq.read_table(f, columns=["okey"])["okey"].to_pylist()
        assert okeys == sorted(okeys), f"shard {shard} not okey-sorted"
