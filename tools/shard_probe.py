"""Measure the shard-shuffle writer's scale claims (curate_shard_shuffle /
shard_writer): ONE hash exchange, hash-uniform shard balance, and intact
within-shard order — at sf0.1 and at the standard 10× replica
(tools/scale_probe.build_scaled). Writer wall should scale ~linearly in
rows (the permutation shuffle is the job's floor); balance (max/min docs
per shard) should stay tight at 10× because the shard key is a hash of
the row key, not of any skewed attribute; and every shard file must be
okey-sorted (the unstable-partitionBy-sort pitfall pinned by
tests/test_curation.py, re-verified here at both scales on disk).

Usage: python tools/shard_probe.py [--rep 10] [--out SHARD_SCALE.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def probe(spark, sf_dir: str, label: str, n_reps: int = 3) -> dict:
    import pyarrow.parquet as pq

    from big_data_science_project_spark.operators.curation import (
        shard_writer)

    n_rows = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    walls = []
    out = None
    for _ in range(n_reps):
        if out:
            # remove the whole mkdtemp parent, not just the 'shards'
            # subdir — otherwise each rep leaks one empty temp dir
            shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        out = os.path.join(tempfile.mkdtemp(prefix="shard_probe_"), "shards")
        t0 = time.time()
        shard_writer(spark, sf_dir).write.partitionBy("shard").parquet(out)
        walls.append(time.time() - t0)

    # layout + order verification on the final write
    per_shard = {}
    disorder = 0
    for d in sorted(glob.glob(f"{out}/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        files = glob.glob(f"{d}/*.parquet")
        okeys = []
        for f in files:
            okeys.extend(pq.read_table(f, columns=["okey"])["okey"]
                         .to_pylist())
        per_shard[shard] = len(okeys)
        if len(files) != 1 or okeys != sorted(okeys):
            disorder += 1
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)

    counts = sorted(per_shard.values())
    return {"label": label, "rows": n_rows,
            "writer_sec": round(min(walls), 3),
            "n_shards": len(per_shard),
            "docs_min": counts[0], "docs_max": counts[-1],
            "balance_ratio": round(counts[-1] / counts[0], 3),
            "disordered_or_multifile_shards": disorder}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--out", default="SHARD_SCALE.json")
    args = ap.parse_args()

    from tools.scale_probe import build_scaled

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    r1 = probe(spark, SRC, "sf0.1")
    big = tempfile.mkdtemp(prefix="shard_scaled_")
    build_scaled(big, args.rep)
    r2 = probe(spark, big, f"sf0.1 x{args.rep}")
    shutil.rmtree(big, ignore_errors=True)

    report = {"scales": [r1, r2],
              "rows_ratio": round(r2["rows"] / r1["rows"], 2),
              "writer_wall_ratio": round(
                  r2["writer_sec"] / r1["writer_sec"], 2)}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
