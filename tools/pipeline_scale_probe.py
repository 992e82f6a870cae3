"""Composed end-to-end pipeline rehearsal at scale (r13 verdict item 7).

Every scale claim so far is piecewise (SHARD_SCALE, EXCISE_BENCH,
STRAGGLER, MULTIMODAL_SCALE, BENCH_sf{1,3,10}); this probe runs the
shape a 100 TB operator actually runs — ONE flow over the same corpus,
stage after stage, with the live loop and a mid-stream takedown burst
in it — and reports per-stage walls at two rungs so any cross-stage
superlinearity (artifact reuse breaking down, a stage's output
layout poisoning the next stage's plan) shows up as a ratio, not a
vibe:

    live_ingest_excise   stream_ingest_excise_loop, excise_splits=2 —
                         live admission with a 2-slice takedown BURST
                         between the add batches (generation rewrites,
                         bloom rebuilds, LM ledger folds all pay)
    batch_ingest_gate    ingest_gate_pipeline — the four-gate nightly
                         admission (exact/near/LM/ANN) vs persisted
                         artifacts
    dedup                dedup_incremental_persisted — near-dedup of
                         the new batch vs the persisted index
    curate               curate_pipeline — composed quality curation
    pack                 curate_pack_sequences — training-sequence
                         packing of the curated corpus

Rungs replicate the sf0.1 documents/embeddings fixtures with
tools/scale_probe.py's key-shift + per-copy content-perturbation
builder (join fan-outs and content-bucket sizes stay constant, exactly
like a genuinely bigger corpus — see that module's docstring), at
x10 ("sf1") and x100 ("sf10"). Walls are min-of-2 checksum_count
actions (first rep pays the write-once artifact builds; min takes the
warm path, matching the production amortization). A per-rung host
canary (text_token_stats solo min-of-3 — JVM scan+agg over the same
table family) makes cross-rung ratios self-calibrating on this VM.

Linear bound: per stage, ratio_x100_vs_x10 = wall_x100 /
(10 * wall_x10), canary-adjusted. Ratios <= ~1 mean the composed flow
is volume-linear end to end.

Usage: python tools/pipeline_scale_probe.py [--out PIPELINE_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STAGES = ("live_ingest_excise", "batch_ingest_gate", "dedup",
          "curate", "pack")


def _build_rung(rep: int) -> str:
    """Replicated documents+embeddings only — the pipeline's tables;
    dims copied verbatim so load_table finds a complete directory."""
    import duckdb

    from scale_probe import SRC, _perturb

    dst = tempfile.mkdtemp(prefix=f"pipeline_sf_x{rep}_")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    for t, key, stride in (("documents", "doc_id", 1_000_000),
                           ("embeddings", "vec_id", 1_000_000)):
        parts = []
        for i in range(rep):
            exprs = [f"{key} + {i * stride} AS {key}"]
            cols = {key}
            pert = _perturb(t, i)
            if pert is not None:
                cols.add(pert.rsplit(" AS ", 1)[1])
                exprs.append(pert)
            exprs.append(f"* EXCLUDE ({', '.join(sorted(cols))})")
            parts.append(f"SELECT {', '.join(exprs)} FROM "
                         f"read_parquet('{SRC}/{t}.parquet')")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                    f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return dst


def _run_rung(spark, queries, sf_dir: str) -> dict:
    from big_data_science_project_spark.functions.actions import (
        checksum_count)

    def solo(name: str, reps: int) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            checksum_count(queries[name](spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    canary = solo("text_token_stats", 3)
    walls = {}
    for stage, name, kwargs in (
            ("live_ingest_excise", "stream_ingest_excise_loop",
             {"excise_splits": 2}),
            ("batch_ingest_gate", "ingest_gate_pipeline", {}),
            ("dedup", "dedup_incremental_persisted", {}),
            ("curate", "curate_pipeline", {}),
            ("pack", "curate_pack_sequences", {})):
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.monotonic()
            n, _c = checksum_count(queries[name](spark, sf_dir, **kwargs))
            best = min(best, time.monotonic() - t0)
            rows = n
        walls[stage] = {"sec": round(best, 3), "rows": rows,
                        "query": name, **kwargs}
        print(f"  {stage}: {walls[stage]}", file=sys.stderr, flush=True)
    return {"host_canary_sec": canary, "stages": walls,
            "total_sec": round(sum(w["sec"] for w in walls.values()), 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PIPELINE_SCALE.json")
    ap.add_argument("--reps", default="10,100",
                    help="replication factors for the two rungs")
    args = ap.parse_args()
    lo, hi = (int(r) for r in args.reps.split(","))

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .appName("pipeline-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    queries = entry.queries()
    # the live loop needs its excise_splits knob — bypass plan_cached
    # by calling the raw streaming function for that stage
    from big_data_science_project_spark.streaming.events import (
        stream_ingest_excise_loop)
    queries = dict(queries)
    queries["stream_ingest_excise_loop"] = \
        lambda s, d, **kw: stream_ingest_excise_loop(s, d, **kw)

    report = {"stages": list(STAGES), "reps": [lo, hi]}
    rungs = {}
    for rep in (lo, hi):
        d = _build_rung(rep)
        print(f"rung x{rep} at {d}", file=sys.stderr, flush=True)
        try:
            rungs[f"x{rep}"] = _run_rung(spark, queries, d)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    report["rungs"] = rungs

    c_lo = rungs[f"x{lo}"]["host_canary_sec"]
    c_hi = rungs[f"x{hi}"]["host_canary_sec"]
    # the canary itself scans a rep-scaled table — normalize per ROW:
    # drift = (canary_hi / hi) / (canary_lo / lo)
    drift = (c_hi / hi) / (c_lo / lo) if c_lo else 1.0
    report["canary_row_drift"] = round(drift, 3)
    ratios = {}
    for stage in STAGES:
        w_lo = rungs[f"x{lo}"]["stages"][stage]["sec"]
        w_hi = rungs[f"x{hi}"]["stages"][stage]["sec"]
        ratios[stage] = round(w_hi / (w_lo * (hi / lo) * drift), 3)
    report["linear_ratio_adjusted"] = ratios
    report["note"] = (
        "linear_ratio_adjusted = wall_x%d / (%dx wall_x%d, canary-"
        "adjusted); <= ~1 means the composed flow is volume-linear. "
        "Stage walls are min-of-2 warm (write-once artifacts amortized "
        "as in production)." % (hi, hi // lo, lo))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
