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
canary (q01_pricing_summary solo min-of-3 — JVM scan+agg over
lineitem, which is copied VERBATIM per rung so the canary's work is
rung-independent) makes cross-rung ratios self-calibrating on this VM.

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
        # small row groups: Spark cannot split a parquet file finer
        # than its row groups, and DuckDB's default (~122k rows) would
        # leave the x100 documents file with ~5 splittable units —
        # starving the 32-core scan stages however small
        # files.maxPartitionBytes is set (a real corpus has thousands
        # of files; this keeps the single-file fixture comparable)
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                    f"'{dst}/{t}.parquet' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE 8192)")
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

    # host canary: q01 scans lineitem, which _build_rung copies
    # VERBATIM (only documents/embeddings replicate), so the canary's
    # work is IDENTICAL at every rung — a pure host-state probe. The
    # first cut used text_token_stats, which scans the rep-scaled
    # documents table: at these sizes its wall is overhead-dominated
    # (0.61 s at x10 vs 0.45 s at x100 for 10x the rows), so the
    # per-row drift formula divided by ~13x and inflated every ratio.
    canary = solo("q01_pricing_summary", 3)
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
             # the replicated rungs are ONE parquet file per table (the
             # DuckDB COPY layout): at x100 the 500 MB documents file
             # yields only ~4-7 default 128 MB input splits, starving
             # the 32-core host on the Python-heavy scan stages — a
             # fixture-layout artifact a real cluster (thousands of
             # files) never sees. 16 MB splits restore scan
             # parallelism, exactly the files.maxPartitionBytes sizing
             # SCALING.md prescribes for partition-starved scans.
             .config("spark.sql.files.maxPartitionBytes",
                     str(16 * 1024 * 1024))
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
    import big_data_science_project_spark.operators.similarity as SIM
    k0 = SIM.N_CENTROIDS
    for rep in (lo, hi):
        d = _build_rung(rep)
        # production IVF sizing (similarity.py's own honest-growth
        # note: "the fixture's K = 8 is an oracle-friendly constant,
        # not a scale claim — production sizes K with the corpus, the
        # standard ~sqrt(N) rule"): apply that rule per rung so the
        # gate's ANN tier measures the DESIGN, not the fixture
        # constant. Index = 80% of 2000*rep embeddings.
        n_index = int(0.8 * 2000 * rep)
        SIM.N_CENTROIDS = max(k0, int(n_index ** 0.5))
        print(f"rung x{rep} at {d} (ann K={SIM.N_CENTROIDS})",
              file=sys.stderr, flush=True)
        try:
            rungs[f"x{rep}"] = _run_rung(spark, queries, d)
        finally:
            SIM.N_CENTROIDS = k0
            shutil.rmtree(d, ignore_errors=True)
    report["rungs"] = rungs
    report["ann_k_note"] = (
        "N_CENTROIDS set to sqrt(index vectors) per rung "
        "(similarity.py's documented production-IVF sizing); the "
        "fixture batch also GROWS with the corpus (20%% of it), unlike "
        "a production takedown/daily batch, so gate-stage ratios carry "
        "that batch-growth factor on top of per-item cost.")

    c_lo = rungs[f"x{lo}"]["host_canary_sec"]
    c_hi = rungs[f"x{hi}"]["host_canary_sec"]
    # the canary's work is rung-independent (verbatim lineitem), so
    # host drift between the two rung windows is the plain ratio
    drift = (c_hi / c_lo) if c_lo else 1.0
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
