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
    # add/excise/re-add run per rep; since r13 every trigger ALSO
    # maintains the signed LM ledger — r13 priced that at ~1.6x of the
    # r12 wall; the r14 optimization round reclaimed it by overlapping
    # each trigger's independent actions from a driver thread pool and
    # parsing the bloom gate's bitmap literal in one Py4J call, solo
    # 11.4 -> 6.6 s at sf0.1 with the ledger/restart identities and
    # the report checksum unchanged) and the audio batch-vs-index gate
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

    # HOST-CALIBRATION CANARIES (r11 verdict item 5; second canary +
    # adjusted table r12 items 5-6): solo min-of-5 of one fixed query
    # per runtime class, taken immediately before the suite on the same
    # session. r11's totals carried a uniform ~1.28× host-level
    # slowdown that needed a judge rerun to adjudicate; with the
    # canaries recorded alongside the totals, a uniform shift is
    # self-diagnosing. Two classes because they drift independently on
    # this VM:
    #   host_canary_sec     q01 — scan+agg, whole-stage codegen, no
    #                       Python: the pure-JVM class.
    #   host_canary_py_sec  ml_gram_matrix — Arrow batch transfer +
    #                       pandas kernel: the Python-worker class,
    #                       whose suite-context swings (documented up
    #                       to 25× on this VM) the JVM canary cannot
    #                       see.
    # adjusted_queries below divides each wall by its class's
    # (host canary / CANARY_REF) so round-over-round comparison is
    # mechanical; CANARY_REF values are the first recorded canaries
    # (BASELINE.md's normalization note).
    def solo_canary(name: str) -> float:
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            checksum_count(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    CANARY_REF = {"jvm": 1.299,   # BENCH_r12 host_canary_sec
                  "py": 0.435}    # BENCH_r13 host_canary_py_sec —
    # pinned after its first recording (ADVICE r13: a hardcoded None
    # made ref_py = canary_py on EVERY run, so the py normalization
    # would have stayed a permanent no-op); from r14 on, py-class
    # walls divide by (this run's py canary / 0.435)
    canary = solo_canary("q01_pricing_summary")
    canary_py = solo_canary("ml_gram_matrix")
    print(f"# host_canary q01 solo min-of-5: {canary:.3f}s; "
          f"ml_gram_matrix solo min-of-5: {canary_py:.3f}s",
          file=sys.stderr)

    # queries whose wall is dominated by Arrow/pandas workers — scaled
    # by the py canary in adjusted_queries; everything else by the JVM
    # canary (streaming loops and mixed plans are mostly JVM-side)
    PY_CLASS = {"ml_gram_matrix", "ml_kmeans_lloyd",
                "ann_bruteforce_topk", "ann_ivf_topk",
                "ann_incremental_assign", "cells_outlier_filter",
                "multimodal_features", "multimodal_audio_ingest_gate"}

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
    # canary-normalized walls (r12 verdict item 6): divide each query
    # by its runtime class's host drift factor. The py ref self-anchors
    # on this run if BASELINE.md hasn't recorded one yet.
    ref_py = CANARY_REF["py"] or canary_py
    adj = {
        name: round(t / ((canary_py / ref_py) if name in PY_CLASS
                         else (canary / CANARY_REF["jvm"])), 3)
        for name, t in times.items()}
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "adjusted_queries": adj,
        "adjusted_total": round(sum(adj.values()), 3),
        "host_canary_sec": canary,
        "host_canary_py_sec": canary_py,
        "canary_ref": {"jvm": CANARY_REF["jvm"], "py": ref_py},
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
