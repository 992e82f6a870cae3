"""Measure the excision lifecycle's cost claim (r10): applying a
takedown set to the persisted artifacts (operators/excision.py —
decrement/delete/recount) must be MUCH cheaper than rebuilding the
artifacts from the surviving corpus, at sf0.1 and at a 10× replica
(tools/scale_probe.build_scaled — key-shifted, content-perturbed).

What's timed, per scale:
  excise   excised_artifacts() with the SOURCE artifacts pre-built
           outside the timer (production has them persisted; the
           excision job starts from them) and the excised cache
           cleared per rep — i.e. the decrement/delete work itself.
           Since r11 the vocabulary DECREMENTS through the persisted
           wdoc table (no affected-language survivor rescan); the one
           remaining honest corpus-scale part is the survivor scan
           re-deriving the provenance-free digests artifact
           (production stores (doc_id, dg) pairs and avoids it too —
           operators/excision.py module docstring).
  retrain  rebuilding all three artifact families (dedup index, LM
           tables, ANN index) with their write-once caches cleared —
           the from-scratch alternative a pipeline without the
           excision operators would run. Timed on the FULL corpus,
           which overstates the survivor retrain by ≤ ~3% (the
           excision set is ~3% of index docs) — noted, and in the
           conservative direction for the ratio's denominator? No:
           full-corpus retrain is SLIGHTLY SLOWER than survivor
           retrain, so the reported ratio flatters excise by ≤ ~3%;
           the measured gap is ~an order of magnitude, far past that.

Usage: python tools/excise_probe.py [--rep 10] [--out EXCISE_BENCH.json]
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

_ART_CACHES = ("_bdsp_dedup_index", "_bdsp_lm_artifacts",
               "_bdsp_ann_index", "_bdsp_excised")


def _clear(spark, sf_dir: str, attrs) -> None:
    for a in attrs:
        cache = getattr(spark, a, None)
        if cache is not None:
            old_root = cache.pop(sf_dir, None)
            if old_root:  # each rep rebuilds into a fresh tempdir —
                # reclaim the superseded tree or 3 reps × 2 scales of
                # multi-GB artifact copies pile up under /tmp
                shutil.rmtree(old_root, ignore_errors=True)


def _build_sources(spark, sf_dir: str) -> None:
    from big_data_science_project_spark.operators.dedup import (
        _index_artifacts)
    from big_data_science_project_spark.operators.similarity import (
        ann_artifacts)
    from big_data_science_project_spark.operators.text import lm_artifacts

    _index_artifacts(spark, sf_dir)
    lm_artifacts(spark, sf_dir)
    ann_artifacts(spark, sf_dir)


def time_excise(spark, sf_dir: str, reps: int = 3) -> float:
    from big_data_science_project_spark.operators.excision import (
        excised_artifacts)

    _build_sources(spark, sf_dir)  # production starting state, untimed
    best = None
    for _ in range(reps):
        _clear(spark, sf_dir, ("_bdsp_excised",))
        t0 = time.perf_counter()
        excised_artifacts(spark, sf_dir)
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


def time_retrain(spark, sf_dir: str, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        _clear(spark, sf_dir, _ART_CACHES[:3])
        t0 = time.perf_counter()
        _build_sources(spark, sf_dir)
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


BURST_K = 4  # takedown batches in the burst rung


def _host_canary(spark, reps: int = 5) -> float:
    """Solo min-of-N of the bench's fixed pure-JVM canary query (q01 at
    sf0.1, checksum action — the bench.py idiom) taken immediately
    before a rung's timings on the same session. The r12 artifact's
    cross-scale absolute walls inverted (the 10× rung ran second on a
    warmer session) and needed a disclosure note; with each rung
    stamped, its walls carry their own calibration: divide a rung's
    seconds by (its canary / another rung's canary) before comparing
    across rungs or rounds."""
    import time

    from big_data_science_project_spark.functions.actions import (
        checksum_count)
    import __spark_entry__ as entry
    from tools.scale_probe import SRC

    q01 = entry.queries()["q01_pricing_summary"]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum_count(q01(spark, SRC))
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def time_burst(spark, sf_dir: str, k: int, reps: int = 2) -> float:
    """Wall of the full streaming lifecycle with the takedown set
    staged as ``k`` sequential trigger batches — each pays its own
    generation rewrite + index-digest-sized bloom rebuild. k=1 is the
    batched-within-a-trigger-window alternative. The base digest table
    is pre-built untimed (persisted production state)."""
    from big_data_science_project_spark.operators.dedup import (
        bucketed_digest_table)
    from big_data_science_project_spark.streaming.events import (
        stream_ingest_excise_loop)

    bucketed_digest_table(spark, sf_dir)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        stream_ingest_excise_loop(spark, sf_dir,
                                  excise_splits=k).collect()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--out", default="EXCISE_BENCH.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tools.scale_probe import SRC, build_scaled

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate())

    dst = tempfile.mkdtemp(prefix=f"exciseprobe_x{args.rep}_")
    print(f"building {args.rep}x corpus at {dst}", file=sys.stderr)
    build_scaled(dst, args.rep)

    result = {"rep": args.rep, "src": SRC, "scales": {}}
    for label, d in (("sf01", SRC), (f"x{args.rep}", dst)):
        print(f"timing {label}", file=sys.stderr, flush=True)
        cal = _host_canary(spark)
        ex = time_excise(spark, d)
        rt = time_retrain(spark, d)
        result["scales"][label] = {
            "excise_sec": ex, "retrain_sec": rt,
            "excise_over_retrain": round(ex / rt, 3) if rt else None,
            "host_canary_sec": cal}
        print(f"  excise {ex}s retrain {rt}s (canary {cal}s)",
              file=sys.stderr)
    # takedown-burst rung (r11 verdict item 7): K sequential takedown
    # batches through the REAL streaming loop vs the same set batched
    # into one trigger — prices the per-burst bloom-rebuild
    # amortization of the rebuild-only policy
    result["takedown_burst"] = {}
    for label, d in (("sf01", SRC), (f"x{args.rep}", dst)):
        print(f"burst timing {label}", file=sys.stderr, flush=True)
        cal = _host_canary(spark)
        t1 = time_burst(spark, d, 1)
        tk = time_burst(spark, d, BURST_K)
        result["takedown_burst"][label] = {
            "k": BURST_K,
            "batched_sec": t1,
            "sequential_sec": tk,
            "marginal_per_takedown_batch_sec":
                round((tk - t1) / (BURST_K - 1), 3),
            "sequential_over_batched": round(tk / t1, 3) if t1 else None,
            "host_canary_sec": cal}
        print(f"  batched(K=1) {t1}s sequential(K={BURST_K}) {tk}s "
              f"(canary {cal}s)", file=sys.stderr)
    result["burst_interpretation"] = (
        f"sequential = the takedown set split into K={BURST_K} "
        "separate triggers, each paying one generation rewrite + one "
        "index-digest-sized bloom rebuild; batched = one trigger, one "
        "rebuild (the ledger is split-invariant, test-pinned). "
        "marginal_per_takedown_batch_sec is the per-extra-batch price "
        "of the rebuild-only policy; if sequential_over_batched grows "
        "with scale, batch takedowns within a trigger window. Each "
        "rung carries host_canary_sec (fixed q01-at-sf0.1 solo "
        "min-of-5 taken just before its timings): divide a rung's "
        "walls by (its canary / the other rung's canary) before "
        "comparing absolute seconds across rungs — the rungs run "
        "sequentially on one session and the later one is warmer.")
    e1 = result["scales"]["sf01"]
    e2 = result["scales"][f"x{args.rep}"]
    result["excise_scale_ratio"] = (
        round(e2["excise_sec"] / e1["excise_sec"], 2)
        if e1["excise_sec"] else None)
    result["interpretation"] = (
        "excise = decrement/delete from persisted artifacts (sources "
        "pre-built, untimed; vocabulary decrements through the wdoc "
        "table since r11 — no affected-language rescan); retrain = "
        "rebuilding all three artifact families from the corpus "
        "(full-corpus, which overstates a survivor retrain by <= ~3%). "
        "The lifecycle claim is excise_over_retrain well under 1 at "
        "both scales, with excise_scale_ratio far below the data "
        "growth factor.")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
