"""Bound the fused hot-bucket guard's straggler exposure (r5 verdict
item #2).

The r5 guard fusion (`dedup._candidate_pairs`) counts bucket sizes with
a window that rides the band self-join's own shuffle — zero extra
passes, but ALL rows of an over-cap bucket now colocate in ONE window
task before being filtered, where the r4 agg+anti-join dropped them
map-side BEFORE the exchange. Per-bucket work is linear and the window
spills, so the predicted failure mode is a straggler (one long task),
not a blow-up. This probe MEASURES that: it plants a single boilerplate
bucket of --hot identical docs (default 10^6) on top of the sf0.1
corpus, runs `dedup_minhash_verified`, and reports, per completed
stage, max-vs-median task duration and shuffle-read bytes from the
Spark UI REST API — plus the same run with --hot 0 as the control.

Interpretation: every copy carries the SAME text, so all --hot rows
land in one (band_id, band_key) bucket per band (N_BANDS hot buckets,
each of size --hot, all over LSH_MAX_BUCKET=256 → all dropped by the
guard; the planted rows contribute zero candidate pairs, which the row
count cross-check asserts). The number that answers the verdict is
`worst_stage.max_over_median_duration` on the window stage: if it stays
within ~10x of the control's, the fused path holds at boilerplate skew
and the threshold fallback is not needed.

--query incremental (r7 verdict item #7) probes the SAME hot-key shape
in `dedup_incremental`'s near tier: its cap window partitions the INDEX
side's bands on the join key, so the planted boilerplate bucket goes on
the index side of the md5-bucket split (planted ids are filtered to
bucket < INDEX_PCT). The guard must drop the bucket before the
batch×index band join; result rows (one per batch doc) must be
IDENTICAL to the control since nothing was planted on the batch side.

--query lm (r8 verdict item #7) probes the LM gate's frequent-history
skew (`text_lm_perplexity` — the in-plan scorer, whose c(w1) join
shuffles raw batch bigrams on (lang, w1)). --hot counts hot-TOKEN
occurrences here, planted as boilerplate docs of 25 'the'-history
bigrams each on BOTH sides of the md5-bucket split:
  - index side: one million training occurrences of the history token
    — the c12/c1 aggregations must absorb them MAP-SIDE (partial
    count collapses identical bigrams before the exchange; the
    aggregated c1 carries ONE row per (lang, w1) however hot the key);
  - batch side: the true skew carrier — every planted bigram row with
    w1='the' shuffles into the SAME reduce partition of the c1 join;
    max/median task duration on that exchange is the straggler bound
    the verdict asks for.
Planted index docs change the LM (scores legitimately shift), so the
value assertion is on ROWS: exactly one result row per batch doc
(control + planted-batch count) — the per-doc aggregate cannot lose or
duplicate docs under skew.

Usage: python tools/straggler_probe.py [--hot 1000000]
           [--query minhash|incremental|lm] [--out STRAGGLER.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ~200 chars of mixed tokens — long enough for the full shingle
# pipeline, short enough that 10^6 copies build in seconds
_BOILER = ("this software is provided as is without warranty of any kind "
           "express or implied including but not limited to the implied "
           "warranties of merchantability fitness for a particular purpose "
           "and noninfringement of rights")


# 25 hot-HISTORY bigrams per planted doc: w1='the' every other token,
# w2 UNIQUE per (doc, position). The per-doc-varying w2 matters twice:
# (a) identical planted texts RLE-compress so hard that all planted
#     docs land in ONE input split — the first probe run measured a
#     374× scan-task straggler that was purely that fixture artifact,
#     saying nothing about the join; varied text restores balanced
#     splits so the probe measures the JOIN;
# (b) it makes the trained c12 realistically Zipf-shaped: ~--hot
#     distinct (the, w2) rows, large enough that the scoring joins
#     CANNOT auto-broadcast — the skew has to ride the shuffle, which
#     is the 100 TB shape under test.
_LM_BIGRAMS_PER_DOC = 25


def _lm_text_expr() -> str:
    """DuckDB expression: per-doc text 'the t0_<i> the t1_<i> …'."""
    pieces = []
    for k in range(_LM_BIGRAMS_PER_DOC):
        pieces.append(f"'the t{k}_' || i")
    return " || ' ' || ".join(pieces)


def build_lm_corpus(dst: str, hot: int) -> int:
    """Plant ceil(hot / 25) boilerplate docs on EACH side of the
    md5-bucket split (≥ --hot occurrences of the 'the' history token
    per side); returns the number of batch-side docs planted (each
    adds exactly one result row)."""
    from big_data_science_project_spark.operators.curation import (
        _bucket_sql)
    from big_data_science_project_spark.operators.dedup import INDEX_PCT

    # hot=0 (the control) still routes through HERE so both runs write
    # the base corpus at the SAME row-group size — a control written at
    # a different granularity would have different scan-task shapes and
    # could not anchor the residual-scan-skew interpretation
    n_docs = -(-hot // _LM_BIGRAMS_PER_DOC)
    con = duckdb.connect()
    parts = [f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"]
    sides = () if n_docs == 0 else (
        (50_000_000, f"{_bucket_sql('50000000 + i')} < {INDEX_PCT}"),
        (60_000_000, f"{_bucket_sql('60000000 + i')} >= {INDEX_PCT}"))
    for base, cond in sides:
        # parenthesized: a LIMIT inside a non-final UNION ALL arm is a
        # parse error otherwise
        parts.append(
            f"(SELECT {base} + i AS doc_id, {_lm_text_expr()} AS text, "
            f"'en' AS lang, 'boilerplate' AS source, "
            f"0 AS n_chars "
            f"FROM generate_series(1, {int(n_docs * 6)}) t(i) "
            f"WHERE {cond} LIMIT {n_docs})")
    # 2048-row groups: at the default 40960 ALL planted docs of one
    # side fit in a single row group → one input split explodes ~1M
    # bigrams alone — a 21 s scan-task straggler that is pure fixture
    # granularity, not the join skew under test
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{dst}/documents.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 2048)")
    con.close()
    return n_docs


# --query lm_bigram (r9 verdict item 3) probes the OTHER LM skew: one
# EXACT bigram ("of the") planted at --hot occurrences on both sides of
# the split. Unlike the hot-history plant (many distinct (the, w2)
# keys), every planted batch row here carries the SAME (lang, w1, w2)
# key — pre-split those 1e6 rows bypass the c1 head broadcast only to
# pile into ONE reduce partition of the c12 join; post-split the bigram
# is in the trained c12 head slice (c12 >= LM_HOT_BIGRAM) and resolves
# map-side. --query lm_bigram_nosplit runs the IDENTICAL corpus with
# the c12 split disabled (hot_bigram = 2^60) — the pre-fix control that
# shows the straggler the split removes. Per-doc text is 25 copies of
# the bigram plus a UNIQUE tail token (varied text keeps input splits
# balanced — same RLE lesson as the history plant).
_LM_BI_PER_DOC = 25


def build_lm_bigram_corpus(dst: str, hot: int) -> int:
    """Plant ceil(hot / 25) docs per split side, each 'of the' × 25
    plus a unique tail; returns the batch-side doc count."""
    from big_data_science_project_spark.operators.curation import (
        _bucket_sql)
    from big_data_science_project_spark.operators.dedup import INDEX_PCT

    n_docs = -(-hot // _LM_BI_PER_DOC)
    con = duckdb.connect()
    parts = [f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"]
    sides = () if n_docs == 0 else (
        (70_000_000, f"{_bucket_sql('70000000 + i')} < {INDEX_PCT}"),
        (80_000_000, f"{_bucket_sql('80000000 + i')} >= {INDEX_PCT}"))
    for base, cond in sides:
        parts.append(
            f"(SELECT {base} + i AS doc_id, "
            f"repeat('of the ', {_LM_BI_PER_DOC}) || 'u' || i AS text, "
            f"'en' AS lang, 'boilerplate' AS source, 0 AS n_chars "
            f"FROM generate_series(1, {int(n_docs * 6)}) t(i) "
            f"WHERE {cond} LIMIT {n_docs})")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{dst}/documents.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 2048)")
    con.close()
    return n_docs


def _lm_perplexity_nosplit(spark, sf_dir: str):
    """text_lm_perplexity with the c12 hot-bigram split DISABLED — the
    pre-fix control the lm_bigram probe compares against."""
    from pyspark.sql import functions as F

    from big_data_science_project_spark.operators.curation import _bucket
    from big_data_science_project_spark.operators.dedup import INDEX_PCT
    from big_data_science_project_spark.operators.text import (
        _lm_tables, _score_against_lm)
    from big_data_science_project_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = _bucket(F.col("doc_id"))
    parts = _lm_tables(d.filter(bucket < INDEX_PCT))
    return _score_against_lm(d.filter(bucket >= INDEX_PCT), *parts,
                             hot_bigram=1 << 60)


def build_corpus(dst: str, hot: int, index_side: bool = False) -> None:
    # small row groups: 10^6 identical strings RLE-compress to a few
    # MB, so without them the scan collapses to one or two input
    # splits and the (guard-unrelated) shingle-hash stage serializes —
    # the first probe run measured exactly that artifact (2 tasks,
    # 410 s each)
    con = duckdb.connect()
    parts = [f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"]
    if hot:
        if index_side:
            # incremental probe: every planted id must land on the
            # INDEX side of the split (bucket < INDEX_PCT) — overdraw
            # the series and filter on the same md5-bucket expression
            # the engine pair uses (~80% pass rate, 1.3x covers it)
            from big_data_science_project_spark.operators.curation import (
                _bucket_sql)
            from big_data_science_project_spark.operators.dedup import (
                INDEX_PCT)
            src = (f"FROM generate_series(1, {int(hot * 1.3)}) t(i) "
                   f"WHERE {_bucket_sql('50000000 + i')} < {INDEX_PCT} "
                   f"LIMIT {hot}")
        else:
            src = f"FROM generate_series(1, {hot}) t(i)"
        parts.append(
            f"SELECT 50000000 + i AS doc_id, '{_BOILER}' AS text, "
            f"'en' AS lang, 'boilerplate' AS source, "
            f"{len(_BOILER)} AS n_chars " + src)
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{dst}/documents.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 40960)")
    con.close()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def stage_table(spark) -> list[dict]:
    """Per-completed-stage task-skew summary from the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    out = []
    for st in _get(f"{ui}/api/v1/applications/{app}/stages?status=complete"):
        sid, att, n = st["stageId"], st["attemptId"], st["numTasks"]
        try:
            q = _get(f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}"
                     f"/taskSummary?quantiles=0.5,1.0")
        except Exception:
            continue
        med_d, max_d = q["duration"]
        srm = q.get("shuffleReadMetrics") or {}
        med_b, max_b = srm.get("readBytes", [0, 0])
        out.append({
            "stage": sid, "name": st["name"].split("\n")[0][:80],
            "num_tasks": n,
            "median_task_ms": med_d, "max_task_ms": max_d,
            "max_over_median_duration":
                round(max_d / med_d, 2) if med_d else None,
            "median_shuffle_read_b": med_b, "max_shuffle_read_b": max_b,
        })
    return out


def run_once(queries, hot: int, qname: str = "dedup_minhash_verified",
             index_side: bool = False, lm: bool = False,
             lm_bigram: bool = False) -> dict:
    # fresh session per run so the stage table contains ONLY this run.
    # Post-shuffle coalescing is disabled so the window stage keeps all
    # 32 tasks — the probe MEASURES per-task skew, and AQE folding 31
    # near-empty partitions into one would hide exactly that. Input
    # splits forced down to ~1 MB for the same reason on the scan side.
    from pyspark.sql import SparkSession
    builder = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "64k")
        .config("spark.driver.memory", "48g"))
    if lm:
        # at probe scale the LM tables auto-broadcast, which HIDES the
        # shuffled c1/c12 joins a 100 TB corpus must survive (they
        # exceed any broadcast threshold there). Disable size-based
        # broadcast so the probe measures the at-scale plan shape;
        # the scale-CORRECT broadcasts (the bounded c1 head slice,
        # vocab, gvocab) are explicit F.broadcast hints and unaffected
        builder = (builder
                   .config("spark.sql.autoBroadcastJoinThreshold", "-1")
                   .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                           "-1"))
    spark = builder.getOrCreate()
    # checksum_count forces the FULL plan: count() would let Catalyst
    # eliminate dedup_incremental's near tier (unique-key left joins),
    # timing a query with no band window at all
    from big_data_science_project_spark.functions.actions import (
        checksum_count)

    dst = tempfile.mkdtemp(prefix=f"straggler_h{hot}_")
    n_planted_batch = 0
    try:
        if lm_bigram:
            n_planted_batch = build_lm_bigram_corpus(dst, hot)
        elif lm:
            n_planted_batch = build_lm_corpus(dst, hot)
        else:
            build_corpus(dst, hot, index_side)
        t0 = time.time()
        n_rows, ck = checksum_count(queries[qname](spark, dst))
        wall = round(time.time() - t0, 3)
        stages = stage_table(spark)
        # the window/guard stage is the one reading the band exchange —
        # identify it as the completed stage with the largest shuffle
        # read; its max/median task duration is the straggler bound
        # the r5 verdict asked for
        shuffle_stages = [s for s in stages
                          if s["num_tasks"] >= 4 and s["max_shuffle_read_b"]]
        window_stage = max(shuffle_stages,
                           key=lambda s: s["max_shuffle_read_b"],
                           default=None)
        return {"hot": hot, "wall_sec": wall, "result_rows": n_rows,
                "result_checksum": ck, "planted_batch_docs": n_planted_batch,
                "window_stage": window_stage, "stages": stages}
    finally:
        shutil.rmtree(dst, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=1_000_000)
    ap.add_argument("--query",
                    choices=("minhash", "incremental", "lm",
                             "lm_bigram", "lm_bigram_nosplit"),
                    default="minhash")
    ap.add_argument("--out", default="STRAGGLER.json")
    args = ap.parse_args()

    import __spark_entry__ as entry
    queries = dict(entry.queries())
    queries["_lm_nosplit"] = _lm_perplexity_nosplit
    qname = {"minhash": "dedup_minhash_verified",
             "incremental": "dedup_incremental",
             "lm": "text_lm_perplexity",
             "lm_bigram": "text_lm_perplexity",
             "lm_bigram_nosplit": "_lm_nosplit"}[args.query]
    index_side = args.query == "incremental"
    lm_bigram = args.query.startswith("lm_bigram")
    lm = args.query == "lm" or lm_bigram

    print("control run (hot=0)", file=sys.stderr, flush=True)
    control = run_once(queries, 0, qname, index_side, lm, lm_bigram)
    print(f"  wall={control['wall_sec']}s rows={control['result_rows']}",
          file=sys.stderr)
    print(f"hot-bucket run (hot={args.hot})", file=sys.stderr, flush=True)
    hot = run_once(queries, args.hot, qname, index_side, lm, lm_bigram)
    print(f"  wall={hot['wall_sec']}s rows={hot['result_rows']}",
          file=sys.stderr)

    if lm:
        # planted index docs legitimately shift base scores (they ARE
        # new training data), so the assertion is per-doc delivery:
        # exactly one result row per batch doc, planted included — a
        # skewed c1 join partition may be slow but must lose nothing
        want = control["result_rows"] + hot["planted_batch_docs"]
        assert hot["result_rows"] == want, (
            f"LM gate lost/duplicated docs under skew: "
            f"{hot['result_rows']} vs expected {want}")
    else:
        # the guard must drop the planted bucket entirely: identical
        # docs are exact dups, not NEAR dups (minhash probe), and
        # index-side plants add no batch rows (incremental probe) —
        # either way the result over the base corpus must be
        # unchanged. The VALUE checksum is the assertion with teeth:
        # dedup_incremental emits one row per batch doc by
        # construction, so a leaked bucket would never change its row
        # COUNT — only its n_candidates/best_jaccard values
        assert hot["result_rows"] == control["result_rows"], (
            "planted over-cap bucket leaked candidate pairs: "
            f"{hot['result_rows']} vs control {control['result_rows']}")
        assert hot["result_checksum"] == control["result_checksum"], (
            "planted over-cap bucket changed result VALUES: "
            f"{hot['result_checksum']:x} vs {control['result_checksum']:x}")

    result = {"src": SRC, "boiler_len": len(_BOILER), "query": qname,
              "control": control, "hot_run": hot}
    if lm_bigram:
        result["interpretation"] = (
            "Adversarial EXACT-BIGRAM plant (r9 verdict item 3): "
            "~1e6 occurrences of one ('of','the') bigram on each side "
            "of the split, auto-broadcast disabled. Read the hot_run "
            "stage table on SHUFFLE-READ max/median: with the c12 "
            "split disabled (lm_bigram_nosplit) the exact-bigram join "
            "stage shows the pile-up (measured 45x shuffle-read skew, "
            "one task reading 2.3 MB vs a 52 KB median); with the "
            "split wired (lm_bigram) no stage carries a hot-key "
            "shuffle-read pile-up — the head bigram resolves map-side "
            "via the broadcast c12 head slice. Row count = control + "
            "planted batch docs in both, and the split is "
            "value-invariant by the disjointness unit test.")
    elif lm:
        result["interpretation"] = (
            "Run with size-based auto-broadcast DISABLED so the "
            "c1/c12 joins take the shuffled form a 100 TB corpus "
            "forces; control and hot corpora written at the same "
            "row-group size. With the Zipf-head split wired "
            "(_score_against_lm), the LARGE shuffle-read stages are "
            "flat under a ~1e6-occurrence hot history (compare "
            "per-stage max/median in this file; small shuffle stages "
            "carry sub-second maxes where a ratio is noise). Probe "
            "iterations BEFORE the split measured 200-375x max/median "
            "task ratios with ~20 s join-stage tasks from the same "
            "plant.")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("control", "hot_run")},
                     default=str)[:2000])


if __name__ == "__main__":
    main()
