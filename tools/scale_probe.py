"""Superlinearity probe: replicate the sf0.1 fixtures REP× with
key-offset copies (fact tables only — dims stay single) into a temp
"sf1-like" directory, run the data-bound headline queries at both
scales, and report observed vs linear-predicted scaling.

This is a PERFORMANCE harness, not a correctness fixture: the driver's
correctness gate stays on the driver-generated parquet; this script
only answers "does any headline plan hide an O(n^2) term that sf0.1
can't see?" (the LSH band join and the CDC substring window pass are
the two the round-4 verdict flagged to watch).

Key shifting preserves join semantics: every copy i adds i*STRIDE to
the table's own keys AND to the foreign keys referencing them, so each
copy joins only within itself — exactly how a 10x-bigger TPC-H corpus
behaves (join fan-outs stay constant, group counts scale).

CONTENT is perturbed per copy too, for the same invariant on
content-keyed operators: verbatim text/embedding copies would merge
into shared LSH / window-hash buckets (bucket sizes x REP instead of
bucket counts x REP — up to REP^2 self-join pair inflation, and base
buckets crossing the 256 caps only at the big scale), distorting
exactly the dedup/ANN scaling the probe exists to measure. Documents
get a per-copy alphabet rotation (translate — every token, shingle,
and window differs across copies; lengths and char classes preserved)
and embeddings a per-copy additive offset, so content-bucket sizes
stay constant like the shifted keys.

Usage: python tools/scale_probe.py [--rep 10] [--out BENCH_sf1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (table, [(key column, stride)]) — stride > max key in the source
_FACTS = {
    "lineitem": [("l_orderkey", 10_000_000)],
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
    "customer": [("c_custkey", 1_000_000)],
    "supplier": [("s_suppkey", 1_000_000)],
    "part": [("p_partkey", 10_000_000)],
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
    "events": [("event_id", 100_000_000)],
}
_DIMS = ("region", "nation")

# lineitem/partsupp-ish FKs that point at replicated dims-of-facts
_EXTRA_FK = {
    "lineitem": [("l_partkey", 10_000_000), ("l_suppkey", 1_000_000)],
}

# data-bound headline queries (cells_*/multimodal_* scan a constant
# generated image set — excluded by design); the stream_* rows replay
# the replicated events fixture through the incremental pipeline, so
# streaming throughput-vs-volume is measured too — including the
# sliding window (overlapping state) and the watermark-TTL dedup
# (per-key state store), not just the tumbling agg
PROBE_QUERIES = [
    "q01_pricing_summary", "q03_revenue_topn", "q05_region_revenue",
    "q17_outlier_votes", "q18_small_qty_vs_avg", "q24_percentiles",
    "q25_range_join", "q39_band_join", "histogram",
    "curate_redact", "curate_pipeline", "dedup_minhash_verified",
    "dedup_simhash", "dedup_incremental", "dedup_incremental_persisted",
    "dedup_substring_exact", "ann_bruteforce_topk", "ann_ivf_topk",
    "text_token_stats", "stream_hourly_by_type",
    "stream_sliding_by_type", "stream_dedup_within_watermark",
    # r9 per-ingest family. ingest_gate_pipeline's ratio includes the
    # fixed-K ANN cell check (cells grow with the corpus at the
    # fixture's K=8 — production sizes K ~ sqrt(N)); the LM pair is
    # clean of that caveat. ann_incremental_* stay excluded for the
    # same fixed-K reason as before.
    "text_lm_perplexity", "lm_incremental_refresh",
    "ingest_gate_pipeline", "stream_ingest_loop",
]

# per-copy content perturbation (see module docstring): copy i applies
# the affine letter permutation k -> (a*k + b) mod 26 and the matching
# digit map d -> (a*d + b) mod 10, with b = i mod 26 and the multiplier
# a drawn from _A_UNITS (each coprime to BOTH 26 and 10, so every map
# is a bijection on letters and on digits). Distinct (a, b) pairs give
# distinct letter permutations — an affine map determines (a, b)
# uniquely — so the family supports rep <= 26 * len(_A_UNITS) = 104
# copies (the 100x rung) before any two copies would carry
# byte-identical text, merging their content buckets and silently
# reintroducing the distortion this exists to prevent; build_scaled
# enforces the cap.
#
# AT-LEAST-ONE-LETTER ASSUMPTION (load-bearing): the 104-map
# distinctness argument is about LETTER permutations only — there are
# just 40 affine bijections mod 10, so distinct (a, b) pairs can share
# a digit map (i=0 and i=10 with a=1 map digits identically), and a
# document whose text is digit-only WOULD be byte-identical across
# such copies, silently merging its content buckets. Safe because
# every fixture doc contains a letter; build_scaled asserts that
# instead of assuming it.
_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"
_A_UNITS = (1, 3, 7, 9)  # units mod 26 and mod 10


def _copy_maps(i: int) -> tuple[str, str]:
    a, b = _A_UNITS[i // 26], i % 26
    rot = "".join(_ALPHA[(a * k + b) % 26] for k in range(26))
    drot = "".join(_DIGIT[(a * d + b) % 10] for d in range(10))
    return rot, drot


def _perturb(table: str, i: int) -> str | None:
    # emitted for EVERY copy (identity at i=0) so the UNION ALL
    # branches keep identical positional column order
    if table == "documents":
        rot, drot = _copy_maps(i)
        return (f"translate(text, '{_ALPHA}{_ALPHA.upper()}{_DIGIT}', "
                f"'{rot}{rot.upper()}{drot}') AS text")
    if table == "embeddings":
        return (f"list_transform(embedding, x -> x + {i} * 0.0078125)"
                " AS embedding")
    return None


def build_scaled(dst: str, rep: int) -> None:
    if rep > 26 * len(_A_UNITS):
        raise ValueError(
            f"rep > {26 * len(_A_UNITS)} exhausts the distinct affine "
            "letter permutations: two copies would carry byte-identical "
            "text, merging their content buckets and distorting the "
            "dedup/ANN scaling this probe measures")
    con = duckdb.connect()
    n_letterless = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/documents.parquet') "
        "WHERE NOT regexp_matches(text, '[a-zA-Z]')").fetchone()[0]
    if n_letterless:
        raise ValueError(
            f"{n_letterless} letterless docs: per-copy distinctness holds "
            "for letter permutations only (40 affine digit maps < 104 "
            "copies) — digit-only docs would collide across copies")
    for t in _DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    for t, keys in _FACTS.items():
        shifts = keys + _EXTRA_FK.get(t, [])
        cols = {c for c, _ in shifts}
        sel_parts = []
        for i in range(rep):
            exprs = []
            for c, stride in shifts:
                # precomputed offset: DuckDB would plan `i * stride` as
                # INT32 * INT32 and overflow at i*stride >= 2^31
                exprs.append(f"{c} + {i * stride} AS {c}")
            pert = _perturb(t, i)
            if pert is not None:
                cols_i = cols | {pert.rsplit(" AS ", 1)[1]}
                exprs.append(pert)
            else:
                cols_i = cols
            exprs.append(f"* EXCLUDE ({', '.join(sorted(cols_i))})")
            sel_parts.append(
                f"SELECT {', '.join(exprs)} FROM "
                f"read_parquet('{SRC}/{t}.parquet')")
        con.execute(
            f"COPY ({' UNION ALL '.join(sel_parts)}) TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
    con.close()


def time_queries(spark, queries, sf_dir: str, names, reps: int = 3) -> dict:
    # checksum_count, not count(): the count plan prunes columns and
    # eliminates unique-key left joins (dedup_incremental loses its
    # whole near tier), so count() times the wrong plan — the r7
    # BENCH_sf1 incremental ratio was re-measured after this fix
    from big_data_science_project_spark.functions.actions import (
        checksum_count)

    out = {}
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(reps):
            t0 = time.time()
            checksum_count(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--out", default="BENCH_sf1.json")
    ap.add_argument("--queries", nargs="*", default=None,
                    help="subset of PROBE_QUERIES (default: all) — the "
                         "30x rung targets just the steepest 10x curves")
    args = ap.parse_args()
    names = args.queries or PROBE_QUERIES
    unknown = set(names) - set(PROBE_QUERIES)
    if unknown:
        raise SystemExit(f"not probe queries: {sorted(unknown)}")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate())
    import __spark_entry__ as entry
    queries = entry.queries()

    dst = tempfile.mkdtemp(prefix=f"sfprobe_x{args.rep}_")
    print(f"building {args.rep}x corpus at {dst}", file=sys.stderr)
    build_scaled(dst, args.rep)

    print("timing sf0.1 (min of 3, warm)", file=sys.stderr)
    base = time_queries(spark, queries, SRC, names)
    print(f"timing {args.rep}x (min of 3, warm)", file=sys.stderr)
    big = time_queries(spark, queries, dst, names)

    rows = {}
    for name in names:
        ratio = round(big[name] / base[name], 2) if base[name] else None
        rows[name] = {"sf01_sec": base[name],
                      f"x{args.rep}_sec": big[name],
                      "ratio": ratio}
    result = {"rep": args.rep, "src": SRC, "queries": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
