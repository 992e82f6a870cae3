"""Training-data curation operators over ``documents`` (engine-mandated
LLM-data-pipeline surface).

Both operators are built on **deterministic hash bucketing** instead of
RNG sampling: ``bucket = md5(doc_id) mod 100``. That is how production
corpus pipelines split and sample — the assignment is a pure function of
the row key, so it is stable across runs, engines, repartitioning, and
incremental re-ingestion (a re-crawled doc lands in the same split), and
it needs no seed-state coordination across 1000 executors. Spark's own
``sample``/``randomSplit`` are partition-order-dependent and would be
unverifiable against an oracle.

The bucket hash is the same md5→int trick the dedup ladder uses, so both
engines compute identical buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}

TRAIN_PCT = 90
VAL_PCT = 5  # test gets the remainder


def _bucket(col: Column) -> Column:
    """Deterministic 0-99 bucket from the row key: first 4 md5 hex chars
    (16 bits) mod 100."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
            .cast("bigint") % 100)


def _bucket_sql(expr: str) -> str:
    return (f"CAST(('0x' || SUBSTRING(md5(CAST({expr} AS VARCHAR)), 1, 4))"
            f" AS BIGINT) % 100")


# ---------------------------------------------------------------------------
# train/val/test split: stratification report per (lang, split).
# One map-side bucket computation + one aggregate; no data is moved to
# produce the split itself — downstream consumers filter on the same
# deterministic expression (or on a materialized `split` partition column).
# ---------------------------------------------------------------------------
def curate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (F.when(b < TRAIN_PCT, F.lit("train"))
             .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
             .otherwise(F.lit("test")))
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").cast("bigint").alias("total_chars"))
    )


QUERIES["curate_split"] = (curate_split, f"""
SELECT lang,
       CASE WHEN {_bucket_sql('doc_id')} < {TRAIN_PCT} THEN 'train'
            WHEN {_bucket_sql('doc_id')} < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""")


# ---------------------------------------------------------------------------
# stratified (quota) sampling: per-language rates — downsample the
# high-resource language, keep low-resource ones. The rate table is a CASE
# expression (broadcast-join a real rate dimension at scale); selection is
# a pure filter, so it pushes to the scan and samples without a shuffle.
# ---------------------------------------------------------------------------
LANG_RATES = {"en": 10, "es": 50, "de": 50, "fr": 50, "zh": 50}
DEFAULT_RATE = 25


def curate_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(LANG_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "lang", "source",
                 _bucket(F.col("doc_id")).alias("bucket"))
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "source")
    )


_RATE_SQL = ("CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {r}"
    for lang, r in sorted(LANG_RATES.items())) + f" ELSE {DEFAULT_RATE} END")

QUERIES["curate_stratified_sample"] = (curate_stratified_sample, f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_bucket_sql('doc_id')} < {_RATE_SQL}
""")


# ---------------------------------------------------------------------------
# fixed-window document chunking with overlap — the context-window prep
# step of every LLM training pipeline. Pure map-side fan-out: sequence →
# explode → substring, no shuffle at all, so it scales with input splits
# and the chunker never becomes a bottleneck at 100 TB. Start offsets are
# a pure function of n_chars (not an RNG), so chunk identity is stable
# across runs and engines.
# ---------------------------------------------------------------------------
CHUNK_CHARS = 64
CHUNK_STRIDE = 48  # 16-char overlap between consecutive chunks


def curate_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(CHUNK_STRIDE))
    return (
        d.filter(F.col("n_chars") > 0)
        .select("doc_id", "text", F.explode(starts).alias("start"))
        .select("doc_id", "start",
                F.expr(f"substring(text, start + 1, {CHUNK_CHARS})")
                .alias("chunk"))
        .withColumn("chunk_len", F.length("chunk"))
    )


QUERIES["curate_chunk"] = (curate_chunk, f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(0, n_chars - 1, {CHUNK_STRIDE})) AS start
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, start,
       substring(text, CAST(start + 1 AS INT), {CHUNK_CHARS}) AS chunk,
       length(substring(text, CAST(start + 1 AS INT), {CHUNK_CHARS})) AS chunk_len
FROM starts
""")


# ---------------------------------------------------------------------------
# per-language quality-percentile filter: keep documents at or above their
# language's median length. The per-language medians are a tiny aggregate
# (one row per language), broadcast back onto the corpus — the big table
# is never shuffled, only scanned and filtered. Exact percentile
# (interpolating, == DuckDB quantile_cont) is fine on the tiny group
# count; the doc-level compare is against a broadcast scalar.
# ---------------------------------------------------------------------------
def curate_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med"))
    return (
        d.join(F.broadcast(med), "lang")
        .filter(F.col("n_chars") >= F.col("med"))
        .select("doc_id", "lang", "n_chars")
    )


QUERIES["curate_quality_filter"] = (curate_quality_filter, """
SELECT doc_id, lang, n_chars
FROM documents
JOIN (SELECT lang, quantile_cont(n_chars, 0.5) AS med
      FROM documents GROUP BY lang) USING (lang)
WHERE n_chars >= med
""")


# ---------------------------------------------------------------------------
# composed end-to-end curation pipeline — exact-dedup → per-language
# quality-median filter → deterministic split — as ONE declarative DAG.
# Catalyst plans the whole chain together: dedup is one shuffle on the
# 16-byte digest with min_by carrying the survivor's columns (no join
# back to the corpus), the medians are a tiny broadcast, the split is a
# map-side expression, and the final report is a partial+final agg over
# (lang, split). Three logical stages, ONE corpus-sized shuffle total.
# ---------------------------------------------------------------------------
def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    canon = (
        d.groupBy(F.md5("text").alias("digest"))
        .agg(F.min_by(F.struct("doc_id", "lang", "n_chars"), F.col("doc_id"))
             .alias("r"))
        .select("r.doc_id", "r.lang", "r.n_chars")
    )
    med = canon.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med"))
    kept = (canon.join(F.broadcast(med), "lang")
            .filter(F.col("n_chars") >= F.col("med")))
    b = _bucket(F.col("doc_id"))
    split = (F.when(b < TRAIN_PCT, F.lit("train"))
             .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
             .otherwise(F.lit("test")))
    return (
        kept.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").cast("bigint").alias("total_chars"))
    )


QUERIES["curate_pipeline"] = (curate_pipeline, f"""
WITH canon AS (
  SELECT doc_id, lang, n_chars FROM (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
), med AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM canon GROUP BY lang
), kept AS (
  SELECT c.* FROM canon c JOIN med USING (lang) WHERE n_chars >= med
)
SELECT lang,
       CASE WHEN {_bucket_sql('doc_id')} < {TRAIN_PCT} THEN 'train'
            WHEN {_bucket_sql('doc_id')} < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM kept
GROUP BY 1, 2
""")


# ---------------------------------------------------------------------------
# PII redaction: scrub emails/phone-style tokens before a corpus ships.
# Entirely map-side (regexp_replace + regexp-count per row, then a
# per-lang aggregate over ≤|langs| groups) — at 100 TB this is the same
# single scan-and-rewrite pass any redaction job is. The fixture text
# carries no real PII, so the query PLANTS deterministic doc_id-derived
# PII first (both engines build the identical string), then proves the
# scrub: redaction counts per pattern, and byte deltas, all
# oracle-matched. Patterns stay in the RE2 ∩ Java-regex dialect subset
# (character classes + bounded repeats, no lookaround) so Spark and
# DuckDB match identically.
# ---------------------------------------------------------------------------
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"


def curate_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    with_pii = d.select("doc_id", "lang", planted.alias("ptext"))
    red = F.regexp_replace(
        F.regexp_replace(F.col("ptext"), EMAIL_RE, "[EMAIL]"),
        PHONE_RE, "[TEL]")
    scrubbed = with_pii.select(
        "lang",
        F.length("ptext").alias("len_in"),
        F.regexp_count(F.col("ptext"), F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(F.col("ptext"), F.lit(PHONE_RE)).alias("n_phone"),
        F.length(red).alias("len_out"))
    return (scrubbed.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_email").cast("bigint").alias("emails_redacted"),
                 F.sum("n_phone").cast("bigint").alias("phones_redacted"),
                 F.sum("len_in").cast("bigint").alias("chars_in"),
                 F.sum("len_out").cast("bigint").alias("chars_out")))


QUERIES["curate_redact"] = (curate_redact, f"""
WITH p AS (
  SELECT lang,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ptext
  FROM documents
), s AS (
  SELECT lang,
         LENGTH(ptext) AS len_in,
         len(regexp_extract_all(ptext, '{EMAIL_RE}')) AS n_email,
         len(regexp_extract_all(ptext, '{PHONE_RE}')) AS n_phone,
         LENGTH(regexp_replace(regexp_replace(ptext, '{EMAIL_RE}', '[EMAIL]', 'g'),
                               '{PHONE_RE}', '[TEL]', 'g')) AS len_out
  FROM p
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(len_in) AS BIGINT) AS chars_in,
       CAST(SUM(len_out) AS BIGINT) AS chars_out
FROM s
GROUP BY lang
""")


# ---------------------------------------------------------------------------
# Benchmark decontamination — flag training documents sharing any
# shingle with a held-out benchmark set (here: every 100th doc, a
# deterministic stand-in for an eval suite). Reuses the dedup ladder's
# int-shingle machinery (one md5 per shingle, SURVEY.md Phase 5), so
# the check costs one explode + one equi join on an 8-byte hash. At
# 100 TB the benchmark side is tiny and broadcasts: the corpus is
# never shuffled, making this a map-side filter — the property that
# lets decontamination run inside every ingestion pass instead of as
# a special job.
# ---------------------------------------------------------------------------
def curate_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _hashed_shingles_df

    d = load_table(spark, sf_dir, "documents")
    hashed = _hashed_shingles_df(d)
    train = (hashed.filter(F.col("doc_id") % 100 != 0)
             .select("doc_id", F.explode("hs").alias("h")))
    bench = (hashed.filter(F.col("doc_id") % 100 == 0)
             .select(F.explode("hs").alias("h")).distinct())
    return (train.join(F.broadcast(bench), "h")
            .groupBy("doc_id")
            .agg(F.countDistinct("h").alias("n_shared")))


from .dedup import _HASHED_SHINGLES_SQL as _SHINGLE_HASH_SQL  # noqa: E402

QUERIES["curate_decontaminate"] = (curate_decontaminate, f"""
WITH hashed AS ({_SHINGLE_HASH_SQL}),
te AS (SELECT doc_id, unnest(hs) AS h FROM hashed WHERE doc_id % 100 != 0),
be AS (SELECT DISTINCT unnest(hs) AS h FROM hashed WHERE doc_id % 100 = 0)
SELECT doc_id, COUNT(DISTINCT h) AS n_shared
FROM te JOIN be USING (h)
GROUP BY doc_id
""")


# ---------------------------------------------------------------------------
# Sequence packing — GPT-style concat-then-chunk: per source, documents
# are concatenated in doc_id order and sliced into fixed CONTEXT-token
# training sequences; each doc lands in the pack where it starts. The
# running token offset is a window cumsum PARTITIONed BY source — packing
# parallelizes across sources (or any sharding column) instead of one
# global sort, which is exactly how you'd pack a 100 TB corpus: the only
# cross-partition state is per-source, never global. Integer arithmetic
# end to end.
# ---------------------------------------------------------------------------
PACK_CONTEXT = 512


def curate_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sized = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    placed = (sized
              .withColumn("end_tok", F.sum("n_tok").over(w))
              .withColumn("pack_id",
                          F.floor((F.col("end_tok") - F.col("n_tok"))
                                  / F.lit(PACK_CONTEXT)).cast("bigint")))
    return (placed.groupBy("source", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("tok_started"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


QUERIES["curate_pack_sequences"] = (curate_pack_sequences, f"""
WITH placed AS (
  SELECT source, doc_id,
         len(string_split(text, ' ')) AS n_tok,
         SUM(len(string_split(text, ' ')))
           OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS end_tok
  FROM documents)
SELECT source,
       CAST(FLOOR((end_tok - n_tok) / {PACK_CONTEXT}) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tok_started,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY source, pack_id
""")


# ---------------------------------------------------------------------------
# Domain-mixture reweighting — hit a target language mixture by
# deterministic per-doc resampling: weight w = target_share/actual_share,
# every doc keeps floor(w) copies plus one more iff its md5 micro-bucket
# falls below frac(w)·1e6. Up- AND down-sampling, no RNG: the decision is
# a pure function of doc_id, so any engine (and any retry) resamples
# identically — the property that makes training-data recipes
# reproducible. The weight table is 5 rows (broadcast); the corpus never
# shuffles — one map-side pass then a tiny per-lang rollup.
# ---------------------------------------------------------------------------
MIXTURE_TARGET = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def curate_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    target = F.create_map(
        *[F.lit(x) for kv in MIXTURE_TARGET.items() for x in kv])
    weights = (counts.crossJoin(F.broadcast(total))
               .select("lang", "n_docs", "n_total",
                       (target[F.col("lang")] * F.col("n_total")
                        / F.col("n_docs")).alias("w")))
    micro = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("bigint") % 1000000)
    keep = (F.floor("w").cast("bigint")
            + F.when(micro < F.floor((F.col("w") - F.floor("w")) * 1000000),
                     F.lit(1)).otherwise(F.lit(0)))
    return (d.join(F.broadcast(weights), "lang")
            .select("lang", "n_docs", "w", keep.alias("keep_copies"))
            .groupBy("lang")
            .agg(F.max("n_docs").cast("bigint").alias("n_docs"),
                 F.round(F.max("w"), 6).alias("weight"),
                 F.sum("keep_copies").cast("bigint").alias("n_resampled")))


_TARGET_SQL = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in MIXTURE_TARGET.items())

QUERIES["curate_mixture_weights"] = (curate_mixture_weights, f"""
WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
total AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM counts),
weights AS (
  SELECT lang, n_docs,
         (CASE lang {_TARGET_SQL} END) * n_total / n_docs AS w
  FROM counts, total),
kept AS (
  SELECT d.lang, w.n_docs, w.w,
         CAST(FLOOR(w.w) AS BIGINT)
         + CASE WHEN CAST(('0x' || SUBSTRING(md5(CAST(d.doc_id AS VARCHAR)),
                                             1, 8)) AS BIGINT) % 1000000
                     < FLOOR((w.w - FLOOR(w.w)) * 1000000)
                THEN 1 ELSE 0 END AS keep_copies
  FROM documents d JOIN weights w USING (lang))
SELECT lang,
       CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       ROUND(MAX(w), 6) AS weight,
       CAST(SUM(keep_copies) AS BIGINT) AS n_resampled
FROM kept
GROUP BY lang
""")


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (A-ES / Efraimidis-Spirakis, exact integer
# form) — sample K docs without replacement with probability proportional
# to an integer weight, deterministically. A-ES keys each item by
# u^(1/w); this engine uses the equivalent identity max(u_1..u_w) ~
# u^(1/w): explode each doc into w hash draws md5(doc_id '#' c), keep the
# per-doc MAX, take the global top-K by that 48-bit integer key. No RNG,
# no floats — the sample is a pure function of doc_id, identical across
# engines, retries, and repartitioning (same determinism contract as
# curate_split). Scale shape: the explode is map-side and bounded by
# max weight (<= 8 copies), the per-doc max is a partial aggregate, and
# the top-K is TakeOrdered — no corpus-sized shuffle, O(n x w) hashes.
# Weights derive from n_chars (longer docs up-weighted), the standard
# quality-weighted sampling recipe.
# ---------------------------------------------------------------------------
SAMPLE_K = 50
MAX_W = 8


def _wkey(doc: Column, c: Column) -> Column:
    """48-bit integer hash draw for copy c of a doc."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws("#", doc.cast("string"), c.cast("string"))),
        1, 12), 16, 10).cast("bigint"))


def curate_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # FLOOR before the cast: Spark's double->bigint cast truncates while
    # DuckDB's rounds, so the division must land on the grid explicitly
    w = (F.least(F.lit(MAX_W).cast("bigint"),
                 F.lit(1) + F.floor(F.col("n_chars") / 64).cast("bigint"))
         .alias("w"))
    drawn = (d.select("doc_id", "lang", w)
             .select("doc_id", "lang", "w",
                     F.explode(F.sequence(F.lit(1), F.col("w")))
                     .alias("c"))
             .select("doc_id", "lang", "w",
                     _wkey(F.col("doc_id"), F.col("c")).alias("draw")))
    keyed = (drawn.groupBy("doc_id", "lang", "w")
             .agg(F.max("draw").alias("skey")))
    return (keyed.orderBy(F.col("skey").desc(), "doc_id")
            .limit(SAMPLE_K))


QUERIES["curate_weighted_sample"] = (curate_weighted_sample, f"""
WITH wt AS (
  SELECT doc_id, lang,
         LEAST({MAX_W}, 1 + CAST(FLOOR(n_chars / 64) AS BIGINT)) AS w
  FROM documents),
drawn AS (
  SELECT doc_id, lang, w,
         CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR) || '#' ||
                                     CAST(c AS VARCHAR)), 1, 12))
              AS BIGINT) AS draw
  FROM (SELECT doc_id, lang, w,
               unnest(generate_series(1, w)) AS c
        FROM wt)),
keyed AS (
  SELECT doc_id, lang, w, MAX(draw) AS skey
  FROM drawn GROUP BY doc_id, lang, w)
SELECT doc_id, lang, w, skey
FROM keyed
ORDER BY skey DESC, doc_id
LIMIT {SAMPLE_K}
""")


# ---------------------------------------------------------------------------
# Token-budget selection — assemble a training mix under a fixed token
# budget per language: rank docs by quality (longest-first here — any
# deterministic score plugs in), take docs while the running token total
# stays under budget. The greedy-knapsack recipe every "data mixing
# under a budget" pipeline runs. One window per lang (cumsum over the
# ranked docs — state per task is one lang's docs), then a per-lang
# rollup; the corpus shuffles once, on the lang key. The budget is an
# absolute token count, so output stays lang-cardinality-sized at any
# sf. Integer tokens + pinned (n_chars DESC, doc_id) order make the
# selected set exact.
# ---------------------------------------------------------------------------
TOKEN_BUDGET = 1500


def curate_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"))
    w = (W.partitionBy("lang")
         .orderBy(F.desc("n_chars"), "doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    ranked = toks.withColumn("cum_tok", F.sum("n_tok").over(w))
    return (ranked.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
                 F.sum((F.col("cum_tok") <= TOKEN_BUDGET).cast("int"))
                 .cast("bigint").alias("n_selected"),
                 F.max(F.when(F.col("cum_tok") <= TOKEN_BUDGET,
                              F.col("cum_tok"))).cast("bigint")
                 .alias("tokens_used")))


QUERIES["curate_token_budget"] = (curate_token_budget, f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
ranked AS (
  SELECT lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang
                          ORDER BY n_chars DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tok
  FROM toks)
SELECT lang,
       COUNT(*) AS n_docs_total,
       CAST(SUM(CASE WHEN cum_tok <= {TOKEN_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_selected,
       CAST(MAX(CASE WHEN cum_tok <= {TOKEN_BUDGET} THEN cum_tok END)
            AS BIGINT) AS tokens_used
FROM ranked
GROUP BY lang
""")


# ---------------------------------------------------------------------------
# Data-quality constraint audit — the Deequ-style gate a production
# corpus pipeline runs before admitting a batch (completeness,
# uniqueness, row-level consistency, domain membership, bounds), as one
# row per declared constraint with the measured metric and a
# pass/fail verdict.
#
# Scale shape: every metric is a SUFFICIENT STATISTIC, so the whole
# audit is ONE partial+final aggregation over the corpus — shuffle
# bytes = one row of counters per map task — followed by a driver-sized
# stack() to the per-constraint layout. COUNT(DISTINCT doc_id) plans as
# the standard two-phase expand+agg (keys shuffle once, pre-combined);
# everything else is pure map-side combine. At 100 TB this is the same
# single pass as the q34 profiler, and adding a constraint costs one
# more counter, not another scan.
#
# Metrics are integer MILLIs (trunc division, Spark `div` == DuckDB
# `//` toward zero) — the audit stays repr-exact cross-engine with no
# float renderings, matching the engine's integer-exact oracle style.
# ---------------------------------------------------------------------------
ALLOWED_LANGS = ("en", "de", "fr", "es", "zh")
LANG_MIN_MILLI = 950          # >= 95% of docs in the allowed language set
MEAN_CHARS_MAX_MILLI = 1_000_000  # mean doc length <= 1000 chars


def curate_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = ", ".join(f"'{lang}'" for lang in ALLOWED_LANGS)
    stats = d.agg(
        F.expr("(1000 * count(text)) div count(*)").alias("completeness"),
        F.expr("(1000 * count(distinct doc_id)) div count(*)")
        .alias("uniqueness"),
        F.expr("(1000 * count(case when length(text) = n_chars then 1 end))"
               " div count(*)").alias("consistency"),
        F.expr(f"(1000 * count(case when lang in ({langs}) then 1 end))"
               " div count(*)").alias("membership"),
        F.expr("1000 * min(n_chars)").alias("min_chars"),
        F.expr("(1000 * sum(n_chars)) div count(*)").alias("mean_chars"))
    return stats.select(F.expr(f"""stack(6,
      'completeness_text_ge', completeness, 1000L,
          if(completeness >= 1000, 1L, 0L),
      'uniqueness_doc_id_ge', uniqueness, 1000L,
          if(uniqueness >= 1000, 1L, 0L),
      'len_consistency_ge', consistency, 1000L,
          if(consistency >= 1000, 1L, 0L),
      'lang_membership_ge', membership, {LANG_MIN_MILLI}L,
          if(membership >= {LANG_MIN_MILLI}, 1L, 0L),
      'min_chars_ge', min_chars, 1000L,
          if(min_chars >= 1000, 1L, 0L),
      'mean_chars_le', mean_chars, {MEAN_CHARS_MAX_MILLI}L,
          if(mean_chars <= {MEAN_CHARS_MAX_MILLI}, 1L, 0L)
    ) as (check_name, metric_milli, threshold_milli, passed)"""))


QUERIES["curate_constraint_audit"] = (curate_constraint_audit, f"""
WITH s AS (
  SELECT (1000 * COUNT(text)) // COUNT(*) AS completeness,
         (1000 * COUNT(DISTINCT doc_id)) // COUNT(*) AS uniqueness,
         (1000 * COUNT(CASE WHEN length(text) = n_chars THEN 1 END))
           // COUNT(*) AS consistency,
         (1000 * COUNT(CASE WHEN lang IN
           ({", ".join(f"'{lang}'" for lang in ALLOWED_LANGS)})
           THEN 1 END)) // COUNT(*) AS membership,
         1000 * MIN(n_chars) AS min_chars,
         (1000 * CAST(SUM(n_chars) AS BIGINT)) // COUNT(*) AS mean_chars
  FROM documents)
SELECT v.c AS check_name,
       CAST(v.m AS BIGINT) AS metric_milli,
       CAST(v.t AS BIGINT) AS threshold_milli,
       CAST(v.p AS BIGINT) AS passed
FROM s, LATERAL (VALUES
  ('completeness_text_ge', completeness, 1000,
     CASE WHEN completeness >= 1000 THEN 1 ELSE 0 END),
  ('uniqueness_doc_id_ge', uniqueness, 1000,
     CASE WHEN uniqueness >= 1000 THEN 1 ELSE 0 END),
  ('len_consistency_ge', consistency, 1000,
     CASE WHEN consistency >= 1000 THEN 1 ELSE 0 END),
  ('lang_membership_ge', membership, {LANG_MIN_MILLI},
     CASE WHEN membership >= {LANG_MIN_MILLI} THEN 1 ELSE 0 END),
  ('min_chars_ge', min_chars, 1000,
     CASE WHEN min_chars >= 1000 THEN 1 ELSE 0 END),
  ('mean_chars_le', mean_chars, {MEAN_CHARS_MAX_MILLI},
     CASE WHEN mean_chars <= {MEAN_CHARS_MAX_MILLI} THEN 1 ELSE 0 END)
  ) AS v(c, m, t, p)
""")


# ---------------------------------------------------------------------------
# Deterministic epoch shard-shuffle — the final step of every training
# pipeline: globally permute the curated corpus and write it as N
# balanced shards so data loaders stream it without any further
# shuffling. RNG-free, like every split in this module: shard and
# within-shard order both derive from md5(seed # doc_id), so the
# permutation is a pure function of (epoch seed, row key) — stable
# across runs, engines, retries, and repartitioning, and a new epoch is
# just a new seed string (no state to coordinate across 1000
# executors).
#
# Scale shape: the writer path is ONE hash exchange —
# ``repartition(N_SHARDS, shard).sortWithinPartitions(shard, okey)`` →
# write (`shard_writer` below, executed + order-pinned by
# tests/test_curation.py) — because the shard key is hash-uniform by
# construction (no skew, no planner salt needed) and the within-shard
# order is a local sort that spills per task, never a global sort. This query is the audit that
# rides the same assignment: per-shard row/byte balance and the order-key
# range, one aggregation, map-side combined.
# ---------------------------------------------------------------------------
N_SHARDS = 16
SHUFFLE_SEED = "epoch0"


def curate_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws("#", F.lit(SHUFFLE_SEED),
                          F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint")
             % N_SHARDS)
    okey = F.conv(F.substring(h, 5, 12), 16, 10).cast("bigint")
    assigned = d.select(shard.alias("shard"), okey.alias("okey"),
                        "lang", "n_chars")
    return (assigned.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.min("okey").alias("first_okey"),
                 F.max("okey").alias("last_okey")))


QUERIES["curate_shard_shuffle"] = (curate_shard_shuffle, f"""
WITH a AS (
  SELECT CAST(('0x' || SUBSTRING(md5('{SHUFFLE_SEED}#'
               || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
           % {N_SHARDS} AS shard,
         CAST(('0x' || SUBSTRING(md5('{SHUFFLE_SEED}#'
               || CAST(doc_id AS VARCHAR)), 5, 12)) AS BIGINT) AS okey,
         lang, n_chars
  FROM documents)
SELECT shard,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(okey) AS first_okey,
       MAX(okey) AS last_okey
FROM a
GROUP BY shard
""")


# ---------------------------------------------------------------------------
# Corpus snapshot drift monitor — compare two corpus snapshots (crawl k
# vs crawl k+1) the way a production data-versioning gate does: per-
# language document-share deltas plus each language's Jensen-Shannon
# divergence contribution. The fixture has one snapshot, so the query
# PLANTS the drift deterministically (the curate_redact recipe): an
# independent hash splits docs into base/current, then the current
# snapshot drops 70% of 'en' — a real distribution shift both engines
# construct identically.
#
# Float discipline (the text_unigram_logprob idiom): shares and JS terms
# are computed per LANGUAGE ROW from exact integer counts — a handful of
# deterministic double ops each, never a float sum across rows — and
# rounded to integer ppm/micro before they leave the row, so the result
# is repr-exact cross-engine. Scale shape: one conditional aggregation
# over the corpus (map-side combined, |langs| groups) + a broadcast of
# the one-row totals; at 100 TB the snapshot flags come from partition
# metadata instead of a hash, and the plan is unchanged.
# ---------------------------------------------------------------------------
DRIFT_BASE_PCT = 50      # independent hash: ~half the docs per snapshot
DRIFT_EN_KEEP_PCT = 30   # current snapshot keeps 30% of its 'en' docs


def curate_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    snapb = _bucket(F.concat_ws("#", F.lit("snap"),
                                F.col("doc_id").cast("string")))
    dropb = _bucket(F.concat_ws("#", F.lit("drop"),
                                F.col("doc_id").cast("string")))
    in_base = snapb < DRIFT_BASE_PCT
    in_cur = (snapb >= DRIFT_BASE_PCT) & (
        (F.col("lang") != "en") | (dropb < DRIFT_EN_KEEP_PCT))
    counts = (d.select("lang",
                       F.when(in_base, 1).otherwise(0).alias("b"),
                       F.when(in_cur, 1).otherwise(0).alias("c"))
              .groupBy("lang")
              .agg(F.sum("b").cast("bigint").alias("n_base"),
                   F.sum("c").cast("bigint").alias("n_cur")))
    totals = counts.agg(F.sum("n_base").cast("bigint").alias("t_base"),
                        F.sum("n_cur").cast("bigint").alias("t_cur"))
    j = counts.crossJoin(F.broadcast(totals))
    p = F.col("n_base") / F.col("t_base")
    q = F.col("n_cur") / F.col("t_cur")
    m = (p + q) / F.lit(2.0)
    js = (F.when(F.col("n_base") > 0, 0.5 * p * F.log(p / m)).otherwise(0.0)
          + F.when(F.col("n_cur") > 0, 0.5 * q * F.log(q / m)).otherwise(0.0))
    return j.select(
        "lang", "n_base", "n_cur",
        F.expr("(1000000 * n_base) div t_base").alias("share_base_ppm"),
        F.expr("(1000000 * n_cur) div t_cur").alias("share_cur_ppm"),
        (F.expr("(1000000 * n_cur) div t_cur")
         - F.expr("(1000000 * n_base) div t_base")).alias("delta_ppm"),
        F.round(js * 1e6, 0).cast("bigint").alias("js_term_micro"))


QUERIES["curate_corpus_drift"] = (curate_corpus_drift, f"""
WITH flags AS (
  SELECT lang,
         CASE WHEN {_bucket_sql("'snap#' || CAST(doc_id AS VARCHAR)")}
                   < {DRIFT_BASE_PCT} THEN 1 ELSE 0 END AS b,
         CASE WHEN {_bucket_sql("'snap#' || CAST(doc_id AS VARCHAR)")}
                   >= {DRIFT_BASE_PCT}
               AND (lang <> 'en' OR
                    {_bucket_sql("'drop#' || CAST(doc_id AS VARCHAR)")}
                    < {DRIFT_EN_KEEP_PCT}) THEN 1 ELSE 0 END AS c
  FROM documents),
counts AS (
  SELECT lang,
         CAST(SUM(b) AS BIGINT) AS n_base,
         CAST(SUM(c) AS BIGINT) AS n_cur
  FROM flags GROUP BY lang),
wt AS (
  SELECT lang, n_base, n_cur,
         CAST(SUM(n_base) OVER () AS BIGINT) AS t_base,
         CAST(SUM(n_cur) OVER () AS BIGINT) AS t_cur
  FROM counts)
SELECT lang, n_base, n_cur,
       (1000000 * n_base) // t_base AS share_base_ppm,
       (1000000 * n_cur) // t_cur AS share_cur_ppm,
       (1000000 * n_cur) // t_cur
         - (1000000 * n_base) // t_base AS delta_ppm,
       CAST(ROUND((CASE WHEN n_base > 0 THEN
                     0.5 * (n_base / t_base)
                         * ln((n_base / t_base) /
                              ((n_base / t_base + n_cur / t_cur) / 2.0))
                   ELSE 0.0 END
                 + CASE WHEN n_cur > 0 THEN
                     0.5 * (n_cur / t_cur)
                         * ln((n_cur / t_cur) /
                              ((n_base / t_base + n_cur / t_cur) / 2.0))
                   ELSE 0.0 END) * 1e6, 0) AS BIGINT) AS js_term_micro
FROM wt
""")


# ---------------------------------------------------------------------------
# Sampled duplicate-rate estimator — before paying for a full-corpus
# dedup at 100 TB, estimate the exact-duplicate share from a content-
# bucket sample. The one design rule that makes the estimate unbiased:
# sample by CONTENT hash, not by row key — a row sample keeps each copy
# independently, so a duplicate PAIR survives only at the squared rate
# and the dup share is underestimated ~1/rate-fold, while a
# content-bucket sample keeps every duplicate class intact or drops it
# whole, so the within-sample dup fraction estimates the corpus dup
# fraction directly. The query measures that argument instead of
# asserting it: both estimators run side by side against the exact
# ground truth (`est_content_ppm` lands near `exact_dup_ppm`;
# `est_rowsample_ppm` collapses toward the squared-survival floor).
#
# The fixture has no exact duplicates at small sf, so the query PLANTS
# them (the curate_redact recipe): docs whose clone-hash bucket < 10%
# are unioned back in as byte-identical copies under fresh doc_ids,
# identically in both engines. The exact columns are the one-time
# validation run a team does before trusting the estimator — affordable
# at fixture scale; the production path runs the content-sample branch
# alone, where the bucket predicate prunes 80% of the corpus before the
# distinct (and pushes to the scan once the digest is a stored column,
# which the dedup ladder's artifact tables already make it).
# ---------------------------------------------------------------------------
CLONE_PCT = 10        # planted duplicate share (one clone per hit)
DUP_SAMPLE_PCT = 20   # sample share for BOTH estimators
# Clones get fresh doc_ids above every real one; a collision would
# silently bias the row-sample estimator (clone and original would
# share an in_rs flag). Fixture doc_ids top out at 5e3 (sf0.1) and grow
# ~linearly in sf, so 1e7 holds to ~sf200; the precondition
# max(doc_id) < CLONE_ID_OFFSET is pinned by the independent-mirror
# test so a fixture change fails loudly instead of skewing the result.
CLONE_ID_OFFSET = 10_000_000


def curate_dup_rate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cloneb = _bucket(F.concat_ws("#", F.lit("clone"),
                                 F.col("doc_id").cast("string")))
    clones = (d.filter(cloneb < CLONE_PCT)
              .select((F.col("doc_id") + CLONE_ID_OFFSET).alias("doc_id"),
                      "text"))
    corpus = d.unionByName(clones)
    flagged = corpus.select(
        "text",
        (_bucket(F.col("text")) < DUP_SAMPLE_PCT).alias("in_cs"),
        (_bucket(F.concat_ws("#", F.lit("row"),
                             F.col("doc_id").cast("string")))
         < DUP_SAMPLE_PCT).alias("in_rs"))
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("text").alias("n_distinct_total"),
        F.sum(F.col("in_cs").cast("int")).cast("bigint").alias("n_cs"),
        F.countDistinct(F.when(F.col("in_cs"), F.col("text")))
        .alias("nd_cs"),
        F.sum(F.col("in_rs").cast("int")).cast("bigint").alias("n_rs"),
        F.countDistinct(F.when(F.col("in_rs"), F.col("text")))
        .alias("nd_rs"))
    return agg.select(
        "n_total",
        F.expr("n_total - n_distinct_total").alias("dup_total"),
        "n_cs", "n_rs",
        F.expr("(1000000 * (n_total - n_distinct_total)) div n_total")
        .alias("exact_dup_ppm"),
        F.expr("case when n_cs > 0 then"
               " (1000000 * (n_cs - nd_cs)) div n_cs else 0 end")
        .alias("est_content_ppm"),
        F.expr("case when n_rs > 0 then"
               " (1000000 * (n_rs - nd_rs)) div n_rs else 0 end")
        .alias("est_rowsample_ppm"))


QUERIES["curate_dup_rate_estimate"] = (curate_dup_rate_estimate, f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CLONE_ID_OFFSET} AS doc_id, text FROM documents
  WHERE {_bucket_sql("'clone#' || CAST(doc_id AS VARCHAR)")} < {CLONE_PCT}),
flagged AS (
  SELECT text,
         {_bucket_sql('text')} < {DUP_SAMPLE_PCT} AS in_cs,
         {_bucket_sql("'row#' || CAST(doc_id AS VARCHAR)")}
           < {DUP_SAMPLE_PCT} AS in_rs
  FROM corpus),
agg AS (
  SELECT COUNT(*) AS n_total,
         COUNT(DISTINCT text) AS n_distinct_total,
         CAST(SUM(CASE WHEN in_cs THEN 1 ELSE 0 END) AS BIGINT) AS n_cs,
         COUNT(DISTINCT CASE WHEN in_cs THEN text END) AS nd_cs,
         CAST(SUM(CASE WHEN in_rs THEN 1 ELSE 0 END) AS BIGINT) AS n_rs,
         COUNT(DISTINCT CASE WHEN in_rs THEN text END) AS nd_rs
  FROM flagged)
SELECT n_total,
       n_total - n_distinct_total AS dup_total,
       n_cs, n_rs,
       (1000000 * (n_total - n_distinct_total)) // n_total
         AS exact_dup_ppm,
       CASE WHEN n_cs > 0 THEN (1000000 * (n_cs - nd_cs)) // n_cs
            ELSE 0 END AS est_content_ppm,
       CASE WHEN n_rs > 0 THEN (1000000 * (n_rs - nd_rs)) // n_rs
            ELSE 0 END AS est_rowsample_ppm
FROM agg
""")


def shard_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE path the `curate_shard_shuffle` audit describes,
    returned un-executed so callers (tests, jobs) can `.write` it:
    one hash exchange on the deterministic shard assignment, then a
    LOCAL per-task sort on (shard, okey) — never a global range sort
    (a corpus-sized `orderBy` would sample the corpus to build a range
    partitioner and is not what a shard writer needs). Sorting shard
    FIRST matters: it satisfies the dynamic-partition writer's required
    ordering, so `.write.partitionBy("shard")` reuses this sort instead
    of inserting its own shard-only sort (whose radix sorter is NOT
    stable and would scramble okey order inside each shard). Each shard
    hashes wholly into one task, so the write emits exactly one file
    per shard. Plan shape (single Exchange, `Sort [...], false` =
    global=false) is pinned by tests/test_curation.py."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws("#", F.lit(SHUFFLE_SEED),
                          F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint")
             % N_SHARDS)
    okey = F.conv(F.substring(h, 5, 12), 16, 10).cast("bigint")
    return (d.select("doc_id", "lang", "n_chars",
                     shard.alias("shard"), okey.alias("okey"))
            .repartition(N_SHARDS, F.col("shard"))
            .sortWithinPartitions("shard", "okey"))
