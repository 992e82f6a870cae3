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
