"""Retraction/excision lifecycle for the persisted ingest artifacts
(r9 verdict item 5). The ingest story handled only ADDITIONS
(lm_incremental_refresh, bloom OR-in, batch-vs-index); a real
training-data pipeline must also EXCISE documents — takedowns,
contamination — from every derived structure WITHOUT retraining from
the corpus. ``excised_artifacts`` applies one excision set D to every
persisted artifact family, each by the cheapest sound mechanism its
representation allows:

  digests    a digest may be removed only if NO survivor shares it,
             which the (dg)-only exact-tier table cannot answer — so
             the index ALSO persists (doc_id, dg) provenance pairs
             (dedup.py _index_artifacts), and excision is a pure
             anti-join delete on doc_id + re-collapse to distinct dg:
             digest-table-sized, never a survivor corpus scan (the
             exact tier keeps its collapsed table untouched)
  shingles   per-doc provenance retained → pure broadcast anti-join
  bands      delete on doc_id (same anti-join). Sound but lossy-safe:
             a bucket the build-time cap (LSH_MAX_BUCKET) dropped
             entirely cannot be resurrected by deleting members —
             delete-only excision may UNDER-recall on previously
             over-cap buckets until the periodic artifact rebuild,
             but it never creates a false candidate. The oracle
             mirrors exactly these semantics (cap over the FULL index,
             then delete), so the equality claim is about what the
             operator promises, not a fixture accident.
  LM c12     DECREMENT: D's bigram counts (one batch-scale scan of
             the excised docs only) subtracted from the persisted
             counts; rows reaching zero drop. c1 re-derives from the
             decremented c12 (sum over w2 — LM-sized, never corpus).
  LM vocab   DECREMENT, exactly like c12 (r10 verdict item 4): the
             persisted wdoc table keeps (lang, w, doc_count) — in how
             many documents of this language token w appears — so
             excision subtracts D's own doc counts (one scan of the
             excised docs) and drops rows reaching zero; per-language
             vocab sizes re-derive as row counts and the global vocab
             as a distinct count over the vocab-sized table. No
             survivor-shard rescan at any corpus size.
  ANN        delete on vec_id against the centroid_id-PARTITIONED
             index — at scale only the cells holding an excised
             vector are rewritten (partition-pruned delete); the
             codebook is deliberately NOT retrained (assignment of
             every survivor is unchanged; codebook refresh is the
             periodic rebuild lifecycle, like the bloom below).
  bloom      bits cannot subtract — a bloom over the excised digest
             set must be REBUILT, and that is the design argument for
             keeping gate state derivable from the digest artifact:
             the rebuilt gate's key set is exactly digests-after
             (the ``digests`` report row IS the rebuild's input size).

Correctness contract (the lm_incremental_refresh pattern, inverted):
``lm_excise_rescore`` scores the standard probe batch against the
DECREMENTED tables while its DuckDB oracle RETRAINS from scratch on
corpus∖D — the hash match is the decrement≡retrain proof.
``artifact_excise`` value-oracles the row-level deletions (counts per
family plus content sums where the family carries counts).

Excision set D: index-side docs with ``lang='en' AND doc_id % 7 = 3``
(single-language on purpose — the vocab recount must exercise BOTH
the recounted-language branch and the carried-over branch), and index
vectors with ``vec_id % 7 = 3`` (the embeddings fixture has no
doc→vector mapping; a production takedown would follow it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .curation import _bucket, _bucket_sql
from .dedup import INDEX_PCT

QUERIES: dict = {}

EXCISE_LANG = "en"
EXCISE_MOD, EXCISE_RES = 7, 3
_EXC_DOC_SQL = f"lang = '{EXCISE_LANG}' AND doc_id % {EXCISE_MOD} = {EXCISE_RES}"
_EXC_VEC_SQL = f"vec_id % {EXCISE_MOD} = {EXCISE_RES}"


def _doc_excised() -> F.Column:
    return (F.col("lang") == EXCISE_LANG) & \
        (F.col("doc_id") % EXCISE_MOD == EXCISE_RES)


def excised_artifacts(spark: SparkSession, sf_dir: str) -> str:
    """Write-once excised copies of every artifact family (shared
    lifecycle — sources/tables.write_once_artifacts)."""
    from ..sources.tables import write_once_artifacts
    from .dedup import _index_artifacts
    from .similarity import ann_artifacts
    from .text import _lm_tables, _wdoc_counts, lm_artifacts

    def build(root: str) -> None:
        dd_root = _index_artifacts(spark, sf_dir)
        lm_root = lm_artifacts(spark, sf_dir)
        an_root = ann_artifacts(spark, sf_dir)
        idx = (load_table(spark, sf_dir, "documents")
               .filter(_bucket(F.col("doc_id")) < INDEX_PCT))
        exc = idx.filter(_doc_excised())
        surv = idx.filter(~_doc_excised())
        exc_ids = exc.select("doc_id")

        # digests: delete provenance pairs by doc_id, then re-collapse —
        # digest-table-sized, never a survivor corpus scan (the index
        # stores (doc_id, dg) pairs exactly for this)
        (spark.read.parquet(f"{dd_root}/digest_pairs")
         .join(F.broadcast(exc_ids), "doc_id", "left_anti")
         .select("dg").distinct()
         .write.mode("overwrite").parquet(f"{root}/digests"))
        # shingles / bands: pure deletes on retained provenance; the
        # excised id set is takedown-sized, hence the broadcast hint
        for sub in ("shingles", "bands"):
            (spark.read.parquet(f"{dd_root}/{sub}")
             .join(F.broadcast(exc_ids), "doc_id", "left_anti")
             .write.mode("overwrite").parquet(f"{root}/{sub}"))

        # LM decrement: D's own counts, one scan of the EXCISED docs
        d12 = _lm_tables(exc)[0].withColumnRenamed("c12", "d12")
        c12_x = (spark.read.parquet(f"{lm_root}/c12")
                 .join(d12, ["lang", "w1", "w2"], "left")
                 .select("lang", "w1", "w2",
                         (F.col("c12") - F.coalesce("d12", F.lit(0)))
                         .cast("bigint").alias("c12"))
                 .filter(F.col("c12") > 0))
        c12_x.write.mode("overwrite").parquet(f"{root}/c12")
        (spark.read.parquet(f"{root}/c12")
         .groupBy("lang", "w1")
         .agg(F.sum("c12").cast("bigint").alias("c1"))
         .write.mode("overwrite").parquet(f"{root}/c1"))
        # vocab: DECREMENT the persisted (lang, w, doc_count) table by
        # D's own doc counts — one scan of the EXCISED docs only, the
        # exact c12 discipline (r10 verdict item 4). Rows reaching zero
        # drop (no survivor uses the token); unaffected languages'
        # rows pass through untouched because D contributes no counts
        # for them. No survivor-shard rescan at ANY corpus size — the
        # decrement reads D plus two vocab-sized tables.
        d_wdoc = _wdoc_counts(exc).withColumnRenamed("doc_count", "dc")
        wdoc_x = (spark.read.parquet(f"{lm_root}/wdoc")
                  .join(F.broadcast(d_wdoc), ["lang", "w"], "left")
                  .select("lang", "w",
                          (F.col("doc_count") - F.coalesce("dc", F.lit(0)))
                          .cast("bigint").alias("doc_count"))
                  .filter(F.col("doc_count") > 0))
        wdoc_x.write.mode("overwrite").parquet(f"{root}/wdoc")
        (spark.read.parquet(f"{root}/wdoc")
         .groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("v"))
         .write.mode("overwrite").parquet(f"{root}/vocab"))
        (spark.read.parquet(f"{root}/wdoc")
         .agg(F.countDistinct("w").alias("gv"))
         .write.mode("overwrite").parquet(f"{root}/gvocab"))

        # ANN: partition-pruned row delete, codebook untouched
        (spark.read.parquet(f"{an_root}/assigned")
         .filter(~F.expr(_EXC_VEC_SQL))
         .write.mode("overwrite").partitionBy("centroid_id")
         .parquet(f"{root}/assigned"))

    return write_once_artifacts(spark, "_bdsp_excised", sf_dir,
                                "excised_", build)


def _fam(name: str, before: DataFrame, after: DataFrame,
         content: F.Column | None = None) -> DataFrame:
    cs = (after.agg(F.count(F.lit(1)).alias("_na"),
                    content.cast("bigint").alias("content_sum"))
          if content is not None else
          after.agg(F.count(F.lit(1)).alias("_na"),
                    F.lit(None).cast("bigint").alias("content_sum")))
    return (before.agg(F.count(F.lit(1)).alias("_nb")).crossJoin(cs)
            .select(F.lit(name).alias("artifact"),
                    F.col("_nb").cast("bigint").alias("n_before"),
                    (F.col("_nb") - F.col("_na")).cast("bigint")
                    .alias("n_removed"),
                    F.col("_na").cast("bigint").alias("n_after"),
                    "content_sum"))


def artifact_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-family excision report: rows before/removed/after plus a
    content checksum where the family carries counts. The ``digests``
    row doubles as the bloom-rebuild input size (bits can't subtract;
    the gate rebuilds over digests-after — module docstring)."""
    from .dedup import _index_artifacts
    from .similarity import ann_artifacts
    from .text import lm_artifacts

    x = excised_artifacts(spark, sf_dir)
    dd = _index_artifacts(spark, sf_dir)
    lm = lm_artifacts(spark, sf_dir)
    an = ann_artifacts(spark, sf_dir)
    rd = spark.read.parquet
    fams = [
        _fam("ann_vectors", rd(f"{an}/assigned"), rd(f"{x}/assigned"),
             F.sum("centroid_id")),
        _fam("bands", rd(f"{dd}/bands"), rd(f"{x}/bands")),
        _fam("digests", rd(f"{dd}/digests"), rd(f"{x}/digests")),
        _fam("lm_c1", rd(f"{lm}/c1"), rd(f"{x}/c1"), F.sum("c1")),
        _fam("lm_c12", rd(f"{lm}/c12"), rd(f"{x}/c12"), F.sum("c12")),
        _fam("lm_gvocab", rd(f"{lm}/gvocab"), rd(f"{x}/gvocab"),
             F.sum("gv")),
        _fam("lm_vocab", rd(f"{lm}/vocab"), rd(f"{x}/vocab"), F.sum("v")),
        _fam("lm_wdoc", rd(f"{lm}/wdoc"), rd(f"{x}/wdoc"),
             F.sum("doc_count")),
        _fam("shingles", rd(f"{dd}/shingles"), rd(f"{x}/shingles")),
    ]
    out = fams[0]
    for f_ in fams[1:]:
        out = out.unionByName(f_)
    return out.orderBy("artifact")


def lm_excise_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decrement≡retrain proof (lm_incremental_refresh inverted):
    score the standard probe batch against the DECREMENTED LM tables;
    the oracle retrains from scratch on corpus∖D. A hash match means
    the excision left the model exactly as if D had never been
    ingested — including the recounted affected-language vocabulary
    and the merged global vocabulary."""
    from .text import _score_against_lm, lm_skew_split

    x = excised_artifacts(spark, sf_dir)
    rd = spark.read.parquet
    batch = (load_table(spark, sf_dir, "documents")
             .filter(_bucket(F.col("doc_id")) >= INDEX_PCT))
    return _score_against_lm(batch, rd(f"{x}/c12"), rd(f"{x}/c1"),
                             rd(f"{x}/vocab"), rd(f"{x}/gvocab"),
                             skew_split=lm_skew_split(sf_dir))


def _excise_report_sql() -> str:
    from .dedup import (_HASHED_SHINGLES_SQL, LSH_MAX_BUCKET,
                        _minhash_bands_sql)
    from .similarity import _TRAINED_ASSIGNED_SQL, _trained_cents_sql

    hashed_idx = _HASHED_SHINGLES_SQL.replace(
        "FROM documents",
        f"FROM documents WHERE {_bucket_sql('doc_id')} < {INDEX_PCT}"
    ).replace("WHERE len", "AND len")
    # the Lloyd's chain (_trained_cents_sql) owns CTE names pts/c0..cN;
    # LM CTEs here are prefixed lm_* to stay clear of its c1/c2
    return f"""
WITH {_trained_cents_sql()},
{_TRAINED_ASSIGNED_SQL},
idx AS (SELECT * FROM documents
        WHERE {_bucket_sql('doc_id')} < {INDEX_PCT}),
surv AS (SELECT * FROM idx WHERE NOT ({_EXC_DOC_SQL})),
exc_ids AS (SELECT doc_id FROM idx WHERE {_EXC_DOC_SQL}),
hashed AS ({hashed_idx}),
sh_after AS (SELECT * FROM hashed
             WHERE doc_id NOT IN (SELECT doc_id FROM exc_ids)),
bands_all AS ({_minhash_bands_sql("hashed")}),
bands_capped AS (
  SELECT * FROM bands_all
  QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_key)
          <= {LSH_MAX_BUCKET}),
bands_after AS (SELECT * FROM bands_capped
                WHERE doc_id NOT IN (SELECT doc_id FROM exc_ids)),
lm_ib_b AS (
  SELECT lang, b.w1 AS w1, b.w2 AS w2 FROM idx,
    LATERAL (SELECT unnest({{bigrams}}, recursive := true)) b),
lm_ib_a AS (
  SELECT lang, b.w1 AS w1, b.w2 AS w2 FROM surv,
    LATERAL (SELECT unnest({{bigrams}}, recursive := true)) b),
lm_c12_b AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM lm_ib_b
             GROUP BY 1, 2, 3),
lm_c12_a AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM lm_ib_a
             GROUP BY 1, 2, 3),
lm_c1_b AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1
            FROM lm_c12_b GROUP BY 1, 2),
lm_c1_a AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1
            FROM lm_c12_a GROUP BY 1, 2),
lm_toks_b AS (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM idx),
lm_toks_a AS (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM surv),
lm_vocab_b AS (SELECT lang, COUNT(DISTINCT w) AS v FROM lm_toks_b
               GROUP BY lang),
lm_vocab_a AS (SELECT lang, COUNT(DISTINCT w) AS v FROM lm_toks_a
               GROUP BY lang),
lm_wd_b AS (SELECT lang, w, COUNT(DISTINCT doc_id) AS dc
            FROM (SELECT lang, doc_id,
                         unnest(string_split(text, ' ')) AS w FROM idx)
            GROUP BY 1, 2),
lm_wd_a AS (SELECT lang, w, COUNT(DISTINCT doc_id) AS dc
            FROM (SELECT lang, doc_id,
                         unnest(string_split(text, ' ')) AS w FROM surv)
            GROUP BY 1, 2),
ann_b AS (SELECT vec_id, centroid_id FROM assigned
          WHERE {_bucket_sql('vec_id')} < {INDEX_PCT}),
ann_a AS (SELECT * FROM ann_b WHERE NOT ({_EXC_VEC_SQL})),
counts(artifact, n_before, n_after, content_sum) AS (
  SELECT 'ann_vectors', (SELECT COUNT(*) FROM ann_b),
         (SELECT COUNT(*) FROM ann_a),
         (SELECT CAST(SUM(centroid_id) AS BIGINT) FROM ann_a)
  UNION ALL SELECT 'bands', (SELECT COUNT(*) FROM bands_capped),
         (SELECT COUNT(*) FROM bands_after), NULL
  UNION ALL SELECT 'digests',
         (SELECT COUNT(DISTINCT md5(text)) FROM idx),
         (SELECT COUNT(DISTINCT md5(text)) FROM surv), NULL
  UNION ALL SELECT 'lm_c1', (SELECT COUNT(*) FROM lm_c1_b),
         (SELECT COUNT(*) FROM lm_c1_a),
         (SELECT CAST(SUM(c1) AS BIGINT) FROM lm_c1_a)
  UNION ALL SELECT 'lm_c12', (SELECT COUNT(*) FROM lm_c12_b),
         (SELECT COUNT(*) FROM lm_c12_a),
         (SELECT CAST(SUM(c12) AS BIGINT) FROM lm_c12_a)
  UNION ALL SELECT 'lm_gvocab', 1, 1,
         (SELECT COUNT(DISTINCT w) FROM lm_toks_a)
  UNION ALL SELECT 'lm_vocab', (SELECT COUNT(*) FROM lm_vocab_b),
         (SELECT COUNT(*) FROM lm_vocab_a),
         (SELECT CAST(SUM(v) AS BIGINT) FROM lm_vocab_a)
  UNION ALL SELECT 'lm_wdoc', (SELECT COUNT(*) FROM lm_wd_b),
         (SELECT COUNT(*) FROM lm_wd_a),
         (SELECT CAST(SUM(dc) AS BIGINT) FROM lm_wd_a)
  UNION ALL SELECT 'shingles', (SELECT COUNT(*) FROM hashed),
         (SELECT COUNT(*) FROM sh_after), NULL)
SELECT artifact, CAST(n_before AS BIGINT) AS n_before,
       CAST(n_before - n_after AS BIGINT) AS n_removed,
       CAST(n_after AS BIGINT) AS n_after,
       CAST(content_sum AS BIGINT) AS content_sum
FROM counts ORDER BY artifact
"""


def _register() -> None:
    from .text import _BIGRAMS_DUCK, _lm_perplexity_sql

    QUERIES["artifact_excise"] = (
        artifact_excise,
        _excise_report_sql().replace("{bigrams}", _BIGRAMS_DUCK))
    QUERIES["lm_excise_rescore"] = (
        lm_excise_rescore,
        _lm_perplexity_sql(INDEX_PCT, f"AND NOT ({_EXC_DOC_SQL})"))


_register()
