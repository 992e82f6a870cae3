"""Distributed linear-model training over ``embeddings`` — ridge
regression by single-pass normal equations, the one-scan pattern that
scales to 100 TB (reference has no trainable model beyond per-image
KMeans, ``image_masking.py:116-138``; this is the engine-mandated ML
surface for tabular/embedding features).

Shape: each task computes its partition's partial Gram matrix
``X^T X`` and moment vector ``X^T y`` with one ``np.einsum`` per Arrow
batch (``mapInPandas``); the shuffle then carries only
``partitions x D(D+1)/2`` partial cells — never the rows. The D×D solve
happens driver-side (``np.linalg.solve`` on a 64×64 system — index-build
time, like IVF centroids). That is exactly how large-scale closed-form
models (ridge, OLS, covariance/PCA) are trained on clusters.

Cross-engine exactness: float sums are order-dependent, so partial
aggregation would not be oracle-reproducible in doubles. Instead every
per-row product is quantized to integer MICROS first —
``floor(x_i·x_j·1e6 + 0.5)`` — and int64 sums are associative and
exact at any partitioning. Both engines evaluate the identical IEEE
double expression before the floor, so each quantized cell matches
bit-for-bit. |x_i·x_j| ≤ ~1e2 and n ≤ 1e7 keeps the int64 far from
overflow at any tested SF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}

DIM = 64
SCALE = 1_000_000.0
RIDGE_L2 = 1.0


def _partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        m = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        y = pdf["label"].to_numpy(dtype=np.float64)
        # per-row quantized products, THEN the exact integer sum
        gq = np.floor(m[:, :, None] * m[:, None, :] * SCALE + 0.5) \
               .astype(np.int64).sum(axis=0)                    # D×D
        xty = np.floor(m * y[:, None] * SCALE + 0.5) \
                .astype(np.int64).sum(axis=0)                   # D
        iu, ju = np.triu_indices(DIM)
        yield pd.DataFrame({
            "i": np.concatenate([iu, np.arange(DIM)]),
            "j": np.concatenate([ju, np.full(DIM, -1)]),
            "cell_micros": np.concatenate([gq[iu, ju], xty]),
        })


def ml_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, cell_micros): upper-triangle X^T X cells, plus X^T y as
    j = -1 rows — the complete sufficient statistics for ridge/OLS."""
    e = load_table(spark, sf_dir, "embeddings").select("embedding", "label")
    partials = e.mapInPandas(
        _partial_gram, "i int, j int, cell_micros bigint")
    return (partials.groupBy("i", "j")
            .agg(F.sum("cell_micros").alias("cell_micros")))


QUERIES["ml_gram_matrix"] = (ml_gram_matrix, f"""
WITH idx AS (SELECT unnest(generate_series(1, {DIM})) AS i)
SELECT a.i - 1 AS i, b.i - 1 AS j,
       CAST(SUM(CAST(floor(CAST(e.embedding[a.i] AS DOUBLE)
                           * CAST(e.embedding[b.i] AS DOUBLE)
                           * {SCALE} + 0.5) AS BIGINT)) AS BIGINT)
         AS cell_micros
FROM embeddings e, idx a, idx b
WHERE a.i <= b.i
GROUP BY a.i, b.i
UNION ALL
SELECT i - 1 AS i, -1 AS j,
       CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * label
                           * {SCALE} + 0.5) AS BIGINT)) AS BIGINT)
FROM embeddings, idx
GROUP BY i
""")


def ridge_fit(spark: SparkSession, sf_dir: str,
              l2: float = RIDGE_L2) -> np.ndarray:
    """Solve (X^T X + λI) w = X^T y from the distributed sufficient
    statistics; the only driver-side math is the 64×64 solve."""
    rows = ml_gram_matrix(spark, sf_dir).collect()
    xtx = np.zeros((DIM, DIM))
    xty = np.zeros(DIM)
    for r in rows:
        if r.j == -1:
            xty[r.i] = r.cell_micros / SCALE
        else:
            xtx[r.i, r.j] = xtx[r.j, r.i] = r.cell_micros / SCALE
    return np.linalg.solve(xtx + l2 * np.eye(DIM), xty)


def ml_ridge_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the corpus with the fitted weights: one broadcast of the
    64-float weight vector, one map-side pandas UDF pass — train is a
    scan, predict is a scan, nothing else moves. Rows-only (the solve is
    not SQL-expressible); tests/test_linear.py pins predictions against
    an in-memory numpy ridge on the same fixture."""
    w = ridge_fit(spark, sf_dir)

    @F.pandas_udf("double")
    def score(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series(np.zeros(0))
        m = np.asarray(emb.tolist(), dtype=np.float64)
        return pd.Series(m @ w)

    e = load_table(spark, sf_dir, "embeddings")
    return (e.select("vec_id", "label",
                     F.round(score("embedding"), 6).alias("pred"))
            .withColumn("abs_err",
                        F.round(F.abs(F.col("pred") - F.col("label")), 6)))


QUERIES["ml_ridge_predict"] = (ml_ridge_predict, None)  # rows-only


# ---------------------------------------------------------------------------
# PCA spectrum from the same sufficient statistics: the Gram matrix IS
# the one-pass input to covariance/PCA, so the eigen-decomposition is
# another driver-side solve over the distributed cells — zero additional
# corpus passes when composed with ridge (shared ml_gram_matrix plan).
# Rows-only (eigen solve is not SQL-expressible); tests pin against
# numpy on the fixture.
# ---------------------------------------------------------------------------
PCA_TOP_K = 8


def ml_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = ml_gram_matrix(spark, sf_dir).collect()
    xtx = np.zeros((DIM, DIM))
    for r in rows:
        if r.j >= 0:
            xtx[r.i, r.j] = xtx[r.j, r.i] = r.cell_micros / SCALE
    n = load_table(spark, sf_dir, "embeddings").count()
    evals = np.linalg.eigvalsh(xtx / n)[::-1][:PCA_TOP_K]
    total = float(np.trace(xtx) / n)
    out = [(k, round(float(v), 6), round(float(v / total), 6))
           for k, v in enumerate(evals)]
    return spark.createDataFrame(
        out, "component int, eigenvalue double, explained_frac double")


QUERIES["ml_pca_spectrum"] = (ml_pca_spectrum, None)  # rows-only
