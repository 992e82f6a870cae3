"""Ridge normal-equations trainer: the distributed sufficient statistics
and the end-to-end predictions must match an in-memory numpy ridge on
the same fixture (within the 1e-6 quantization grid the Gram cells use),
and be invariant to partitioning — the property the integer-micros
design exists to guarantee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from big_data_science_project_spark.operators.linear import (
    DIM, RIDGE_L2, SCALE, ml_gram_matrix, ml_ridge_predict, ridge_fit)

SF = "/root/testdata/sf0.001"


def _fixture_xy():
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    return X, y


def test_gram_matches_quantized_numpy(spark):
    X, y = _fixture_xy()
    got = {(r.i, r.j): r.cell_micros
           for r in ml_gram_matrix(spark, SF).collect()}
    gq = np.floor(X[:, :, None] * X[:, None, :] * SCALE + 0.5) \
           .astype(np.int64).sum(axis=0)
    xty = np.floor(X * y[:, None] * SCALE + 0.5).astype(np.int64).sum(axis=0)
    iu, ju = np.triu_indices(DIM)
    assert len(got) == len(iu) + DIM
    for i, j in zip(iu, ju):
        assert got[(int(i), int(j))] == gq[i, j]
    for i in range(DIM):
        assert got[(i, -1)] == xty[i]


def test_gram_is_partitioning_invariant(spark):
    """Integer sums are associative: any repartitioning yields the same
    cells. (A double-sum design would fail this.)"""
    from big_data_science_project_spark.operators.linear import _partial_gram
    from big_data_science_project_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings").select("embedding", "label")
    import pyspark.sql.functions as F

    def cells(df):
        return {(r.i, r.j): r.cell_micros for r in
                df.mapInPandas(_partial_gram, "i int, j int, cell_micros bigint")
                  .groupBy("i", "j").agg(F.sum("cell_micros").alias("cell_micros"))
                  .collect()}

    assert cells(e.repartition(1)) == cells(e.repartition(7))


def test_ridge_predictions_match_numpy(spark):
    X, y = _fixture_xy()
    # numpy model on the SAME quantized statistics the engine uses
    w = ridge_fit(spark, SF)
    preds = {r.vec_id: r.pred for r in ml_ridge_predict(spark, SF).collect()}
    expect = X @ w
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    for vid, e in zip(pdf["vec_id"], expect):
        assert abs(preds[int(vid)] - round(float(e), 6)) <= 1e-6
    # optimality sanity: ridge training loss beats the zero predictor
    # (guaranteed by the objective; the fixture labels carry no linear
    # signal, so the mean-baseline would not be)
    rmse = float(np.sqrt(np.mean((expect - y) ** 2)))
    zero = float(np.sqrt(np.mean(y ** 2)))
    assert rmse < zero


def test_ridge_weights_close_to_unquantized(spark):
    """Quantization at 1e-6 must not move the solution materially."""
    X, y = _fixture_xy()
    w = ridge_fit(spark, SF)
    w_exact = np.linalg.solve(X.T @ X + RIDGE_L2 * np.eye(DIM), X.T @ y)
    assert float(np.max(np.abs(w - w_exact))) < 1e-3


def test_pca_spectrum_matches_numpy(spark):
    from big_data_science_project_spark.operators.linear import (
        PCA_TOP_K, ml_pca_spectrum)

    X, _ = _fixture_xy()
    got = {r.component: (r.eigenvalue, r.explained_frac)
           for r in ml_pca_spectrum(spark, SF).collect()}
    gq = np.floor(X[:, :, None] * X[:, None, :] * SCALE + 0.5) \
           .astype(np.int64).sum(axis=0) / SCALE
    evals = np.linalg.eigvalsh(gq / len(X))[::-1][:PCA_TOP_K]
    total = float(np.trace(gq) / len(X))
    assert len(got) == PCA_TOP_K
    for k, v in enumerate(evals):
        assert abs(got[k][0] - round(float(v), 6)) <= 1e-6
        assert abs(got[k][1] - round(float(v / total), 6)) <= 1e-6
    # spectrum is sorted and fractions are sane
    vals = [got[k][0] for k in range(PCA_TOP_K)]
    assert vals == sorted(vals, reverse=True)
    assert 0 < sum(f for _, f in got.values()) <= 1.0 + 1e-9
