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
    DIM, RIDGE_L2, SCALE, ml_gram_matrix, ridge_fit, ridge_predict_full)

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
    preds = {r.vec_id: r.pred
             for r in ridge_predict_full(spark, SF).collect()}
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
        PCA_TOP_K, pca_spectrum_full)

    X, _ = _fixture_xy()
    got = {r.component: (r.eigenvalue, r.explained_frac)
           for r in pca_spectrum_full(spark, SF).collect()}
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


def _feats3_numpy():
    """The engine's 3-feature quantization, mirrored independently:
    micros via HALF_UP away from zero (Spark ROUND / DuckDB ROUND)."""
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    E = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)[:, :3]
    xm = (np.sign(E) * np.floor(np.abs(E) * 1e6 + 0.5)).astype(np.int64)
    y = pdf["label"].to_numpy(dtype=np.int64)
    return pdf["vec_id"].to_numpy(), xm, y


def test_ridge3_inplan_matches_numpy_solve(spark):
    """The oracled in-plan ridge must agree with an INDEPENDENT numpy
    model built from the same quantized statistics (LAPACK solve, not
    cofactors — oracle equality alone cannot catch a wrong cofactor
    mirrored into the SQL; this can)."""
    from big_data_science_project_spark.operators.linear import (
        RIDGE_L2 as L2, ml_ridge_predict)

    vid, xm, y = _feats3_numpy()
    G = (xm.T @ xm).astype(np.float64) / 1e12
    b = (xm.T @ y).astype(np.float64) / 1e6
    w = np.linalg.solve(G + L2 * np.eye(3), b)
    wm = (np.sign(w) * np.floor(np.abs(w) * 1e6 + 0.5)).astype(np.int64)
    pred = (xm @ wm) / 1e12

    got = {r.vec_id: (r.pred, r.abs_err)
           for r in ml_ridge_predict(spark, SF).collect()}
    assert len(got) == len(vid)
    # cofactor vs LAPACK weight rounding can differ by 1 micro per
    # weight → ≤ 3e-6-ish drift in a prediction on |x| ≤ ~1 features
    for v, p, yy in zip(vid, pred, y):
        gp, ge = got[int(v)]
        assert abs(gp - round(float(p), 6)) <= 5e-6, (v, gp, p)
        assert abs(ge - abs(gp - yy)) <= 1e-6


def test_pca3_inplan_matches_numpy_eigvalsh(spark):
    """The closed-form 3×3 spectrum must agree with LAPACK eigvalsh on
    the same quantized second-moment matrix — pins the trigonometric
    formula independently of the (algebra-mirroring) oracle."""
    from big_data_science_project_spark.operators.linear import (
        ml_pca_spectrum)

    _, xm, _ = _feats3_numpy()
    A = (xm.T @ xm).astype(np.float64) / 1e12 / len(xm)
    evals = np.linalg.eigvalsh(A)[::-1]
    tr = float(np.trace(A))

    rows = {r.component: (r.eigenvalue, r.explained_frac)
            for r in ml_pca_spectrum(spark, SF).collect()}
    assert sorted(rows) == [0, 1, 2]
    for k in range(3):
        assert abs(rows[k][0] - round(float(evals[k]), 6)) <= 2e-6, k
        assert abs(rows[k][1] - round(float(evals[k] / tr), 6)) <= 2e-6, k
    vals = [rows[k][0] for k in range(3)]
    assert vals == sorted(vals, reverse=True)


def test_logreg_irls_matches_numpy_mirror(spark):
    """The two quantized IRLS steps must equal an independent numpy
    implementation of the same quantized recurrence (guards the in-plan
    3x3 cofactor solve — a wrong cofactor term mirrored into the oracle
    is invisible to oracle equality, which is exactly how a live review
    caught one; this mirror can't share that bug), and the final weights
    must be a genuine Newton step: re-deriving step 2 from the step-1
    weights with unquantized float IRLS lands within the quantization
    grid."""
    from big_data_science_project_spark.operators.linear import (
        ml_logreg_irls)

    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    y = (pdf["label"].to_numpy() % 2).astype(np.float64)
    E = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    x1m = np.round(E[:, 0] * 1e6).astype(np.int64)
    x2m = np.round(E[:, 1] * 1e6).astype(np.int64)
    x1, x2 = x1m / 1e6, x2m / 1e6
    X = np.stack([np.ones_like(x1), x1, x2], axis=1)

    def step(pd_):
        wgt = pd_ * (1 - pd_)
        r = y - pd_
        # HALF_UP away from zero like Spark round / DuckDB ROUND —
        # np.round is half-to-even and floor(v+0.5) rounds negative
        # halves toward +inf; both diverge at .5 micro boundaries
        q = lambda v: (np.sign(v)
                       * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)
        H = np.array([
            [q(wgt).sum(), q(x1 * wgt).sum(), q(x2 * wgt).sum()],
            [q(x1 * wgt).sum(), q(x1 * x1 * wgt).sum(),
             q(x1 * x2 * wgt).sum()],
            [q(x2 * wgt).sum(), q(x1 * x2 * wgt).sum(),
             q(x2 * x2 * wgt).sum()]], dtype=np.float64)
        g = np.array([q(r).sum(), q(x1 * r).sum(), q(x2 * r).sum()],
                     dtype=np.float64)
        return np.linalg.solve(H, g)

    half_up = lambda v: (np.sign(v)
                         * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)
    w1 = half_up(step(np.full_like(y, 0.5)))
    z = (w1[0] * 1_000_000 + w1[1] * x1m + w1[2] * x2m) / 1e12
    p2 = np.floor(1.0 / (1.0 + np.exp(-z)) * 1e6 + 0.5) / 1e6  # p >= 0
    w2 = w1 + half_up(step(p2))

    row = ml_logreg_irls(spark, SF).collect()[0]
    got = np.array([row.w0m, row.w1m, row.w2m], dtype=np.int64)
    # the engine solves via cofactor arithmetic, the mirror via LAPACK —
    # the deltas can round to adjacent micros near .5 boundaries, and a
    # step-1 micro propagates through step 2; the algebra itself is
    # pinned exactly by test_cramer3_formulas_match_numpy_solve
    assert np.all(np.abs(got - w2) <= 2), (row, w2)


def test_cramer3_formulas_match_numpy_solve():
    """The in-plan cofactor expressions must solve random symmetric 3x3
    systems like numpy does — this is the pure-algebra guard (no
    quantization, no Spark) against the cofactor-term class of bug."""
    from big_data_science_project_spark.operators.linear import cramer3

    rng = np.random.default_rng(7)
    for _ in range(200):
        A = rng.normal(size=(3, 3))
        H = A @ A.T + np.eye(3)  # SPD, well-conditioned
        g = rng.normal(size=3)
        c = {"h11": H[0, 0], "h12": H[0, 1], "h13": H[0, 2],
             "h22": H[1, 1], "h23": H[1, 2], "h33": H[2, 2],
             "g1": g[0], "g2": g[1], "g3": g[2]}
        d1, d2, d3, det = cramer3(c)
        got = np.array([d1, d2, d3]) / det
        want = np.linalg.solve(H, g)
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9), (got, want)
