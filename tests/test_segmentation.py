"""Golden-quality tests for segmentation (SURVEY.md §5: metric-based
validation against ground-truth masks, like the reference's balanced-
accuracy scoring at image_masking.py:45-69 — but asserted, not
eyeballed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_science_project_spark.operators.segmentation import (
    THRESHOLD_GRID, cells_grid_search, cells_kmeans_accuracy)
from big_data_science_project_spark.sources.cells import load_cells


def test_kmeans_segmentation_quality(spark):
    """Synthetic disks (blob 400-900 on background 20-60) are well
    separated — per-channel mean balanced accuracy must be near-perfect."""
    rows = cells_kmeans_accuracy(spark).collect()
    assert len(rows) == 3  # channels
    for r in rows:
        assert r["mean_bacc"] > 0.95, (r["channel"], r["mean_bacc"])
        assert r["n_images"] > 0


def test_grid_search_picks_separating_threshold(spark):
    rows = cells_grid_search(spark).collect()
    assert len(rows) == 3
    for r in rows:
        # any threshold between background (≤60+noise) and blob (≥400)
        # separates perfectly; best must be in that band with high accuracy
        assert r["best_thr"] in THRESHOLD_GRID
        assert 100.0 <= r["best_thr"] <= 400.0, r
        assert r["best_bacc"] > 0.99, r


def test_grid_search_is_one_job_shape(spark):
    """The search must be a single crossJoin plan, not a per-combination
    loop: the scored plan contains the broadcast of the grid."""
    from big_data_science_project_spark.operators.segmentation import (
        grid_search_threshold)
    df = grid_search_threshold(load_cells(spark, n_images=4))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_dbscan_disks_form_one_cluster(spark):
    """Synthetic images contain exactly one bright disk per channel →
    DBSCAN over thresholded pixel positions must find exactly 1 cluster,
    no noise (min_samples=1), covering the disk area."""
    from big_data_science_project_spark.operators.segmentation import (
        cells_dbscan_segment)
    rows = cells_dbscan_segment(spark).collect()
    assert len(rows) == 48 * 3
    for r in rows:
        assert r["n_clusters"] == 1, r
        assert r["n_noise"] == 0, r
        assert r["largest_cluster"] >= 9  # smallest disk: r=2 ⇒ 13 px ≥ 9


def test_median_blur_removes_spike():
    import numpy as np

    from big_data_science_project_spark.functions.image_kernels import (
        _median_blur_np)
    img = np.zeros((5, 5))
    img[2, 2] = 100.0  # salt noise
    out = _median_blur_np(img, 3)
    assert out[2, 2] == 0.0  # median of the 3×3 neighborhood kills the spike
    assert (out == 0.0).all()


def test_kmeans_mask_golden():
    """Two-level image: bright 2×2 block in a dark field — exact mask."""
    import numpy as np

    from big_data_science_project_spark.operators.segmentation import (
        _kmeans2_mask)
    img = np.full((6, 6), 30.0)
    img[2:4, 2:4] = 500.0
    got = _kmeans2_mask(img)
    expect = np.zeros((6, 6), dtype=bool)
    expect[2:4, 2:4] = True
    assert (got == expect).all()
