"""Synthetic ``cells`` source — reproduces the reference's scifio row
contract (SURVEY.md §1.1, FIXTURES.md §B) without the proprietary .cif
format: ``(image_id, n_channels, width, height, data, mask)`` with
channel-major flat arrays.

Mirrors the scifio reader's pushdown surface (reference ``main.py:17-19``):
``channels`` (slice pruning), ``imagelimit`` (row limit),
``numpartitions`` (split control). Images are deterministic (hash-seeded
per image), so any engine — or any retry at any parallelism — generates
identical rows; generation is distributed via ``mapInPandas`` over an id
range, the scalable pattern for synthesizing or decoding per-row binary
payloads (each task materializes only its id slice).

Also registers the multimodal feature pipeline as rows-only queries (no
SQL oracle — image kernels aren't DuckDB-expressible; pytest goldens in
tests/test_kernels.py carry the correctness weight, SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import plan_cached

QUERIES: dict = {}


def per_channel_mask_rollup(df: DataFrame) -> DataFrame:
    """Per-channel (total_area, n_images) over a cells DataFrame — the
    shared verification rollup every scan/sink round-trip query returns,
    factored once so the five call sites can't drift."""
    from ..functions import image_kernels as K

    wh = F.col("width") * F.col("height")
    per_ch = df.select(
        "image_id",
        F.explode(F.sequence(F.lit(0), F.col("n_channels") - 1))
        .alias("channel"),
        K.channel_slice(F.col("mask"), F.col("channel"), wh)
        .alias("mask_ch"))
    return (per_ch.groupBy("channel")
            .agg(F.sum(K.area(F.col("mask_ch"))).alias("total_area"),
                 F.count(F.lit(1)).alias("n_images")))

CELLS_SCHEMA = T.StructType([
    T.StructField("image_id", T.LongType(), False),
    T.StructField("n_channels", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("data", T.ArrayType(T.DoubleType()), False),
    T.StructField("mask", T.ArrayType(T.BooleanType()), False),
])

DEFAULT_N = 240
DEFAULT_C = 3
DEFAULT_W = 16
DEFAULT_H = 16


def _gen_image(image_id: int, c: int, w: int, h: int):
    """One deterministic cell image: per channel, a disk blob of elevated
    intensity on a noisy background; mask = the true disk."""
    rng = np.random.default_rng(image_id * 1_000_003 + 7)
    data = np.empty((c, w, h), dtype=np.float64)
    mask = np.zeros((c, w, h), dtype=bool)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w))
    for ch in range(c):
        cx = rng.integers(w // 4, 3 * w // 4)
        cy = rng.integers(h // 4, 3 * h // 4)
        r = rng.integers(2, min(w, h) // 3)
        disk = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        base = rng.uniform(20, 60)
        blob = rng.uniform(400, 900)
        noise = rng.normal(0, 5, size=(w, h))
        img = base + noise + disk * blob
        data[ch] = np.round(img, 4)
        mask[ch] = disk
    return data.reshape(-1), mask.reshape(-1)


def load_cells(spark: SparkSession, n_images: int = DEFAULT_N,
               channels: int = DEFAULT_C, width: int = DEFAULT_W,
               height: int = DEFAULT_H, numpartitions: int = 8,
               imagelimit: int | None = None) -> DataFrame:
    """The scifio-scan analogue: ids are planned as a range partitioned
    across the cluster; each task generates (or, for a real format,
    decodes) only its slice — no driver-side materialization."""
    # `is not None`, not truthiness: imagelimit=0 means zero rows (same
    # semantics as the cells DataSource), not "no limit"
    n = min(n_images, imagelimit) if imagelimit is not None else n_images
    ids = spark.range(0, n, 1, numpartitions).withColumnRenamed("id", "image_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id in pdf["image_id"]:
                data, mask = _gen_image(int(image_id), channels, width, height)
                rows.append((int(image_id), channels, width, height,
                             data.tolist(), mask.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in CELLS_SCHEMA.fields])

    return ids.mapInPandas(gen, CELLS_SCHEMA)


def select_channels(df: DataFrame, channels: list[int]) -> DataFrame:
    """Channel projection pushdown analogue (reference ``channels`` option,
    main.py:17): slice the flat arrays down to the requested channels."""
    wh = F.col("width") * F.col("height")
    data = F.concat(*[F.slice("data", F.lit(c) * wh + 1, wh) for c in channels])
    mask = F.concat(*[F.slice("mask", F.lit(c) * wh + 1, wh) for c in channels])
    return df.select(
        "image_id", F.lit(len(channels)).alias("n_channels"),
        "width", "height", data.alias("data"), mask.alias("mask"))


# ---------------------------------------------------------------------------
# tidy per-(image, channel) feature extraction — the reference's
# calculate_features (feature extraction.py:86-98) as one declarative plan
# ---------------------------------------------------------------------------
@plan_cached
def cell_features(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    from ..functions import image_kernels as K

    cells = load_cells(spark)
    wh = F.col("width") * F.col("height")
    per_ch = cells.select(
        "image_id", "width", "height",
        F.explode(F.sequence(F.lit(0), F.col("n_channels") - 1)).alias("channel"),
        "data", "mask",
    ).select(
        "image_id", "channel", "width", "height",
        K.channel_slice(F.col("data"), F.col("channel"), wh).alias("data_ch"),
        K.channel_slice(F.col("mask"), F.col("channel"), wh).alias("mask_ch"),
    )
    feats = per_ch.select(
        "image_id", "channel",
        K.area(F.col("mask_ch")).alias("area"),
        K.perimeter_udf(F.col("mask_ch"), F.col("width"), F.col("height")).alias("perimeter"),
        K.masked_mean(F.col("data_ch"), F.col("mask_ch")).alias("mean_intensity"),
    )
    return feats.withColumn(
        "circularity",
        F.round(K.circularity(F.col("area"), F.col("perimeter")), 9),
    )


@plan_cached
def cell_outlier_filter(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """End-to-end reference flagship on image data: features → fit stats →
    vote filter (feature extraction.py:108-118 + outlier_detection.py).
    plan_cached also means the persist() below registers ONE plan, not a
    new in-memory relation per invocation."""
    from ..operators.outlier import OutlierModel

    feats = cell_features(spark, sf_dir)
    tidy = feats.select(
        "image_id", "channel",
        F.expr("stack(3, 'area', CAST(area AS DOUBLE), "
               "'perimeter', CAST(perimeter AS DOUBLE), "
               "'mean_intensity', mean_intensity) AS (feature, value)"),
    ).persist(StorageLevel.MEMORY_AND_DISK_DESER)  # consumed twice (fit stats + score fact); without this
    # the generator + feature kernels — the expensive Python stages —
    # run once per branch. The S3 cache analogue for train-then-score.
    model = OutlierModel().fit(tidy)
    return model.votes(tidy).filter(F.col("votes") < 0)


QUERIES["cells_features"] = (cell_features, None)          # rows-only check
QUERIES["cells_outlier_filter"] = (cell_outlier_filter, None)  # rows-only check
