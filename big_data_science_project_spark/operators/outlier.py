"""Distributed mean/variance outlier model — the reference's flagship
pipeline (``/root/reference/outlier_detection.py``) re-expressed as
DataFrame operations.

Reference semantics (SURVEY.md A1/A2/A6, M5):

- ``train`` (outlier_detection.py:56-61): combineByKey computing per
  (feature, channel) count/mean/sample-variance with a hand-rolled
  Welford (":68-84") + Chan merge (":87-101"). Spark's ``var_samp`` /
  ``avg`` ARE that algorithm (Catalyst ``CentralMomentAgg`` does a
  numerically-stable partial+final moment merge), so fit() is a plain
  groupBy — correct by construction, unlike the reference whose Chan merge
  squares the wrong term (SURVEY.md §Pitfalls 2; we implement the
  *intended* math).
- ``is_no_outlier`` (outlier_detection.py:41-53): per row, each
  (feature, channel) value votes −1 if within ``mean ± z·sqrt(variance)``
  (z = 0.5 in the reference) else +1; a row is kept when ``votes < 0``,
  i.e. the majority of its values are inliers. The name is inverted in the
  reference — the filter keeps inliers. We keep the exact rule and
  parameterize z.
- persistence (outlier_detection.py:27-39): JSON model state.

Scale notes: the stats table is |features|×|channels| rows (36 in the
reference) — broadcast-joined, so scoring is a map-side join + partial
aggregation regardless of input size. fit() shuffles only the tidy
(feature, channel, value) keys with map-side combine.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, davg_expr
from ..sources.tables import load_table

QUERIES: dict = {}


class OutlierModel:
    """Mean/variance vote model over tidy feature rows.

    Tidy input contract: one row per (id, feature, channel, value) —
    SURVEY.md §1.4's mapping of the reference's ``{name: [per-channel]}``
    feature dicts.
    """

    def __init__(self, stats: DataFrame | None = None, z: float = 0.5):
        self.stats = stats  # columns: feature, channel, n, mean, variance
        self.z = z

    # -- fit: reference outlier_detection.py:56-61 ---------------------------
    def fit(self, tidy: DataFrame,
            feature_col: str = "feature", channel_col: str = "channel",
            value_col: str = "value") -> "OutlierModel":
        self.stats = (
            tidy.groupBy(F.col(feature_col).alias("feature"),
                         F.col(channel_col).alias("channel"))
            .agg(F.count(value_col).alias("n"),
                 # exact-decimal-sum mean (davg): the fixture features
                 # carry 2 decimals, so a float avg's partition-order
                 # ulp can flip 6dp round-ties downstream; the model's
                 # mean is the same mathematical mean, deterministically
                 davg(value_col, "mean"),
                 F.var_samp(value_col).alias("variance"))
        )
        return self

    # -- score: reference outlier_detection.py:41-53 -------------------------
    def votes(self, tidy: DataFrame, id_col: str = "image_id",
              feature_col: str = "feature", channel_col: str = "channel",
              value_col: str = "value") -> DataFrame:
        """Per-id vote totals: negative ⇒ majority-inlier row."""
        if self.stats is None:
            raise ValueError("model not fitted")
        vote = F.when(
            F.abs(F.col(value_col) - F.col("__mean"))
            < F.lit(self.z) * F.sqrt(F.col("__variance")), -1).otherwise(1)
        stats = self.stats.select(
            F.col("feature").alias("__feature"), F.col("channel").alias("__channel"),
            F.col("mean").alias("__mean"), F.col("variance").alias("__variance"))
        joined = tidy.join(
            F.broadcast(stats),
            (F.col(feature_col) == F.col("__feature"))
            & (F.col(channel_col) == F.col("__channel")),
        )
        return (joined.groupBy(F.col(id_col).alias(id_col))
                .agg(F.sum(vote).cast("bigint").alias("votes")))

    def filter_inliers(self, tidy: DataFrame, **kw) -> DataFrame:
        """Ids the reference's filter keeps (votes < 0) — reference
        ``df.rdd.filter(model.is_no_outlier)`` at feature extraction.py:117."""
        id_col = kw.get("id_col", "image_id")
        return self.votes(tidy, **kw).filter(F.col("votes") < 0).select(id_col)

    # -- persistence: reference outlier_detection.py:27-39 -------------------
    def write(self, path: str) -> None:
        """JSON layout mirrors the reference model file
        (``/root/reference/outlier_model.json``): feature → per-channel
        [{mean, variance}], plus n and z (intended schema, unifying the
        reference's two incompatible layouts — SURVEY.md §Pitfalls 3)."""
        rows = self.stats.collect()  # |features|×|channels| rows — tiny
        by_feature: dict = {}
        for r in rows:
            by_feature.setdefault(r["feature"], []).append(
                {"channel": int(r["channel"]), "n": int(r["n"]),
                 "mean": float(r["mean"]),
                 "variance": None if r["variance"] is None else float(r["variance"])})
        for v in by_feature.values():
            v.sort(key=lambda d: d["channel"])
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"z": self.z, "stats": by_feature}, f, indent=2)

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "OutlierModel":
        with open(path) as f:
            blob = json.load(f)
        rows = [
            (feat, d["channel"], d["n"], d["mean"], d["variance"])
            for feat, per_ch in blob["stats"].items() for d in per_ch
        ]
        stats = spark.createDataFrame(
            rows, "feature string, channel int, n long, mean double, variance double")
        return cls(stats=stats, z=blob.get("z", 0.5))


# ---------------------------------------------------------------------------
# Registry queries: the model run end-to-end on relational data. Lineitem
# numeric columns play the role of features; l_returnflag plays channel.
# ---------------------------------------------------------------------------

def _tidy_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # melt 3 numeric columns into tidy (id, feature, channel, value) rows —
    # stack() is the Catalyst-native melt, no Python in the loop
    return li.select(
        F.col("l_orderkey").alias("image_id"),
        F.col("l_returnflag").alias("channel_s"),
        F.expr("stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
               "'discount', l_discount) AS (feature, value)"),
    ).withColumn("channel",
                 F.when(F.col("channel_s") == "A", 0)
                 .when(F.col("channel_s") == "N", 1).otherwise(2)) \
     .drop("channel_s")


_TIDY_SQL = """
  SELECT l_orderkey AS image_id,
         CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END AS channel,
         t.feature, t.value
  FROM lineitem,
       LATERAL (VALUES ('quantity', l_quantity), ('price', l_extendedprice),
                       ('discount', l_discount)) AS t(feature, value)
"""


def outlier_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = OutlierModel().fit(_tidy_lineitem(spark, sf_dir))
    return m.stats.select(
        "feature", "channel", "n",
        F.round("mean", 6).alias("mean_r"),
        F.round(F.sqrt("variance"), 6).alias("stddev_r"),
    )


def outlier_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    tidy = _tidy_lineitem(spark, sf_dir)
    m = OutlierModel().fit(tidy)
    return m.votes(tidy).filter(F.col("votes") < 0)


QUERIES["outlier_fit"] = (outlier_fit, f"""
WITH tidy AS ({_TIDY_SQL})
SELECT feature, channel, COUNT(value) AS n,
       ROUND({davg_expr('value')}, 6) AS mean_r,
       ROUND(SQRT(VAR_SAMP(value)), 6) AS stddev_r
FROM tidy GROUP BY feature, channel
""")

QUERIES["outlier_transform"] = (outlier_transform, f"""
WITH tidy AS ({_TIDY_SQL}),
stats AS (
  SELECT feature, channel, {davg_expr('value')} AS mean,
         VAR_SAMP(value) AS variance
  FROM tidy GROUP BY feature, channel
),
votes AS (
  SELECT t.image_id,
         CAST(SUM(CASE WHEN ABS(t.value - s.mean) < 0.5 * SQRT(s.variance)
                       THEN -1 ELSE 1 END) AS BIGINT) AS votes
  FROM tidy t JOIN stats s ON t.feature = s.feature AND t.channel = s.channel
  GROUP BY t.image_id
)
SELECT image_id, votes FROM votes WHERE votes < 0
""")
