"""Time-series shaping over the ``events`` table: regular-grid resampling
with gap fill, and value-distribution histograms.

The reference computes only whole-table statistics over static images
(``feature extraction.py:70-100``); these operators are the
engine-mandated time-series surface a telemetry/training pipeline needs.

Scale notes (100 TB):

- ``ts_resample_ffill`` aggregates the raw stream down to one row per
  (key, hour) FIRST — the only corpus-sized shuffle; everything after
  (gap join, forward-fill window) runs on that compacted hourly table.
  Catalyst collapses the spine-bounds branch into a direct min/max
  scan-agg (map-side partials, a rows=keys shuffle), so the second pass
  over the corpus is pure scan+combine with 2-column pruning. The spine
  itself is generated map-side with ``sequence``/``explode`` (no driver
  loop, no cross join); the forward-fill is one window partitioned by
  key, so state per task is one key's hours. A 1000-executor run
  shuffles hours × keys rows, not the raw events.
- ``histogram`` is a map-side bucket computation (pure arithmetic, no
  lookup table) followed by a ≤N_BUCKETS-group aggregate: shuffle volume
  is O(partitions × buckets). Bucket boundaries are compile-time
  constants; the floor/divide arithmetic is a single IEEE double op per
  row, reproduced verbatim in the DuckDB oracle (DuckDB 1.0 has no
  ``width_bucket``, so both sides share the explicit formula).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources.tables import load_table

QUERIES: dict = {}

# bound the grid so output stays fixture-sized at any sf: the operator
# shape (agg → spine → fill) is unchanged by the key predicate
RESAMPLE_MAX_USER = 100


def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample per user with forward fill: aggregate to an hourly
    grid, densify missing hours from each user's min..max hour via
    ``sequence``/``explode``, then carry the last observed hourly sum
    forward with a ``last(ignorenulls)`` running window. ``is_gap`` marks
    synthesized rows."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < RESAMPLE_MAX_USER))
    hourly = (ev.groupBy("user_id",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   dsum("value", "hr_sum")))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR")))
        .alias("hour"))
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    w = (W.partitionBy("user_id").orderBy("hour")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return joined.select(
        "user_id", "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("hr_sum", ignorenulls=True).over(w).alias("ff_sum"),
        F.col("n_events").isNull().cast("int").alias("is_gap"))


QUERIES["ts_resample_ffill"] = (ts_resample_ffill, f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events, {dsum_expr('value')} AS hr_sum
  FROM events
  WHERE user_id < {RESAMPLE_MAX_USER}
  GROUP BY user_id, date_trunc('hour', ts)
), bounds AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT s.user_id, s.hour,
       COALESCE(h.n_events, 0) AS n_events,
       LAST_VALUE(h.hr_sum IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_sum,
       CAST(CASE WHEN h.n_events IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM spine s
LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
""")


# ---------------------------------------------------------------------------
# histogram: fixed-grid binning of l_extendedprice. Bounds chosen to
# cover the TPC-H price domain (~901..105000) with clamping so the edges
# absorb out-of-range values — the standard fixed-width histogram an
# engine runs for data profiling / quantile seeding.
# ---------------------------------------------------------------------------
HIST_LO = 0.0
HIST_HI = 110000.0
HIST_BUCKETS = 22
_STEP = (HIST_HI - HIST_LO) / HIST_BUCKETS  # 5000.0, exact in double


def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    raw = F.floor((F.col("l_extendedprice") - F.lit(HIST_LO)) / F.lit(_STEP))
    bucket = F.least(F.greatest(raw, F.lit(0)),
                     F.lit(HIST_BUCKETS - 1)).cast("int")
    return (li.select(bucket.alias("bucket"), "l_extendedprice")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_extendedprice", "sum_price"),
                 F.round(F.min("l_extendedprice"), 2).alias("min_price"),
                 F.round(F.max("l_extendedprice"), 2).alias("max_price"))
            .withColumn("bucket_lo",
                        F.col("bucket").cast("double") * F.lit(_STEP)))


QUERIES["histogram"] = (histogram, f"""
WITH b AS (
  SELECT CAST(LEAST(GREATEST(
           FLOOR((l_extendedprice - {HIST_LO}) / {_STEP}), 0),
           {HIST_BUCKETS - 1}) AS INT) AS bucket,
         l_extendedprice
  FROM lineitem
)
SELECT bucket, COUNT(*) AS n,
       {dsum_expr('l_extendedprice')} AS sum_price,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       CAST(bucket AS DOUBLE) * {_STEP} AS bucket_lo
FROM b
GROUP BY bucket
""")


# ---------------------------------------------------------------------------
# Hypertable continuous-aggregate rollup — the TimescaleDB/Druid pattern
# the mandate names as a custom-operator example: history is served from
# a pre-aggregated hourly rollup (one row per hour×type), only the tail
# past the materialization watermark touches raw events, and the final
# answer merges the two with a re-aggregate (sums of sums — the
# mergeable-partial property that makes the rollup valid). At 100 TB the
# rollup branch reads hours×types rows instead of the raw corpus — the
# raw scan is bounded by the watermark lag regardless of history size.
# Here both branches derive from the same fixture (the env has no stored
# rollup table), but the plan is the production shape: the rollup
# subtree is exactly what a materialized aggregate scan would produce.
# ---------------------------------------------------------------------------
ROLLUP_WATERMARK = "2024-01-25 00:00:00"


def ts_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    cut = F.lit(ROLLUP_WATERMARK).cast("timestamp")

    def branch(df):
        return (df.select(hour.alias("hour"), "event_type", "value")
                .groupBy("hour", "event_type")
                .agg(F.count(F.lit(1)).alias("n"), dsum("value", "v")))

    rollup = branch(ev.filter(F.col("ts") < cut))   # materialized history
    tail = branch(ev.filter(F.col("ts") >= cut))    # raw past watermark
    return (rollup.unionByName(tail)
            .groupBy("hour", "event_type")
            .agg(F.sum("n").cast("bigint").alias("n"),
                 F.round(F.sum(F.col("v").cast(
                     "decimal(38,6)")).cast("double"), 6).alias("value_sum"))
            .select(F.col("hour").cast("string").alias("hour_s"),
                    "event_type", "n", "value_sum"))


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill — the companion to ts_resample_ffill:
# synthesized hours get the straight line between the surrounding
# observed hourly sums instead of a carried-forward value (leading gaps
# backfill, trailing gaps forward-fill). Same scale shape as the
# resampler: the corpus is aggregated to (key, hour) first; the fill is
# two windows per key over hours only.
#
# Determinism: hourly sums are exact (decimal dsum of 2-decimal values),
# quantized to integer micros, and the interpolation is pure BIGINT
# arithmetic — (pm·(nh−h) + nm·(h−ph)) DIV (nh−ph) on non-negative
# operands, where Spark's `div` and DuckDB's `//` agree. The one double
# op (micros → value) is the same division in both engines.
# ---------------------------------------------------------------------------
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < RESAMPLE_MAX_USER))
    hourly = (ev.groupBy("user_id",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(dsum("value", "hr_sum")))
    hourly = hourly.select(
        "user_id", "hour",
        F.round(F.col("hr_sum") * 1e6).cast("bigint").alias("vm"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR")))
        .alias("hour"))
    j = (spine.join(hourly, ["user_id", "hour"], "left")
         .select("user_id", "hour", "vm",
                 F.expr("unix_timestamp(hour) div 3600").alias("h")))
    hs = F.when(F.col("vm").isNotNull(), F.col("h"))
    wp = (W.partitionBy("user_id").orderBy("hour")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = (W.partitionBy("user_id").orderBy("hour")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    filled = j.select(
        "user_id", "hour", "vm", "h",
        F.last("vm", ignorenulls=True).over(wp).alias("pm"),
        F.last(hs, ignorenulls=True).over(wp).alias("ph"),
        F.first("vm", ignorenulls=True).over(wn).alias("nm"),
        F.first(hs, ignorenulls=True).over(wn).alias("nh"))
    interp = (F.when(F.col("vm").isNotNull(), F.col("vm"))
              .when(F.col("ph").isNull(), F.col("nm"))
              .when(F.col("nh").isNull(), F.col("pm"))
              .otherwise(F.expr(
                  "(pm * (nh - h) + nm * (h - ph)) div (nh - ph)")))
    return filled.select(
        "user_id", "hour",
        (interp.cast("double") / F.lit(1e6)).alias("interp_sum"),
        F.col("vm").isNull().cast("int").alias("is_gap"))


QUERIES["ts_gapfill_interpolate"] = (ts_gapfill_interpolate, f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(ROUND({dsum_expr('value')} * 1e6) AS BIGINT) AS vm
  FROM events
  WHERE user_id < {RESAMPLE_MAX_USER}
  GROUP BY user_id, date_trunc('hour', ts)
), bounds AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
), j AS (
  SELECT s.user_id, s.hour, h.vm,
         CAST(epoch(s.hour) AS BIGINT) // 3600 AS h
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
), filled AS (
  SELECT user_id, hour, vm, h,
         LAST_VALUE(vm IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
         LAST_VALUE(CASE WHEN vm IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         FIRST_VALUE(vm IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm,
         FIRST_VALUE(CASE WHEN vm IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT user_id, hour,
       CAST(CASE WHEN vm IS NOT NULL THEN vm
                 WHEN ph IS NULL THEN nm
                 WHEN nh IS NULL THEN pm
                 ELSE (pm * (nh - h) + nm * (h - ph)) // (nh - ph)
            END AS DOUBLE) / 1e6 AS interp_sum,
       CAST(CASE WHEN vm IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM filled
""")


QUERIES["ts_hypertable_rollup"] = (ts_hypertable_rollup, f"""
WITH rollup AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n, {dsum_expr('value')} AS v
  FROM events WHERE ts < TIMESTAMP '{ROLLUP_WATERMARK}'
  GROUP BY 1, 2),
tail AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n, {dsum_expr('value')} AS v
  FROM events WHERE ts >= TIMESTAMP '{ROLLUP_WATERMARK}'
  GROUP BY 1, 2),
merged AS (SELECT * FROM rollup UNION ALL SELECT * FROM tail)
SELECT CAST(hour AS VARCHAR) AS hour_s, event_type,
       CAST(SUM(n) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE), 6) AS value_sum
FROM merged
GROUP BY hour, event_type
""")


# ---------------------------------------------------------------------------
# Robust outlier screen — median/MAD instead of the mean/σ vote (q17):
# the resistant statistics a telemetry pipeline uses when heavy tails
# would poison the moments. Exactness design: values quantize to integer
# cents; the median of ints lands on the half-integer grid and the MAD
# (median of |v − med|) on the quarter-integer grid — both exact in
# double in BOTH engines, so even the strict `> 3·MAD` comparison is
# deterministic (no 1-ulp interpolation drift, no rounding needed).
# Shuffle profile: one partial+final percentile aggregate per type, then
# a broadcast of the 5-row stats table back onto the stream — the same
# two-pass fit/score shape as q17.
# ---------------------------------------------------------------------------
def ts_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("vc"))
    med = ev.groupBy("event_type").agg(F.median("vc").alias("med_c"))
    dd = (ev.join(F.broadcast(med), "event_type")
          .select("event_type", "vc",
                  F.abs(F.col("vc") - F.col("med_c")).alias("dd")))
    mad = dd.groupBy("event_type").agg(F.median("dd").alias("mad_c"))
    return (dd.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum((F.col("dd") > 3.0 * F.col("mad_c"))
                       .cast("int")).cast("bigint").alias("n_outliers"))
            .join(F.broadcast(med), "event_type")
            .join(F.broadcast(mad), "event_type")
            .select("event_type", "n",
                    F.col("med_c").cast("double").alias("median_cents"),
                    F.col("mad_c").cast("double").alias("mad_cents"),
                    "n_outliers")
            .orderBy("event_type"))


QUERIES["ts_robust_mad"] = (ts_robust_mad, """
WITH ev AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
med AS (
  SELECT event_type, median(vc) AS med_c FROM ev GROUP BY event_type),
dd AS (
  SELECT e.event_type, ABS(e.vc - m.med_c) AS dd
  FROM ev e JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, median(dd) AS mad_c FROM dd GROUP BY event_type)
SELECT d.event_type,
       COUNT(*) AS n,
       CAST(m.med_c AS DOUBLE) AS median_cents,
       CAST(a.mad_c AS DOUBLE) AS mad_cents,
       CAST(SUM(CASE WHEN d.dd > 3.0 * a.mad_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dd d
JOIN med m USING (event_type)
JOIN mad a USING (event_type)
GROUP BY d.event_type, m.med_c, a.mad_c
ORDER BY d.event_type
""")


# ---------------------------------------------------------------------------
# Exact bounded EWMA — exponentially-weighted moving average with decay
# 1/2 over each user's hourly sums, truncated to the last EWMA_LAGS
# observations (the standard practical truncation: dropped terms carry
# < 2^-16 of the mass). Recursive smoothing normally can't be oracled
# bit-exactly (float fold order differs per engine); here the weights are
# powers of two and the inputs integer micros, so numerator and
# denominator are EXACT BIGINTs — N = Σ_j lag_j(vm)·2^(L-1-j),
# D = Σ_j 2^(L-1-j) over the lags that exist — and the one double op
# (N/D) is the same IEEE division in both engines. Scale shape: one
# corpus-sized aggregate to (user, hour), then a single window per user
# whose state is L lags — the same profile as ts_resample_ffill; the lag
# pyramid is 2·L window expressions sharing ONE sort/exchange (one
# Window node, asserted by the plan suite's shared-window convention).
# ---------------------------------------------------------------------------
EWMA_LAGS = 16


def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < RESAMPLE_MAX_USER))
    hourly = (ev.groupBy("user_id",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(dsum("value", "hr_sum")))
    hourly = hourly.select(
        "user_id", "hour",
        F.round(F.col("hr_sum") * 1e6).cast("bigint").alias("vm"))
    w = W.partitionBy("user_id").orderBy("hour")
    num = sum(
        (F.coalesce(F.lag("vm", j).over(w), F.lit(0))
         * F.lit(2 ** (EWMA_LAGS - 1 - j)).cast("bigint")
         for j in range(1, EWMA_LAGS)),
        start=F.col("vm") * F.lit(2 ** (EWMA_LAGS - 1)).cast("bigint"))
    den = sum(
        (F.when(F.lag("vm", j).over(w).isNotNull(),
                F.lit(2 ** (EWMA_LAGS - 1 - j)).cast("bigint"))
         .otherwise(F.lit(0)) for j in range(1, EWMA_LAGS)),
        start=F.lit(2 ** (EWMA_LAGS - 1)).cast("bigint"))
    return (hourly.select(
        "user_id", "hour",
        num.alias("ewma_num"), den.alias("ewma_den"))
        .withColumn("ewma",
                    F.col("ewma_num").cast("double") / F.col("ewma_den")
                    / F.lit(1e6)))


_EWMA_NUM_SQL = " + ".join(
    [f"vm * {2 ** (EWMA_LAGS - 1)}"]
    + [f"COALESCE(LAG(vm, {j}) OVER w, 0) * {2 ** (EWMA_LAGS - 1 - j)}"
       for j in range(1, EWMA_LAGS)])
_EWMA_DEN_SQL = " + ".join(
    [f"{2 ** (EWMA_LAGS - 1)}"]
    + [f"CASE WHEN LAG(vm, {j}) OVER w IS NOT NULL"
       f" THEN {2 ** (EWMA_LAGS - 1 - j)} ELSE 0 END"
       for j in range(1, EWMA_LAGS)])

QUERIES["ts_ewma"] = (ts_ewma, f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(ROUND({dsum_expr('value')} * 1e6) AS BIGINT) AS vm
  FROM events
  WHERE user_id < {RESAMPLE_MAX_USER}
  GROUP BY user_id, date_trunc('hour', ts)
)
SELECT user_id, hour,
       CAST({_EWMA_NUM_SQL} AS BIGINT) AS ewma_num,
       CAST({_EWMA_DEN_SQL} AS BIGINT) AS ewma_den,
       CAST({_EWMA_NUM_SQL} AS DOUBLE)
         / CAST({_EWMA_DEN_SQL} AS BIGINT) / 1e6 AS ewma
FROM hourly
WINDOW w AS (PARTITION BY user_id ORDER BY hour)
""")


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (moving-average method, STL-lite):
# value = trend + seasonal + residual over each type's hourly series.
# trend = centered 25-hour moving mean; seasonal = per-hour-of-day mean
# of the detrended series (raw — NOT re-centered to sum 0; classical
# STL subtracts the cross-hod mean, this profile reports the per-hod
# means directly and leaves any centering to the consumer); residual =
# the rest.
# The decomposition every monitoring pipeline runs before alerting on
# residuals. Exactness: hourly sums are integer micros; the two means
# use exact integer sums with a SINGLE truncating div each (Spark `div`
# == DuckDB `//` on these non-negative / symmetric-safe operands is
# avoided — both divs run on sums that may be negative after
# detrending, so both sides use floor-free truncation via CAST of the
# exact double quotient… no: both engines' integer `/` differ, so the
# quotient is emitted as DOUBLE — one IEEE division of exact integers,
# bit-identical). Scale: one corpus aggregate to (type, hour); trend +
# seasonal are per-type windows/rollups over hours only.
# Output is the per-(type, hour-of-day) seasonal profile — 5×24 rows at
# any sf.
# ---------------------------------------------------------------------------
TREND_HALF = 12  # 25-hour centered window


def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(dsum("value", "hr_sum")))
    hourly = hourly.select(
        "event_type", "hour",
        F.round(F.col("hr_sum") * 1e6).cast("bigint").alias("vm"))
    w = (W.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-TREND_HALF, TREND_HALF))
    trended = hourly.select(
        "event_type", "hour", "vm",
        F.sum("vm").over(w).alias("tsum"),
        F.count("vm").over(w).alias("tn"),
        F.min("hour").over(w).alias("h_lo"),
        F.max("hour").over(w).alias("h_hi"))
    # interior AND dense windows only: tn == 25 removes truncated edge
    # windows, and the 24-hour span check rejects ROWS windows that
    # straddle a gap in the hourly series (25 rows spanning >25 hours
    # would compute the trend over a lopsided time span)
    interior = (trended.filter(
        (F.col("tn") == 2 * TREND_HALF + 1)
        & (F.unix_timestamp("h_hi") - F.unix_timestamp("h_lo")
           == 2 * TREND_HALF * 3600))
                .select("event_type", "hour",
                        # detrended value in exact micro units × window
                        # size: d = vm*(2H+1) − tsum keeps everything
                        # BIGINT (no division yet)
                        F.hour("hour").alias("hod"),
                        (F.col("vm") * (2 * TREND_HALF + 1)
                         - F.col("tsum")).alias("d")))
    return (interior.groupBy("event_type", "hod")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("d").cast("bigint").alias("dsum_check"))
            .select("event_type", "hod", "n", "dsum_check",
                    # seasonal mean in micro units: one IEEE division of
                    # exact integers — bit-identical cross-engine
                    (F.col("dsum_check").cast("double")
                     / (F.col("n") * (2 * TREND_HALF + 1))
                     / F.lit(1e6)).alias("seasonal")))


QUERIES["ts_seasonal_profile"] = (ts_seasonal_profile, f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(ROUND({dsum_expr('value')} * 1e6) AS BIGINT) AS vm
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)),
trended AS (
  SELECT event_type, hour, vm,
         SUM(vm) OVER w AS tsum,
         COUNT(vm) OVER w AS tn,
         MIN(hour) OVER w AS h_lo,
         MAX(hour) OVER w AS h_hi
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {TREND_HALF} PRECEDING
                        AND {TREND_HALF} FOLLOWING)),
interior AS (
  SELECT event_type, EXTRACT(hour FROM hour) AS hod,
         vm * {2 * TREND_HALF + 1} - tsum AS d
  FROM trended
  WHERE tn = {2 * TREND_HALF + 1}
    AND epoch(h_hi) - epoch(h_lo) = {2 * TREND_HALF} * 3600)
SELECT event_type, CAST(hod AS INT) AS hod, COUNT(*) AS n,
       CAST(SUM(d) AS BIGINT) AS dsum_check,
       CAST(CAST(SUM(d) AS BIGINT) AS DOUBLE)
         / (COUNT(*) * {2 * TREND_HALF + 1}) / 1e6 AS seasonal
FROM interior
GROUP BY event_type, hod
""")


# ---------------------------------------------------------------------------
# Triangle-area downsampling (parallel LTTB variant) — pick, per fixed
# bucket of the hourly series, the point with the largest triangle area
# against the NEIGHBOR BUCKET AVERAGES. Classic LTTB anchors on the
# previously *selected* point (inherently sequential); anchoring both
# sides on bucket averages keeps the visual-salience property while
# every bucket selects independently — the parallelizable form a
# distributed engine should run. Exactness: values in integer cents,
# hour indexes integer, both anchor averages cleared of division by
# scaling all coordinates by n_prev·n_next — the area comparison is
# pure BIGINT cross-multiplication (|x| < 2^40), and the winner per
# bucket has a pinned hour tie-break. Edge buckets keep their first /
# last point (the LTTB endpoint convention). One corpus aggregate to
# (type, hour), then windows over hours only.
# ---------------------------------------------------------------------------
LTTB_BUCKET = 6  # hours per bucket


def ts_downsample_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(dsum("value", "hr_sum")))
    pts = hourly.select(
        "event_type",
        F.expr("unix_timestamp(hour) div 3600").alias("h"),
        F.round(F.col("hr_sum") * 100).cast("bigint").alias("vc"))
    pts = pts.withColumn("bucket", F.expr(f"h div {LTTB_BUCKET}"))
    agg = (pts.groupBy("event_type", "bucket")
           .agg(F.sum("h").alias("sh"), F.sum("vc").alias("sv"),
                F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("event_type").orderBy("bucket")
    nb = agg.select(
        "event_type", "bucket",
        F.lag("n").over(w).alias("pn"), F.lag("sh").over(w).alias("psh"),
        F.lag("sv").over(w).alias("psv"),
        F.lead("n").over(w).alias("nn"), F.lead("sh").over(w).alias("nsh"),
        F.lead("sv").over(w).alias("nsv"))
    cand = pts.join(nb, ["event_type", "bucket"])
    # one ranking pass for every bucket kind: interior buckets rank by
    # triangle area (coordinates scaled by pn*nn to clear the anchor
    # divisions — pure BIGINT), the series' first bucket keeps its first
    # point, the last keeps its last (a single-bucket series keeps its
    # first point). The branch is constant within a bucket, so mixing
    # key magnitudes across CASE arms never compares across branches.
    area = F.expr("""
      abs((psh * nn - h * pn * nn) * (nsv * pn - vc * pn * nn)
        - (psv * nn - vc * pn * nn) * (nsh * pn - h * pn * nn))""")
    order_key = (F.when(F.col("pn").isNotNull() & F.col("nn").isNotNull(),
                        -area)
                 .when(F.col("pn").isNull(), F.col("h"))
                 .otherwise(-F.col("h")))
    return (cand.withColumn("rn", F.row_number().over(
        W.partitionBy("event_type", "bucket").orderBy(order_key, "h")))
        .filter(F.col("rn") == 1)
        .select("event_type", "bucket", "h",
                (F.col("vc").cast("double") / 100).alias("value")))


QUERIES["ts_downsample_triangle"] = (ts_downsample_triangle, f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         {dsum_expr('value')} AS hr_sum
  FROM events GROUP BY 1, 2),
pts AS (
  SELECT event_type,
         CAST(epoch(hour) AS BIGINT) // 3600 AS h,
         CAST(ROUND(hr_sum * 100) AS BIGINT) AS vc,
         (CAST(epoch(hour) AS BIGINT) // 3600) // {LTTB_BUCKET} AS bucket
  FROM hourly),
agg AS (
  SELECT event_type, bucket,
         CAST(SUM(h) AS BIGINT) AS sh, CAST(SUM(vc) AS BIGINT) AS sv,
         COUNT(*) AS n
  FROM pts GROUP BY 1, 2),
nb AS (
  SELECT event_type, bucket,
         LAG(n) OVER w AS pn, LAG(sh) OVER w AS psh, LAG(sv) OVER w AS psv,
         LEAD(n) OVER w AS nn, LEAD(sh) OVER w AS nsh, LEAD(sv) OVER w AS nsv
  FROM agg
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
cand AS (
  SELECT p.*, nb.pn, nb.psh, nb.psv, nb.nn, nb.nsh, nb.nsv
  FROM pts p JOIN nb USING (event_type, bucket)),
ranked AS (
  SELECT event_type, bucket, h, vc,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, bucket
           ORDER BY CASE
             WHEN pn IS NOT NULL AND nn IS NOT NULL THEN
               -abs((psh * nn - h * pn * nn) * (nsv * pn - vc * pn * nn)
                  - (psv * nn - vc * pn * nn) * (nsh * pn - h * pn * nn))
             WHEN pn IS NULL THEN h
             ELSE -h END, h) AS rn
  FROM cand)
SELECT event_type, bucket, h, CAST(vc AS DOUBLE) / 100 AS value
FROM ranked WHERE rn = 1
""")


# ---------------------------------------------------------------------------
# CUSUM change-point detection — the classic single-change locator: the
# hour t maximizing |CUSUM_t| = |prefix_t − t·mean| marks the most
# likely level shift in each type's hourly series. Exactness: the mean
# is cleared by scaling through T (the series length) — the statistic
# becomes |T·prefix_t − t·total|, pure BIGINT on integer-micro hourly
# sums (|stat| < T·Σ|vm| ≈ 2.4e15 at sf0.1, far under 2^63); argmax
# tie-breaks on the earliest hour. One corpus aggregate to (type,
# hour), one prefix window + one ranked window per type.
# ---------------------------------------------------------------------------
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(dsum("value", "hr_sum")))
    hourly = hourly.select(
        "event_type", "hour",
        F.round(F.col("hr_sum") * 1e6).cast("bigint").alias("vm"))
    wseq = W.partitionBy("event_type").orderBy("hour")
    wall = (W.partitionBy("event_type")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    scored = hourly.select(
        "event_type", "hour",
        F.row_number().over(wseq).alias("t"),
        F.sum("vm").over(wseq.rowsBetween(W.unboundedPreceding,
                                          W.currentRow)).alias("prefix"),
        F.sum("vm").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("tn"))
    stat = F.abs(F.col("tn") * F.col("prefix") - F.col("t") * F.col("total"))
    return (scored.withColumn("stat", stat)
            .withColumn("rn", F.row_number().over(
                W.partitionBy("event_type")
                .orderBy(F.desc("stat"), "hour")))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.col("hour").cast("string").alias("change_hour_s"),
                    F.col("t").cast("bigint").alias("t"),
                    F.col("tn").cast("bigint").alias("n_hours"),
                    F.col("stat").cast("bigint").alias("cusum_stat")))


QUERIES["ts_cusum_changepoint"] = (ts_cusum_changepoint, f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(ROUND({dsum_expr('value')} * 1e6) AS BIGINT) AS vm
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT event_type, hour,
         ROW_NUMBER() OVER wseq AS t,
         SUM(vm) OVER (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prefix,
         SUM(vm) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS tn
  FROM hourly
  WINDOW wseq AS (PARTITION BY event_type ORDER BY hour)),
ranked AS (
  SELECT *,
         abs(tn * prefix - t * total) AS stat,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(tn * prefix - t * total) DESC,
                                     hour) AS rn
  FROM scored)
SELECT event_type,
       CAST(hour AS VARCHAR) AS change_hour_s,
       CAST(t AS BIGINT) AS t,
       CAST(tn AS BIGINT) AS n_hours,
       CAST(stat AS BIGINT) AS cusum_stat
FROM ranked WHERE rn = 1
""")


# ---------------------------------------------------------------------------
# Autocorrelation function (lags 1-3) — the seasonality/persistence
# probe run before fitting any forecaster. The statistic is the true
# mean-cleared sample ACF: Σ_{t>k}(v_t−v̄)(v_{t−k}−v̄) / Σ(v_t−v̄)²,
# expanded so every sufficient statistic is an exact BIGINT on
# integer-CENT hourly sums — S_k = Σ v_t·v_{t−k}, Sv, Sv², A_k/B_k (the
# lag-window sums that clear the boundary terms a naive T·S_k − Sv²
# shortcut gets wrong — caught by review: that shortcut is biased
# O(k/T) and unbounded for constant series). The final value is ONE
# fixed double expression over those integers (one interior division
# for the (T−k)·Sv²/T term, then the outer ratio) — identical IEEE
# tree in both engines; a zero-variance series yields NULL via
# nullif(den, 0) on both sides. One corpus aggregate to (type, hour);
# one hours-only window pass; the three lags unpivot from a single
# 1-row-per-type aggregate (no recomputation — plan-pinned to one
# scan).
# ---------------------------------------------------------------------------
ACF_LAGS = 3


def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(dsum("value", "hr_sum")))
    hourly = hourly.select(
        "event_type", "hour",
        F.round(F.col("hr_sum") * 100).cast("bigint").alias("vc"))
    wseq = W.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type", "vc",
        *[F.lag("vc", k).over(wseq).alias(f"l{k}")
          for k in range(1, ACF_LAGS + 1)])
    aggs = [F.count(F.lit(1)).alias("t"),
            F.sum("vc").alias("sv"),
            F.sum(F.col("vc") * F.col("vc")).alias("s2")]
    for k in range(1, ACF_LAGS + 1):
        lk = F.col(f"l{k}")
        aggs += [
            F.sum(F.col("vc") * lk).alias(f"sk{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("vc"))).alias(f"a{k}"),
            F.sum(F.when(lk.isNotNull(), lk)).alias(f"b{k}")]
    agg = lagged.groupBy("event_type").agg(*aggs)

    # Every operand is cast to DOUBLE BEFORE any product is formed: the
    # raw integers (t, sv, s2, sk, a, b) each fit exactly in a double,
    # but their BIGINT products (sv*(a+b), t*s2) can exceed INT64 at
    # larger scale factors — DuckDB would raise on overflow while Spark
    # wraps silently, so the double-first tree is the only form that is
    # both safe and engine-identical (same fix ml_logreg_irls applies
    # to its cofactor arithmetic).
    def acf(k):
        num = (F.expr(f"cast(t as double) * cast(sk{k} as double)")
               - F.expr(f"cast(sv as double)"
                        f" * (cast(a{k} as double) + cast(b{k} as double))")
               + F.expr(f"(cast(t as double) - {k}) * cast(sv as double)")
               * F.expr("cast(sv as double)") / F.expr("cast(t as double)"))
        den = F.expr("nullif(cast(t as double) * cast(s2 as double)"
                     " - cast(sv as double) * cast(sv as double), 0.0d)")
        return F.round(num / den, 9)

    stacked = agg.select(
        "event_type", F.col("t").cast("bigint").alias("n_hours"),
        F.posexplode(F.array(*[acf(k) for k in range(1, ACF_LAGS + 1)]))
        .alias("pos", "acf"))
    return stacked.select(
        "event_type", (F.col("pos") + 1).cast("int").alias("lag"),
        "n_hours", "acf")


_ACF_CASE = " ".join(
    f"WHEN {k} THEN ROUND((CAST(t AS DOUBLE) * CAST(sk{k} AS DOUBLE)"
    f" - CAST(sv AS DOUBLE)"
    f" * (CAST(a{k} AS DOUBLE) + CAST(b{k} AS DOUBLE))"
    f" + (CAST(t AS DOUBLE) - {k}) * CAST(sv AS DOUBLE)"
    f" * CAST(sv AS DOUBLE) / CAST(t AS DOUBLE))"
    f" / nullif(CAST(t AS DOUBLE) * CAST(s2 AS DOUBLE)"
    f" - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE), 0.0), 9)"
    for k in range(1, ACF_LAGS + 1))

QUERIES["ts_autocorrelation"] = (ts_autocorrelation, f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(ROUND({dsum_expr('value')} * 100) AS BIGINT) AS vc
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, vc,
         {", ".join(f"LAG(vc, {k}) OVER w AS l{k}"
                    for k in range(1, ACF_LAGS + 1))}
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
agg AS (
  SELECT event_type, COUNT(*) AS t,
         CAST(SUM(vc) AS BIGINT) AS sv,
         CAST(SUM(vc * vc) AS BIGINT) AS s2,
         {", ".join(
             f"CAST(SUM(vc * l{k}) AS BIGINT) AS sk{k}, "
             f"CAST(SUM(CASE WHEN l{k} IS NOT NULL THEN vc END) AS BIGINT)"
             f" AS a{k}, "
             f"CAST(SUM(l{k}) AS BIGINT) AS b{k}"
             for k in range(1, ACF_LAGS + 1))}
  FROM lagged GROUP BY event_type),
ks AS (SELECT unnest(generate_series(1, {ACF_LAGS})) AS lag)
SELECT a.event_type, CAST(ks.lag AS INT) AS lag,
       CAST(a.t AS BIGINT) AS n_hours,
       CASE ks.lag {_ACF_CASE} END AS acf
FROM agg a, ks
""")
