"""Parquet table access for the star-schema + events/documents/embeddings
fixtures (TESTDATA.md).

Equivalent of the reference's scan layer (scifio ``spark.read.format(...)``
at ``/root/reference/main.py:19``) for the relational surface: plain
``spark.read.parquet`` so Catalyst gets vectorized scans, predicate pushdown
and column pruning for free. At 100 TB the same call reads a partitioned
directory tree; nothing here assumes single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to plain TIMESTAMP (UTC instant) whatever the
    writer emitted. TIMESTAMP(NANOS) scans as long under
    spark.sql.legacy.parquet.nanosAsLong → truncate to micros (same as
    DuckDB's nanos→TIMESTAMP conversion; integer `div` — double division
    would lose precision on epoch-nano magnitudes >2^53). timestamp[us]
    without tz would scan as TIMESTAMP_NTZ, which unix_micros/watermarks
    reject → inference is disabled in configure_reads so it arrives as
    TIMESTAMP already; the NTZ cast here is a belt-and-braces no-op path
    (exact under the UTC session timezone)."""
    for f in df.schema.fields:
        if f.name != "ts":
            continue
        if isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def configure_reads(spark: SparkSession) -> None:
    """Runtime-set (not only in our session factory): the driver passes its
    own SparkSession. nanosAsLong lets TIMESTAMP(NANOS) fixtures scan at
    all; inferTimestampNTZ=false keeps tz-less parquet timestamps as
    instants (TIMESTAMP) so event-time ops (unix_micros, watermarks,
    window()) behave identically across writer generations."""
    if getattr(spark, "_bdsp_reads_configured", False):
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Pin the session timezone: the NTZ→TIMESTAMP fallback cast in
    # normalize_event_ts and string rendering of event-time results are only
    # oracle-exact (DuckDB runs in UTC) when the Spark session is UTC too —
    # a driver-supplied session may carry any local zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark._bdsp_reads_configured = True


def plan_cached(fn):
    """Memoize a PURE plan builder ``(spark, sf_dir) -> DataFrame`` on the
    session instance. Expression-heavy builders (image kernels, vote
    models) cost hundreds of Py4J round-trips to construct; the logical
    plan they return is deterministic in (session, sf_dir), so rebuilding
    it per invocation is pure driver latency. Only for builders with no
    construction-time side effects (no writes, no temp views, no streams).
    """
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        cache = getattr(spark, "_bdsp_plan_cache", None)
        if cache is None:
            cache = {}
            spark._bdsp_plan_cache = cache
        key = (fn.__module__, fn.__qualname__, sf_dir)
        if key not in cache:
            cache[key] = fn(spark, sf_dir)
        return cache[key]
    return wrapper


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-side PLAN cache (not a data cache): the returned DataFrame is
    an immutable logical plan, so each (session, dir, table) needs exactly
    one ``spark.read.parquet`` — repeated construction otherwise re-lists
    the path and re-reads parquet footers on the driver for every query,
    pure per-query latency. Keyed on the session instance so a new
    driver-supplied session starts clean; fixtures are read-only, so no
    invalidation is needed."""
    configure_reads(spark)
    cache = getattr(spark, "_bdsp_table_cache", None)
    if cache is None:
        cache = {}
        spark._bdsp_table_cache = cache
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = normalize_event_ts(
            spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return cache[key]


def write_once_artifacts(spark: SparkSession, cache_attr: str,
                         sf_dir: str, prefix: str, build) -> str:
    """Session-cached write-once artifact lifecycle shared by every
    persisted-derived-table family (the dedup index, the LM tables):
    per (session, sf_dir), ``build(root)`` runs exactly once to
    populate a scratch root, and every later call re-READS. Same
    session-attribute pattern as load_table — fixtures are read-only so
    no invalidation; a deployment points the root at durable storage."""
    import tempfile

    cache = getattr(spark, cache_attr, None)
    if cache is None:
        cache = {}
        setattr(spark, cache_attr, cache)
    if sf_dir not in cache:
        root = tempfile.mkdtemp(prefix=prefix)
        build(root)
        cache[sf_dir] = root
    return cache[sf_dir]


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can use spark.sql(...) freely."""
    for n in (names or TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
