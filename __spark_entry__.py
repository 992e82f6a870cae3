"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's outlier-vote
pipeline re-expressed relationally — SURVEY.md §7 Milestone 0) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-verifiable oracles where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_science_project_spark.operators import collect_registry

_QUERIES, _ORACLES = collect_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["q17_outlier_votes"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; non-SQL ops
    (image kernels over the synthetic cells source) are omitted → driver
    records rows-only checks, with pytest goldens carrying correctness."""
    return dict(_ORACLES)
