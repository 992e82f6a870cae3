"""Physical-plan inspection helpers — the feedback loop for scale tuning.

Used by tests to assert that plans have the shape we want at 100 TB:
filters/projections pushed into the parquet scan, small dimensions
broadcast, no Python row-at-a-time operators in hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def python_op_count(df: DataFrame) -> int:
    """Row-at-a-time Python evals (BatchEvalPython) — should always be 0;
    ArrowEvalPython (pandas UDFs) is the only acceptable Python operator."""
    return formatted_plan(df).count("BatchEvalPython")
