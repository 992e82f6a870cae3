"""Oracle-exact numeric aggregation helpers.

Floating-point sums depend on accumulation order, which differs between
Spark's partial/final hash aggregation and DuckDB's sequential scan. The
fixture values are decimal-quantized (prices/discounts have ≤2 decimals,
derived products ≤4), so casting each element to a decimal type *before*
summing makes the aggregation exact integer arithmetic — bit-identical in
any engine and at any parallelism. This matters doubly at scale: a 100 TB
sum is also *reproducible* run-to-run, not just oracle-matching.

Spark's decimal sum is still a JVM-side codegen'd partial+final hash
aggregate — no performance cliff vs double sums for these widths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale 6 covers every derived product in the fixtures (2dp × 2dp → 4dp)
_DEC = "decimal(28,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact sum: per-element decimal cast → decimal sum → double result."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Exact-sum average: one double division at the end (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_expr(sql_expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def davg_expr(sql_expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(28,6))) AS DOUBLE)"
            f" / COUNT({sql_expr})")
