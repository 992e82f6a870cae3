"""Benchmark/probe action that forces FULL plan evaluation.

``df.count()`` is NOT a throughput measurement of a query: Catalyst
optimizes the *count plan*, which (a) prunes every column the count
doesn't need — the scan and all projections shrink — and (b) ELIMINATES
left outer joins whose right side has provably-unique join keys (any
aggregate keyed on the join column) when no right-side column survives.
Measured consequence that motivated this module (round 8):
``dedup_incremental``'s count plan drops 4 of its 6 joins — the entire
LSH near tier — so timing ``.count()`` times a different, much cheaper
query. ``checksum_count`` aggregates an xxhash64 over EVERY output
column instead: all columns are referenced, so nothing prunes and no
join is eliminable, while the action still returns a single row (no
driver-transfer cost distorting the measurement, unlike ``collect()``).

The checksum value itself is incidental (a change detector at best —
BIT_XOR is commutative/associative, so it IS stable across
partitionings, and unlike SUM it cannot overflow under ANSI mode); the
point is the evaluation it forces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _hashable(col: Column, dt: DataType) -> Column:
    """Rewrite ``col`` so xxhash64 accepts it: MapType is disallowed
    (unspecified entry order) at ANY nesting depth, so maps become
    map_entries recursively — inside arrays via transform, inside
    structs by rebuilding the struct. Non-map types pass through
    untouched (no expression overhead on the common path)."""
    if isinstance(dt, MapType):
        entries = F.map_entries(col)
        inner = StructType().add("key", dt.keyType).add("value", dt.valueType)
        return F.transform(entries, lambda e: _hashable(e, inner))
    if isinstance(dt, ArrayType) and _contains_map(dt.elementType):
        return F.transform(col, lambda e: _hashable(e, dt.elementType))
    if isinstance(dt, StructType) and _contains_map(dt):
        return F.struct(*[
            _hashable(col.getField(f.name), f.dataType).alias(f.name)
            for f in dt.fields])
    return col


def _contains_map(dt: DataType) -> bool:
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def checksum_count(df: DataFrame) -> tuple[int, int]:
    """(row count, full-width xxhash64 checksum) with every output
    column evaluated. Map columns — top-level or nested inside
    structs/arrays — hash via a recursive map_entries rewrite
    (hash-of-map is disallowed by default and its entry order is
    unspecified — fine here, the checksum only needs to force
    evaluation)."""
    cols = [_hashable(F.col(f.name), f.dataType) for f in df.schema.fields]
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.bit_xor(F.xxhash64(*cols)).alias("ck")).first()
    return int(row["n"]), int(row["ck"]) if row["ck"] is not None else 0
