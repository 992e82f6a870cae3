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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def checksum_count(df: DataFrame) -> tuple[int, int]:
    """(row count, full-width xxhash64 checksum) with every output
    column evaluated. Map columns hash via map_entries (hash-of-map is
    disallowed by default and its entry order is unspecified — fine
    here, the checksum only needs to force evaluation)."""
    cols = [F.map_entries(f.name) if isinstance(f.dataType, MapType)
            else F.col(f.name) for f in df.schema.fields]
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.bit_xor(F.xxhash64(*cols)).alias("ck")).first()
    return int(row["n"]), int(row["ck"]) if row["ck"] is not None else 0
