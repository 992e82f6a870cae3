"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB at sf0.001, compare row count,
column names, and exact values (columns sorted by name, rows sorted) —
the same order-insensitive comparison the driver hashes.

Exactness is intentional: the engine's aggregates are designed to be
bit-identical across engines (decimal-cast sums, deterministic per-row
double arithmetic), so any drift is a real bug, not noise.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_SMALL = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _duckdb_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# DuckDB types whose textual/hash rendering diverges from the Spark type
# the same query produces (e.g. SUM(BIGINT) widens to HUGEINT in DuckDB
# but stays BIGINT in Spark). The driver hashes the *typed* values, so an
# oracle emitting any of these fails the gate even when the numbers agree.
# Root cause of the r1/r2 q35+q47 driver failures — keep this impossible.
_RISKY_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                     "USMALLINT", "UTINYINT", "DECIMAL")


def _duck_type_category(t: str) -> str:
    t = t.upper()
    if t.endswith("[]"):
        return "array"
    if t.startswith("STRUCT"):
        return "struct"
    if t.startswith("MAP"):
        return "map"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.startswith("DECIMAL"):
        return "decimal"
    return {"BIGINT": "int", "INTEGER": "int", "SMALLINT": "int",
            "TINYINT": "int", "HUGEINT": "bigdec", "UBIGINT": "bigdec",
            "UINTEGER": "bigdec", "DOUBLE": "float", "FLOAT": "float",
            "REAL": "float", "VARCHAR": "str", "BOOLEAN": "bool",
            "DATE": "date", "BLOB": "binary"}.get(t, t)


def _spark_type_category(t: str) -> str:
    if t.startswith("array"):
        return "array"
    if t.startswith("struct"):
        return "struct"
    if t.startswith("map"):
        return "map"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("decimal"):
        return "decimal"
    return {"bigint": "int", "int": "int", "smallint": "int",
            "tinyint": "int", "double": "float", "float": "float",
            "string": "str", "boolean": "bool", "date": "date",
            "binary": "binary", "variant": "str"}.get(t, t)


def test_oracle_output_types_are_portable():
    """DESCRIBE every oracle; ban DuckDB-only numeric widths.

    _normalize() below stringifies values, which would mask exactly this
    class of bug — so the gate lives here, on the declared types.
    """
    con = _duckdb_conn(SF_SMALL)
    bad = []
    for name in sorted(ORACLES):
        for col, typ, *_ in con.execute("DESCRIBE " + ORACLES[name]).fetchall():
            if any(typ.upper().startswith(r) for r in _RISKY_DUCK_TYPES):
                bad.append((name, col, typ))
    assert not bad, (
        "oracles emit driver-hash-unsafe DuckDB types; CAST them "
        f"(usually AS BIGINT): {bad}")


def _normalize(rows, colnames, fuzzy: bool = False):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = "%.6g" % v if fuzzy else repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [colnames[i] for i in order], out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_SMALL)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duckdb_conn(SF_SMALL)
    d_types = {c: t for c, t, *_ in
               con.execute("DESCRIBE " + ORACLES[name]).fetchall()}
    s_types = dict(sdf.dtypes)
    cat_mism = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if c in d_types
        and _spark_type_category(s_types[c]) != _duck_type_category(d_types[c])
    }
    assert not cat_mism, f"{name}: type-category mismatch {cat_mism}"

    cur = con.execute(ORACLES[name])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    s_colnames, s_norm = _normalize(s_rows, s_cols)
    d_colnames, d_norm = _normalize(d_rows, d_cols)

    assert s_colnames == d_colnames, f"{name}: column mismatch"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs oracle {len(d_norm)}")
    mism = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b][:5]
    assert not mism, (
        f"{name}: first mismatches at {mism}: "
        + "; ".join(f"spark={s_norm[i]} oracle={d_norm[i]}" for i in mism))


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_SMALL)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_type_gate_catches_uncast_sum():
    """The gate's own negative test (VERDICT r2 #2): a deliberately
    uncast SUM(BIGINT) oracle must be flagged as risky."""
    con = _duckdb_conn(SF_SMALL)
    rows = con.execute(
        "DESCRIBE SELECT SUM(CAST(1 AS BIGINT)) AS s").fetchall()
    flagged = [(c, t) for c, t, *_ in rows
               if any(t.upper().startswith(r) for r in _RISKY_DUCK_TYPES)]
    assert flagged, "uncast SUM(BIGINT) must be caught as HUGEINT"
