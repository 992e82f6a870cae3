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
