"""Local replica of the driver's correctness gate: run each registered
query on Spark and its oracle on DuckDB over the same parquet, then
compare row count, column names, and order-insensitive values.

Used by tests/test_oracle_parity.py so oracle mismatches are caught
here before the driver's CORRECTNESS run.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr to normalise -0.0 etc.
        return repr(v + 0.0)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return sorted(cols), out


def compare_query(spark, name: str, fn, oracle: str | None, sf_dir: str):
    """Returns (ok, message). Rows-only check when oracle is None."""
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if oracle is None:
        return True, f"rows-only: {len(srows)} rows"
    con = duckdb_con(sf_dir)
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count differs: spark={len(srows)} oracle={len(orows)}"
    _, sn = _norm_rows(scols, [[r[c] for c in scols] for r in srows])
    _, on = _norm_rows(ocols, orows)
    if sn != on:
        diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"match: {len(srows)} rows"
