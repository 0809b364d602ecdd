"""Registry-wide oracle result-type gate.

Every driver hash-only failure ever seen (r5 q_quality_adaptive_filter;
r6 q_dedup_cluster_profile / q_mixture_temperature / q_ngram_novelty /
q_perplexity_buckets) was an oracle whose DuckDB result schema contained
a HUGEINT (int128) column — an uncast integer SUM.  The driver's hash
harness normalises int128 cells differently from tests/oracle.py's
str(), so local parity passes while the driver goes red.

This test types every registered oracle on DuckDB (bind-only, no
execution) and fails on any INT128/HUGEINT output column so the class
cannot recur: wrap integer aggregates in CAST(... AS BIGINT).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry
from tests.oracle import duckdb_con

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_DIR", "/root/testdata/sf0.001")


def test_no_oracle_emits_int128():
    con = duckdb_con(SF_DIR)
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        huge = [
            col
            for col, typ in zip(rel.columns, rel.types)
            if "INT128" in str(typ).upper() or "HUGEINT" in str(typ).upper()
        ]
        if huge:
            offenders[name] = huge
    assert not offenders, (
        f"oracles emit int128 columns (driver hash hazard) — "
        f"CAST(... AS BIGINT): {offenders}"
    )
