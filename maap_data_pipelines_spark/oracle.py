"""Dev-time replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, schema (column names), and order-insensitive values.
Used by tests/test_oracle_parity.py; the real gate is the driver's.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from .sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # floats are engineered to be identical; round defensively
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    # column-name-sorted, order-insensitive value compare (driver semantics)
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted(
        [tuple(_norm(r[i]) for i in s_idx) for r in s_rows], key=lambda t: str(t)
    )
    o_set = sorted(
        [tuple(_norm(r[i]) for i in o_idx) for r in o_rows], key=lambda t: str(t)
    )
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:3]
        extra = s_set[len(o_set):] or o_set[len(s_set):]
        problems.append(f"value mismatch; first diffs={diffs} extra={extra[:3]}")
    return problems
