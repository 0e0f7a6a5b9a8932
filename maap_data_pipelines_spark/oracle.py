"""Dev-time replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, schema (column names), order-insensitive values AND
Arrow-level result types. Round 1 taught us the driver's value hash is
type-sensitive (DuckDB SUM(BIGINT) -> HUGEINT/decimal128 hashed differently
from Spark's int64 even when values were identical), so this comparator
materializes both sides as Arrow tables and fails on any type difference a
value-identical comparison would hide.

Used by tests/test_oracle_parity.py; the real gate is the driver's.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pyarrow as pa

from .sources.catalog import TABLES


def run_oracle_arrow(sql: str, sf_dir: str) -> pa.Table:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).arrow()


def spark_arrow(spark_df) -> pa.Table:
    if hasattr(spark_df, "toArrow"):
        return spark_df.toArrow()
    # Fallback for older PySpark: via pandas (types may loosen).
    return pa.Table.from_pandas(spark_df.toPandas())


def _canon_type(t: pa.DataType) -> str:
    """Canonical type name; large_string/string treated alike."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # floats are engineered to be identical; round defensively
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_tab = spark_arrow(spark_df)
    o_tab = run_oracle_arrow(oracle_sql, sf_dir)

    s_cols = list(s_tab.column_names)
    o_cols = list(o_tab.column_names)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(
            f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        )
        return problems

    # type check (column-name aligned) — the driver's hash is type-sensitive
    for c in sorted(s_cols):
        st = _canon_type(s_tab.schema.field(c).type)
        ot = _canon_type(o_tab.schema.field(c).type)
        if st != ot:
            problems.append(f"type mismatch on {c!r}: spark={st} oracle={ot}")

    if s_tab.num_rows != o_tab.num_rows:
        problems.append(
            f"row count mismatch: spark={s_tab.num_rows} oracle={o_tab.num_rows}"
        )

    # column-name-sorted, order-insensitive value compare (driver semantics)
    def rows(tab: pa.Table) -> list[tuple]:
        cols = [tab.column(c).to_pylist() for c in sorted(tab.column_names)]
        return sorted(
            (tuple(_norm(col[i]) for col in cols) for i in range(tab.num_rows)),
            key=lambda t: str(t),
        )

    s_set, o_set = rows(s_tab), rows(o_tab)
    if s_set != o_set:
        diffs = [(a, b) for a, b in zip(s_set, o_set) if a != b][:3]
        extra = s_set[len(o_set):] or o_set[len(s_set):]
        problems.append(f"value mismatch; first diffs={diffs} extra={extra[:3]}")
    return problems
