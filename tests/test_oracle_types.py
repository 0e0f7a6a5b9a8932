"""Guard against the round-1 failure class: HUGEINT leaking into oracles.

DuckDB promotes SUM(BIGINT) to HUGEINT (Arrow decimal128), which the
driver's type-sensitive value hash can never match against Spark's
int64. Every oracle is executed here (DuckDB only — fast) and its Arrow
schema swept for the promotion; a bare SUM added to any future oracle
fails this test immediately instead of a driver round later.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from maap_data_pipelines_spark import registry
from maap_data_pipelines_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _bad_fields(schema: pa.Schema) -> list[str]:
    out = []
    for f in schema:
        t = f.type
        if pa.types.is_decimal(t):
            out.append(f"{f.name}: {t}")
        if pa.types.is_list(t) and pa.types.is_decimal(t.value_type):
            out.append(f"{f.name}: {t}")
    return out


def test_no_hugeint_in_any_oracle(con):
    oracles = registry.oracle_sql()
    assert oracles, "registry has no oracles?"
    offenders = {}
    for name, sql in oracles.items():
        tab = con.execute(sql).arrow()
        bad = _bad_fields(tab.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"HUGEINT/decimal in oracle outputs: {offenders}"
