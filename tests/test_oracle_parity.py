"""Driver-gate replica: every registered query vs its DuckDB oracle.

This is the same check the round driver runs at sf0.01, executed at
sf0.001 for speed: row count, column names, Arrow-level result types and
order-insensitive values must all match. Keys without an oracle get a
rows-runnable smoke check (the driver's weaker rows-only path).
"""

from __future__ import annotations

import pytest

from maap_data_pipelines_spark import oracle, registry

_KEYS = sorted(registry.queries().keys())


@pytest.mark.parametrize("key", _KEYS)
def test_query_matches_oracle(spark, sf_dir, key):
    fn = registry.queries()[key]
    sqls = registry.oracle_sql()
    df = fn(spark, sf_dir)
    if key in sqls:
        problems = oracle.compare(df, sqls[key], sf_dir)
        assert not problems, f"{key}: {problems}"
    else:
        assert df.count() >= 0  # rows-only: runs and yields a stable schema
        assert df.columns


def test_registry_covers_oracles():
    qs = registry.queries()
    sqls = registry.oracle_sql()
    orphan_oracles = set(sqls) - set(qs)
    assert not orphan_oracles, f"oracle SQL without a query: {orphan_oracles}"


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()).issubset(set(mod.queries()))
