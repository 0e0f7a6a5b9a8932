"""Central registry: query name -> (spark callable, oracle SQL).

``__spark_entry__.py`` re-exports this; plan modules contribute their
QUERIES/ORACLES dicts. Keys without an oracle entry get the driver's
weaker rows-only check (genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import documents, etl, events, llm, multimodal, sqlapi, stac, tpch, tpch2

_MODULES = [tpch, tpch2, events, documents, llm, stac, multimodal, etl, sqlapi]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
