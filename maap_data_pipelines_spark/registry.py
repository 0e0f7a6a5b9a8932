"""Central registry: query name -> (spark callable, oracle SQL).

``__spark_entry__.py`` re-exports this; plan modules contribute their
QUERIES/ORACLES dicts. Keys without an oracle entry get the driver's
weaker rows-only check (genuinely non-SQL-expressible ops only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import documents, etl, events, llm, multimodal, sqlapi, stac, tpch, tpch2

# Module order controls registry iteration order, which external correctness
# harnesses consume front-to-back with a bounded budget.  Modules whose queries
# have not yet been externally confirmed go first; rotate per round so every
# query eventually lands in the verified prefix.  Rows-only keys (no oracle)
# are pushed to the global tail by queries() so they never displace a
# fully-oracled query from the verified prefix.
_MODULES = [stac, llm, sqlapi, multimodal, etl, documents, tpch, tpch2, events]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    oracled = oracle_sql().keys()
    ordered = {k: v for k, v in out.items() if k in oracled}
    ordered.update({k: v for k, v in out.items() if k not in oracled})
    return ordered


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
