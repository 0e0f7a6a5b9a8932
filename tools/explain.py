"""Print the formatted physical plan for any registered query.

Usage: python tools/explain.py <query_key> [sf_dir]

The plan-audit loop in one command: shows the executed plan Spark picks
at the given scale factor (AQE-final shapes appear only after execution;
this prints the static plan, which is what the PLANS.md audits quote).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maap_data_pipelines_spark import registry  # noqa: E402
from maap_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        keys = "\n  ".join(sorted(registry.queries()))
        print(f"usage: python tools/explain.py <key> [sf_dir]\nkeys:\n  {keys}")
        return 2
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    if key not in qs:
        print(f"unknown key {key!r}; run with no args to list")
        return 2
    qs[key](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
