"""A/B the fan_out lever per registered llm-plan key.

For each key in plans.llm.QUERIES: run the plan with fan_out disabled
(identity) and enabled, interleaved (off,on,off,on,...), timing
plan-build + noop execution together (driver-synced loops run at plan
build). Prints per-key medians and the better mode.

Usage: python tools/ab_fanout.py [reps] [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maap_data_pipelines_spark.session import get_spark  # noqa: E402
from maap_data_pipelines_spark.plans import llm  # noqa: E402
from maap_data_pipelines_spark.sources import catalog  # noqa: E402

REAL_FAN_OUT = catalog.fan_out
IDENT = lambda df, n=None: df  # noqa: E731


def set_mode(on: bool) -> None:
    llm.fan_out = REAL_FAN_OUT if on else IDENT


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 3
    keys = args[1:] if args and args[0].isdigit() else args
    if not keys:
        keys = list(llm.QUERIES)
    spark = get_spark("ab-fanout")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    # warmup
    set_mode(False)
    llm.QUERIES["dedup_exact"](spark, sf).write.format("noop").mode("overwrite").save()
    for key in keys:
        fn = llm.QUERIES[key]
        t_off, t_on = [], []
        for r in range(reps):
            for on, sink in ((False, t_off), (True, t_on)):
                set_mode(on)
                t0 = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                sink.append(time.time() - t0)
        t_off.sort(), t_on.sort()
        off_m, on_m = t_off[len(t_off) // 2], t_on[len(t_on) // 2]
        verdict = "FAN" if on_m < off_m * 0.95 else ("OFF" if off_m < on_m * 0.95 else "~")
        print(
            f"{key}: off={off_m:.2f} on={on_m:.2f} -> {verdict}"
            f"  off_runs={[round(x, 2) for x in t_off]} on_runs={[round(x, 2) for x in t_on]}",
            flush=True,
        )
    set_mode(True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
