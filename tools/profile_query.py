"""Profile registered queries: wall time, Spark job count, plan dump.

Usage:
    python tools/profile_query.py [--sf SF_DIR] [--runs N] [--plan OUT_DIR] key [key ...]

For each key: builds the DataFrame, optionally writes the formatted plan
to OUT_DIR/<key>.txt, then executes it --runs times via the noop sink,
reporting wall seconds per run and the number of Spark jobs the run
triggered (statusTracker job-id delta).  Job count exposes driver-sync
loops / eager materializations that per-query wall time alone hides.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maap_data_pipelines_spark import registry  # noqa: E402
from maap_data_pipelines_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write <key>.txt formatted plans")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    sc = spark.sparkContext

    # warmup so JVM startup isn't billed to the first key
    qs["q6_forecast_revenue"](spark, args.sf).write.format("noop").mode("overwrite").save()

    for key in args.keys:
        if key not in qs:
            print(f"SKIP {key}: unknown")
            continue
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = qs[key](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plan, f"{key}.txt"), "w") as f:
                f.write(buf.getvalue())
        walls, jobs = [], []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            j0 = sc.statusTracker().getJobIdsForGroup(None)
            n0 = max(j0) if j0 else -1
            sc.setJobDescription(f"profile:{key}")
            t0 = time.time()
            df = qs[key](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            j1 = sc.statusTracker().getJobIdsForGroup(None)
            n1 = max(j1) if j1 else -1
            jobs.append(n1 - n0)
            sc.setJobDescription(None)
        walls_s = " ".join(f"{w:.2f}" for w in walls)
        med = sorted(walls)[len(walls) // 2]
        print(f"{key}: med={med:.2f}s runs=[{walls_s}] jobs={jobs}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
