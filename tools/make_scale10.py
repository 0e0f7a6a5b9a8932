"""Generate a 10x-replicated 'sf1-like' dataset from sf0.1 for scale checks.

No sf1 parquet ships with the test environment, so scale spot-checks
synthesize one: each table the heavy queries read is replicated 10x with
replica-disjoint keys, preserving the per-replica workload shape exactly:

- ``documents``: doc_id shifted by 10M per replica; every WORD gets a
  replica suffix (``_rN``) so shingle/minhash spaces are disjoint across
  replicas — the dedup candidate graph scales 10x linearly instead of
  becoming one giant everything-matches clique of identical copies.
- ``embeddings``: vec_id shifted; vectors unchanged (same geometry, 10x
  points per k-means cell — exactly how a larger corpus behaves).
- ``events``: event_id/user_id shifted (10x users, same time range — day
  bins get 10x denser, the realistic growth direction).
- ``orders``/``lineitem``/``customer``: the whole cross-fact spine is
  replicated together (o_orderkey/o_custkey, l_orderkey, c_custkey all
  shifted by the same per-replica offset), so every replica's orders
  find their lineitems and customers — q3/q5/q18-style joins measure a
  faithful 10x workload, not orphan headers. part/supplier keys on
  lineitem are left unshifted: those dims are copied once and stay
  shared, which is the realistic growth direction (more facts, same
  catalog).
- remaining dims (region/nation/part/supplier) copied once.

Usage: python tools/make_scale10.py [src_sf_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from maap_data_pipelines_spark.session import get_spark

SHIFT = 10_000_000


def replicate(df, id_cols: list[str], i: int, suffix_text: bool = False):
    out = df
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.lit(i * SHIFT))
    if suffix_text and i > 0:
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(f"_r{i}")),
                ),
                " ",
            ),
        )
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10"
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scale10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    plans = {
        "documents": (["doc_id"], True),
        "embeddings": (["vec_id"], False),
        "events": (["event_id", "user_id"], False),
        "orders": (["o_orderkey", "o_custkey"], False),
        "lineitem": (["l_orderkey"], False),
        "customer": (["c_custkey"], False),
    }
    for name, (ids, suffix) in plans.items():
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        parts = [replicate(df, ids, i, suffix) for i in range(n)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(name, "->", big.count(), "rows")
    for name in ("region", "nation", "supplier", "part"):
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copy2(s, d)
    print("done:", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
