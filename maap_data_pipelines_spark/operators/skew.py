"""Skew-mitigation building blocks: salted two-phase aggregation & join.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew in SORT-MERGE JOINS, but two hot spots it cannot fix:
  * a groupBy whose key distribution is pathological (one key = 30% of
    the stream) — the single reducer for that key becomes the straggler;
  * window functions — AQE never splits a window partition.
These helpers implement the classic salting decomposition as reusable
plan fragments; results are EXACTLY equal to the unsalted plan (both are
pinned by tests/test_skew.py).

``salted_sum_count`` — phase 1 aggregates (key, salt) — the hot key's
work spreads over n_salt reducers and map-side combine still applies —
phase 2 re-aggregates the n_salt partials per key (tiny shuffle:
n_keys x n_salt rows).

``replicated_skew_join`` — broadcast-replicate the small side n_salt
times so the big side can salt its join key: the hot key's rows land on
n_salt different reducers instead of one. Use when the dim is too big
for a plain broadcast but small enough to replicate n_salt-fold, or
when AQE is off (streaming jobs, where AQE does not apply).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_col(n_salt: int) -> Column:
    # deterministic per-row salt: spreads rows uniformly without RNG so
    # retries/speculative tasks recompute identical partitions
    return F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salt))


def salted_sum_count(
    df: DataFrame, key: str, value: str, n_salt: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-phase (salted) sum+count per key; exactly equals plain groupBy.

    Output: (key, total, n_rows). Sum and count re-aggregate losslessly;
    extend with min/max/etc. — any commutative monoid decomposes the
    same way (avg = sum/count at the end; never average averages).
    """
    phase1 = (
        df.withColumn("__salt", _salt_col(n_salt))
        .groupBy(key, "__salt")
        .agg(F.sum(value).alias("__s"), F.count(F.lit(1)).alias("__c"))
    )
    return phase1.groupBy(key).agg(
        F.sum("__s").alias("total"), F.sum("__c").cast("long").alias("n_rows")
    )


def replicated_skew_join(
    big: DataFrame, small: DataFrame, key: str, n_salt: int = DEFAULT_SALTS
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Row-identical to ``big.join(small, key)`` (inner). The hot key's
    probe rows scatter over n_salt reducers; the build side grows
    n_salt-fold (bounded: |small| * n_salt rows).
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("__salt", _salt_col(n_salt).cast("int"))
    return big_salted.join(small_rep, [key, "__salt"]).drop("__salt")
