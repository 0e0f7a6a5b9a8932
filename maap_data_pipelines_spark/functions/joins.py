"""Size-aware join-strategy pins for corpus-scaled join sides.

Three facts drive every decision here (all measured, r9-r11 scale
sweeps):

1. A corpus-scaled side must NEVER broadcast: AQE's compressed-shuffle
   size estimate sits under ``spark.sql.autoBroadcastJoinThreshold``
   long after the driver-side build stops fitting — the r10 300x sweep
   killed curation_yield_report and cluster_topics with "Not enough
   memory to build and broadcast the table" exactly this way, and the
   r9 100x sweep caught the same mis-broadcast inside
   dedup_prefix_filter.
2. Below a per-task build-memory ceiling, shuffle_hash is the fastest
   non-broadcast strategy (no sorts).
3. Above it, the hash relation no longer fits a task's execution memory
   (the r10 300x "cannot build hash map" OOM at 1.5M docs; clean at
   500k) and sort-merge — which spills and scales unboundedly — is the
   only correct pin.

The binding constraint is PER-TASK memory, not cluster size, so the
same row-count gate holds from local[32] to a 1000-executor cluster:
corpus-sized build sides stop fitting at the same per-partition volume
regardless of executor fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Measured crossover on the replicated-corpus sweeps. r9-r11 read
# "500k docs clean, 1.5M OOM" and set 600k; the r12 100x receipts
# (tools/scale100_sweep_r12.jsonl) moved the cliff DOWN: at exactly
# 500k docs the unpinned plans died twice — dedup_containment's
# shuffled-hash build ("Could not allocate memory to grow
# BytesToBytesMap") and curation_yield_report's corpus-grain broadcast
# ("Not enough memory to build and broadcast") — while ngram_jaccard's
# build, at the SAME estimated bytes, survived. The determinant at the
# cliff is which side AQE picks to build, not row width, so no
# bytes-aware gate separates the clean from the broken run (VERDICT
# r11 #6 investigated and refuted); the gate instead engages BELOW the
# measured failure point. 400k keeps every local/bench plan identical
# (bench corpora are <= 50k docs) and re-receipted 100x clean.
SHUFFLE_HASH_MAX_ROWS = 400_000


def corpus_join_hint(n_rows: int) -> str:
    """shuffle_hash under the per-task build-memory ceiling, merge above."""
    return "shuffle_hash" if n_rows <= SHUFFLE_HASH_MAX_ROWS else "merge"


def corpus_rows(df: DataFrame) -> int:
    """Exact row count for scale gates / join-strategy pins.

    When ``df`` is a ``sources.catalog.fan_out`` frame, counts the
    PRE-repartition scan it wraps (``_fanout_base``) — COUNT is
    repartition-invariant, and the raw parquet count skips the gate
    job's round-robin exchange + sortBeforeRepartition (guide §2.5:
    every keyless repartition pays a local sort). Identical value,
    strictly cheaper at every scale.
    """
    return getattr(df, "_fanout_base", df).count()


def scale_pin(side: DataFrame, n_rows: int) -> DataFrame:
    """Identity below the gate (let AQE broadcast the genuinely small),
    merge-pinned above it (never a driver-routed corpus broadcast)."""
    return side.hint("merge") if n_rows > SHUFFLE_HASH_MAX_ROWS else side
