"""Distributed frequency sketches: exact heavy hitters via Misra-Gries.

The scale problem: "which terms occur in more than 1/k of all positions"
over a 100 TB corpus. A plain groupBy counts EVERY distinct term — the
shuffle carries the whole vocabulary, most of it long-tail noise destined
to be discarded. The Misra-Gries summary bounds that: each input
partition keeps at most ``k`` counters (constant memory regardless of
partition size), and the union of per-partition candidate sets provably
contains every global heavy hitter, by averaging: if
``sum_p freq_p(t) > sum_p n_p / k`` then ``freq_p(t) > n_p / k`` for at
least one partition ``p``, and MG never evicts a within-partition heavy
hitter. A second pass recounts ONLY the candidates (a broadcast semi-join
— the shuffle now carries at most ``k x partitions`` terms), making the
final answer EXACT and independent of partitioning. That determinism is
what lets a sketch-pruned plan keep a full DuckDB oracle
(``HAVING COUNT(*) * k > total``).

Two scans of the corpus is the algorithm's cost; at 100 TB that beats
shuffling a billion-term vocabulary by orders of magnitude. The Python MG
loop runs per Arrow batch over a dict bounded at ``k`` entries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words_col

HH_K = 200  # heavy hitter = term with frequency > total/HH_K


def _mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries over one partition's terms: <= HH_K candidates + n_p.

    Classic counter maintenance: increment if present, add if spare room,
    otherwise decrement ALL counters (dropping zeros). Any term whose
    partition frequency exceeds n_p/HH_K survives — the only guarantee
    the global recount needs. The partition's total term count rides the
    same output (term=NULL row), so one scan serves both the candidate
    set and the global denominator.
    """
    counters: dict[str, int] = {}
    n = 0
    for pdf in batches:
        n += len(pdf)
        for term in pdf["term"]:
            if term in counters:
                counters[term] += 1
            elif len(counters) < HH_K:
                counters[term] = 1
            else:
                dead = []
                for t in counters:
                    counters[t] -= 1
                    if counters[t] == 0:
                        dead.append(t)
                for t in dead:
                    del counters[t]
    yield pd.DataFrame(
        {
            "term": pd.array(list(counters.keys()) + [None], dtype="object"),
            "np": pd.array([None] * len(counters) + [n], dtype="Int64"),
        }
    )


def heavy_hitters(docs: DataFrame) -> DataFrame:
    """Terms covering > 1/HH_K of all term occurrences, with exact counts.

    Pass 1: per-partition Misra-Gries (mapInPandas, constant state) ->
    small candidate set + per-partition totals on the same scan; the
    <= (HH_K+1) x partitions rows are localCheckpoint-ed so deriving the
    candidate set and the denominator doesn't recompute the pass.
    Pass 2: recount candidates only (broadcast semi-join gate before the
    groupBy), final filter ``cnt * HH_K > total``. Two corpus scans — the
    algorithm's minimum — and the output is exact and
    partitioning-independent.
    """
    terms = docs.select(
        F.explode(words_col(F.lower(F.col("text")))).alias("term")
    )
    mg = terms.mapInPandas(
        _mg_partition, schema="term string, np long"
    ).localCheckpoint(eager=False)
    cands = mg.filter(F.col("np").isNull()).select("term").distinct()
    total = mg.groupBy().agg(F.sum("np").alias("total"))
    counts = (
        terms.join(F.broadcast(cands), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("n_occurrences") * HH_K > F.col("total"))
        .select(
            "term",
            "n_occurrences",
            "total",
            F.round(F.col("n_occurrences") / F.col("total"), 6).alias("share"),
        )
    )


HEAVY_HITTERS_SQL = f"""
WITH c AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tot AS (SELECT COUNT(*) AS total FROM c)
SELECT term,
       COUNT(*) AS n_occurrences,
       CAST(total AS BIGINT) AS total,
       ROUND(COUNT(*) / total, 6) AS share
FROM c, tot
GROUP BY term, total
HAVING COUNT(*) * {HH_K} > total
"""

# --- distributed Bloom filter --------------------------------------------

BLOOM_BITS = 1 << 17  # 131072 bit positions, 63 usable bits/word
BLOOM_HASHES = 3
# 63 bits per word: the max shift is 62, so the word stays positive in
# int64 on BOTH engines (DuckDB raises on 1::BIGINT << 63; Spark wraps
# to negative — either breaks parity)
_BITS_PER_WORD = 63


def _bloom_hashes_spark(col):
    """BLOOM_HASHES independent bit positions from disjoint md5 slices."""
    hs = []
    for k in range(BLOOM_HASHES):
        lo = 1 + 8 * k
        hs.append(
            F.expr(
                f"CAST(conv(substring(md5(CAST({col} AS STRING)), {lo}, 8), 16, 10) AS BIGINT)"
            )
            % BLOOM_BITS
        )
    return hs


def _bloom_hashes_sql(col: str) -> list[str]:
    return [
        f"(CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), {1 + 8 * k}, 8)) AS BIGINT) % {BLOOM_BITS})"
        for k in range(BLOOM_HASHES)
    ]


def bloom_membership(build: DataFrame, build_key, probe: DataFrame, probe_key):
    """Distributed Bloom filter: build a bitmap TABLE, probe by word join.

    The scale pattern behind runtime semi-join filtering: instead of
    shuffling the full build-side key set to every probe task (or worse,
    an anti/semi join shuffling both sides), aggregate the build side to
    a fixed-size bitmap — ceil(BLOOM_BITS / 63 usable bits per word) =
    2081 (word, bits) rows via ``bit_or``, map-side combined, so the
    shuffle carries at most 2081 rows no matter how many build keys —
    and probe with an equi-join on the word index.
    The bitmap never materializes on the driver; both sides stay
    DataFrames end to end.

    Hashes are md5-slice-derived (deterministic, engine-portable), so the
    whole construction — including which probes are false positives — is
    reproducible in SQL: the accuracy report gets a FULL oracle, not a
    rows-only waiver. Returns one row: exact true-membership counts vs
    bloom "maybe" counts and the measured false-positive rate.
    """
    build_keys = build.select(F.col(build_key).alias("k")).distinct()
    bits = build_keys.select(
        F.explode(F.array(*_bloom_hashes_spark("k"))).alias("h")
    )
    bitmap = bits.groupBy(F.expr(f"h div {_BITS_PER_WORD}").alias("word")).agg(
        F.bit_or(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(h % {_BITS_PER_WORD} AS INT))")).alias(
            "bits"
        )
    )
    probe_keys = probe.select(F.col(probe_key).alias("k")).distinct()
    probed = (
        probe_keys.select(
            "k", F.explode(F.array(*_bloom_hashes_spark("k"))).alias("h")
        )
        .join(F.broadcast(bitmap), F.expr(f"h div {_BITS_PER_WORD}") == F.col("word"), "left")
        .select(
            "k",
            F.expr(
                f"shiftright(COALESCE(bits, CAST(0 AS BIGINT)), CAST(h % {_BITS_PER_WORD} AS INT)) % 2 = 1"
            ).alias("hit"),
        )
        .groupBy("k")
        .agg((F.count(F.lit(1)) == F.sum(F.col("hit").cast("long"))).alias("maybe"))
    )
    truth = probe_keys.join(
        build_keys.withColumn("present", F.lit(True)), "k", "left"
    ).select("k", F.coalesce("present", F.lit(False)).alias("present"))
    joined = probed.join(truth, "k")
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("present").cast("long")).alias("n_true"),
        F.sum(F.col("maybe").cast("long")).alias("n_maybe"),
        F.sum((F.col("maybe") & ~F.col("present")).cast("long")).alias(
            "n_false_positive"
        ),
        F.sum((~F.col("maybe") & F.col("present")).cast("long")).alias(
            "n_false_negative"
        ),
    )


def bloom_membership_sql(
    build_table: str, build_key: str, probe_table: str, probe_key: str
) -> str:
    hs_b = ", ".join(f"({h})" for h in _bloom_hashes_sql("k"))
    hs_p = ", ".join(f"({h})" for h in _bloom_hashes_sql("k"))
    return f"""
WITH build_keys AS (SELECT DISTINCT {build_key} AS k FROM {build_table}),
bits AS (
  SELECT unnest([{hs_b}]) AS h FROM build_keys
),
bitmap AS (
  SELECT h // 63 AS word, bit_or(1::BIGINT << CAST(h % 63 AS INTEGER)) AS bits
  FROM bits GROUP BY 1
),
probe_keys AS (SELECT DISTINCT {probe_key} AS k FROM {probe_table}),
probe_bits AS (
  SELECT k, unnest([{hs_p}]) AS h FROM probe_keys
),
probed AS (
  SELECT p.k,
         COUNT(*) = SUM(CASE WHEN (COALESCE(b.bits, 0) >> CAST(p.h % 63 AS INTEGER)) % 2 = 1
                             THEN 1 ELSE 0 END) AS maybe
  FROM probe_bits p LEFT JOIN bitmap b ON p.h // 63 = b.word
  GROUP BY p.k
),
truth AS (
  SELECT p.k, (b.k IS NOT NULL) AS present
  FROM probe_keys p LEFT JOIN build_keys b USING (k)
)
SELECT COUNT(*) AS n_probed,
       CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       CAST(SUM(CASE WHEN maybe AND NOT present THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
       CAST(SUM(CASE WHEN present AND NOT maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative
FROM probed JOIN truth USING (k)
"""


# --- count-min sketch ------------------------------------------------------

CMS_D = 4  # depth: independent hash rows; estimate = min across rows
CMS_W = 1024  # width: buckets per row; expected overcount ~ N/W per row
CMS_TOPK = 20


def _cms_bucket_spark(col: str, d: int):
    """Row-d bucket from the d-th disjoint md5 slice (engine-portable)."""
    lo = 1 + 8 * d
    return (
        F.expr(
            f"CAST(conv(substring(md5(CAST({col} AS STRING)), {lo}, 8), 16, 10) AS BIGINT)"
        )
        % CMS_W
    )


def cms_frequency(df: DataFrame, key_col: str, topk: int = CMS_TOPK) -> DataFrame:
    """Count-min sketch point estimates vs exact counts for the top keys.

    The mergeable fixed-size FREQUENCY sketch completing the family
    (HLL: distinct, GK: quantiles, Misra-Gries: exact heavy hitters):
    unlike MG's candidate set, a CMS answers point queries for keys
    chosen AFTER the scan, and two sketches merge by cell-wise addition —
    the shape a fleet of ingest shards ships to a coordinator. Build is
    one scan: each occurrence increments one bucket per depth row
    (explode x CMS_D, map-side combined), so the shuffle carries at most
    CMS_D x CMS_W = 4096 cells regardless of corpus size; estimates take
    the min across rows (collisions only ever ADD, so est >= exact —
    the one-sided CMS guarantee, visible in ``overcount`` >= 0).

    Hashes are md5-slice-derived (the Bloom pattern), so the sketch table
    and every estimate reproduce bit-for-bit in SQL: the accuracy report
    carries a FULL value-hash oracle — overcounts are measured numbers,
    not a waived claim. Output: the ``topk`` keys by exact count
    (deterministic ties), each with its exact count, CMS estimate and
    overcount.
    """
    keys = df.select(F.col(key_col).alias("k"))
    cells = (
        keys.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket_spark("k", d).alias("bucket"),
                        )
                        for d in range(CMS_D)
                    ]
                )
            ).alias("p")
        )
        .select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.desc("exact_count"), key_col).limit(topk)
    probes = top.select(
        key_col,
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket_spark(key_col, d).alias("bucket"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select(key_col, "exact_count", "p.d", "p.bucket")
    return (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy(key_col, "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            key_col,
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
        )
    )


def cms_frequency_sql(table: str, key_col: str, topk: int = CMS_TOPK) -> str:
    def bucket(col: str, d: str) -> str:
        return (
            f"CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), "
            f"1 + 8 * {d}, 8)) AS BIGINT) % {CMS_W}"
        )

    depths = ", ".join(str(d) for d in range(CMS_D))
    return f"""
WITH rows_ AS (
  SELECT t.d, {bucket(key_col, 't.d')} AS bucket
  FROM {table}, UNNEST([{depths}]) AS t(d)
),
cells AS (SELECT d, bucket, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
exact AS (
  SELECT {key_col}, COUNT(*) AS exact_count FROM {table} GROUP BY 1
),
top AS (
  SELECT * FROM exact ORDER BY exact_count DESC, {key_col} LIMIT {topk}
),
probes AS (
  SELECT {key_col}, exact_count, t.d, {bucket(key_col, 't.d')} AS bucket
  FROM top, UNNEST([{depths}]) AS t(d)
)
SELECT {key_col},
       CAST(exact_count AS BIGINT) AS exact_count,
       CAST(MIN(c) AS BIGINT) AS cms_estimate,
       CAST(MIN(c) - exact_count AS BIGINT) AS overcount
FROM probes JOIN cells USING (d, bucket)
GROUP BY {key_col}, exact_count
"""


QUERY_SQL = {"heavy_hitters": HEAVY_HITTERS_SQL}


# --- KMV (theta) sketch: set-operation cardinalities ------------------------

THETA_K = 256  # sketch size: rel. std. error ~ 1/sqrt(K-2) ~ 6%
THETA_MIN_EVENTS = 14  # segment membership: >= median per-(user,type) count
_THETA_M = float(2**60)  # hash space size as an exact double (power of 2)


def theta_overlap(events: DataFrame) -> DataFrame:
    """KMV ("theta") sketch set operations over behavioral segments.

    HLL answers "how many distinct" for ONE set; the KMV sketch is the
    mergeable structure that also answers UNION and INTERSECTION across
    sets: keep the K smallest md5 hash values of each set's members —
    the K-th smallest value m_K estimates cardinality as
    (K-1)*M/m_K (uniform order statistics), and the union sketch is just
    the K smallest of the merged value sets, so |A∩B| follows by
    inclusion-exclusion. Per segment the sketch is K int64s regardless
    of member count, built with one top-K per segment — the only way to
    answer "how many users are in segment A and B" across hundreds of
    segments at 100 TB without a per-pair distinct shuffle.

    Segments: users with >= THETA_MIN_EVENTS events of a type (the
    median per-(user,type) count — membership ~half, so pairwise
    overlaps are genuinely partial). Sketches use md5 hashes, so BOTH
    engines build bit-identical sketches and every estimate column is
    exact-value-hash-checkable; the accuracy flags are emitted as
    literal TRUE by the oracle, so a driver run ENFORCES the error
    bounds (the events_distinct_sketch discipline). Estimates with
    n < K are the exact count (the sketch holds the whole set).

    Scale shape: membership is one map-side-combined (type, user) count;
    the per-segment top-K is a segment-partitioned window over hashes;
    everything after operates on <= K rows per segment. The pair frame
    is a constant-key equi-join of the tiny segment list with itself.

    Output per type pair: exact + estimated a/b/union/inter and two
    enforcement flags.
    """
    from pyspark.sql.window import Window

    members = (
        events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= THETA_MIN_EVENTS)
        .select(
            "event_type",
            "user_id",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("h"),
        )
        .localCheckpoint(eager=False)  # three consumers: sketches, exact counts, pairs
    )
    sk = members.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    ).filter(F.col("rn") <= THETA_K)
    stats = sk.groupBy("event_type").agg(
        F.max("h").alias("mk"), F.count(F.lit(1)).alias("nv")
    )
    exact = members.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    seg = stats.join(exact, "event_type")
    # segment-pair grid: both sides are aggregate-sized summaries (one
    # row per segment), so the broadcast cross is |segments|^2 tiny rows
    pairs = (
        seg.alias("sa")
        .crossJoin(F.broadcast(seg.alias("sb")))
        .filter(F.col("sa.event_type") < F.col("sb.event_type"))
        .select(
            F.col("sa.event_type").alias("type_a"),
            F.col("sb.event_type").alias("type_b"),
            F.col("sa.mk").alias("mk_a"),
            F.col("sa.nv").alias("nv_a"),
            F.col("sa.exact_n").alias("exact_a"),
            F.col("sb.mk").alias("mk_b"),
            F.col("sb.nv").alias("nv_b"),
            F.col("sb.exact_n").alias("exact_b"),
        )
    )
    # union sketch: K smallest distinct hashes of the merged member sets
    pa = pairs.select("type_a", "type_b")
    urows = (
        pa.join(sk.alias("ka"), F.col("ka.event_type") == F.col("type_a"))
        .select("type_a", "type_b", F.col("ka.h").alias("h"))
        .union(
            pa.join(sk.alias("kb"), F.col("kb.event_type") == F.col("type_b"))
            .select("type_a", "type_b", F.col("kb.h").alias("h"))
        )
        .distinct()
    )
    usk = (
        urows.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("type_a", "type_b").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= THETA_K)
        .groupBy("type_a", "type_b")
        .agg(F.max("h").alias("mk_u"), F.count(F.lit(1)).alias("nv_u"))
    )
    # exact union / intersection for the enforcement flags
    exact_inter = (
        members.alias("ma")
        .join(
            members.alias("mb"),
            (F.col("ma.user_id") == F.col("mb.user_id"))
            & (F.col("ma.event_type") < F.col("mb.event_type")),
        )
        .groupBy(
            F.col("ma.event_type").alias("type_a"),
            F.col("mb.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )

    def est(nv, mk):
        return F.when(F.col(nv) < THETA_K, F.col(nv).cast("long")).otherwise(
            F.floor(F.lit(float(THETA_K - 1)) * F.lit(_THETA_M) / F.col(mk))
        )

    out = (
        pairs.join(usk, ["type_a", "type_b"])
        .join(exact_inter, ["type_a", "type_b"], "left")
        .na.fill({"exact_inter": 0})
        .withColumn("est_a", est("nv_a", "mk_a"))
        .withColumn("est_b", est("nv_b", "mk_b"))
        .withColumn("est_union", est("nv_u", "mk_u"))
        .withColumn(
            "est_inter",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ),
        )
        .withColumn(
            "exact_union",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_inter"),
        )
    )
    return out.select(
        "type_a",
        "type_b",
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        "est_a",
        "est_b",
        "est_union",
        "est_inter",
        # union within 15% (2.4 sigma at K=256); intersection within 20%
        # OF THE UNION (theta-sketch error scales with the union size)
        (
            F.abs(F.col("est_union") - F.col("exact_union")) * 100
            <= 15 * F.col("exact_union")
        ).alias("union_within_15pct"),
        (
            F.abs(F.col("est_inter") - F.col("exact_inter")) * 5
            <= F.col("exact_union")
        ).alias("inter_within_20pct_of_union"),
    )


def theta_overlap_sql(table: str = "events") -> str:
    """DuckDB twin: identical sketch construction (md5 top-K, same floor
    division), exact set ops in SQL, literal-TRUE enforcement flags."""
    m_lit = f"{_THETA_M!r}"
    est_a = (
        f"CASE WHEN nv_a < {THETA_K} THEN nv_a "
        f"ELSE CAST(FLOOR({float(THETA_K - 1)!r} * {m_lit} / mk_a) AS BIGINT) END"
    )
    est_b = (
        f"CASE WHEN nv_b < {THETA_K} THEN nv_b "
        f"ELSE CAST(FLOOR({float(THETA_K - 1)!r} * {m_lit} / mk_b) AS BIGINT) END"
    )
    est_u = (
        f"CASE WHEN nv_u < {THETA_K} THEN nv_u "
        f"ELSE CAST(FLOOR({float(THETA_K - 1)!r} * {m_lit} / mk_u) AS BIGINT) END"
    )
    return f"""
WITH members AS (
  SELECT event_type, user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}
  GROUP BY event_type, user_id
  HAVING COUNT(*) >= {THETA_MIN_EVENTS}
),
sk AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM members)
  WHERE rn <= {THETA_K}
),
stats AS (
  SELECT event_type, MAX(h) AS mk, COUNT(*) AS nv FROM sk GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(*) AS exact_n FROM members GROUP BY event_type
),
seg AS (SELECT * FROM stats JOIN exact USING (event_type)),
pairs AS (
  SELECT sa.event_type AS type_a, sb.event_type AS type_b,
         sa.mk AS mk_a, sa.nv AS nv_a, sa.exact_n AS exact_a,
         sb.mk AS mk_b, sb.nv AS nv_b, sb.exact_n AS exact_b
  FROM seg sa JOIN seg sb ON sa.event_type < sb.event_type
),
urows AS (
  SELECT DISTINCT type_a, type_b, h FROM (
    SELECT p.type_a, p.type_b, k.h FROM pairs p JOIN sk k ON k.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, k.h FROM pairs p JOIN sk k ON k.event_type = p.type_b
  )
),
usk AS (
  SELECT type_a, type_b, MAX(h) AS mk_u, COUNT(*) AS nv_u
  FROM (SELECT type_a, type_b, h,
               ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
        FROM urows)
  WHERE rn <= {THETA_K}
  GROUP BY type_a, type_b
),
ei AS (
  SELECT ma.event_type AS type_a, mb.event_type AS type_b,
         COUNT(*) AS exact_inter
  FROM members ma JOIN members mb
    ON ma.user_id = mb.user_id AND ma.event_type < mb.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_a + exact_b - COALESCE(exact_inter, 0) AS BIGINT) AS exact_union,
       CAST(COALESCE(exact_inter, 0) AS BIGINT) AS exact_inter,
       CAST({est_a} AS BIGINT) AS est_a,
       CAST({est_b} AS BIGINT) AS est_b,
       CAST({est_u} AS BIGINT) AS est_union,
       CAST(GREATEST(0, ({est_a}) + ({est_b}) - ({est_u})) AS BIGINT) AS est_inter,
       TRUE AS union_within_15pct,
       TRUE AS inter_within_20pct_of_union
FROM pairs
JOIN usk USING (type_a, type_b)
LEFT JOIN ei USING (type_a, type_b)
"""


THETA_OVERLAP_SQL = theta_overlap_sql()
