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
    ).localCheckpoint()
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

QUERY_SQL = {"heavy_hitters": HEAVY_HITTERS_SQL}
