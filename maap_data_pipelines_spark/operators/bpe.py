"""BPE tokenization at corpus scale: tokenize the vocabulary, not the corpus.

A byte-pair-encoding tokenizer applies an ordered merge table to each
word. The naive shape — a Python UDF over every word OCCURRENCE — does
~total-token work in Python. The scale shape used here tokenizes each
DISTINCT word exactly once (the vocabulary is orders of magnitude
smaller than the corpus: ~100M types vs ~100T tokens at 100 TB) and
joins the per-word token count back to the occurrence stream by word —
an equi-join AQE turns into a broadcast when the vocab side is small,
and a well-partitioned shuffle join when it is not. Python cost is
O(|vocab|), not O(|corpus|).

The merge table is a fixed model artifact (constants below, tuned to the
lowercase-ascii corpus); ``bpe_encode`` is the reference implementation
the Arrow UDF vectorizes. No SQL oracle exists for iterative merge
application, so the registered query takes the driver's rows-only check;
exact tokenizations are pinned by tests/test_bpe.py instead.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# Ordered merge table (highest priority first) — a frozen model artifact.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("o", "n"),
    ("e", "r"),
    ("a", "r"),
    ("o", "r"),
    ("s", "t"),
    ("l", "e"),
    ("c", "k"),
    ("r", "o"),
    ("ro", "w"),
    ("q", "u"),
    ("qu", "e"),
    ("s", "c"),
    ("sc", "an"),
    ("t", "ab"),
    ("a", "b"),
    ("v", "a"),
    ("va", "l"),
    ("u", "e"),
    ("f", "a"),
    ("fa", "st"),
    ("s", "l"),
    ("sl", "o"),
    ("slo", "w"),
    ("d", "at"),
    ("a", "t"),
    ("dat", "a"),
)

_RANK = {pair: i for i, pair in enumerate(MERGES)}


def bpe_encode(word: str) -> list[str]:
    """Reference BPE: repeatedly merge the best-ranked adjacent pair."""
    toks = list(word)
    while len(toks) > 1:
        best_i, best_rank = -1, len(_RANK)
        for i in range(len(toks) - 1):
            r = _RANK.get((toks[i], toks[i + 1]), len(_RANK))
            if r < best_rank:
                best_i, best_rank = i, r
        if best_i < 0 or best_rank == len(_RANK):
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


@lru_cache(maxsize=1 << 20)
def _count(word: str) -> int:
    return len(bpe_encode(word))


@pandas_udf(LongType())
def bpe_token_count_udf(words: pd.Series) -> pd.Series:
    # lru_cache across batches: each distinct word is encoded once per
    # executor even if the upstream distinct is imperfect.
    return words.map(_count).astype("int64")


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Per-document BPE token counts via the vocabulary-join pattern.

    Output: (doc_id, n_words, n_bpe_tokens, n_chars) — n_bpe_tokens is
    the sum over the document's words of the word's BPE token count.
    """
    occurrences = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    vocab = occurrences.select("word").distinct()
    counted = vocab.select(
        "word", bpe_token_count_udf(F.col("word")).alias("word_tokens")
    )
    # Equi-join on word: AQE broadcasts the (small) vocab side; at web
    # scale it degrades gracefully to a partitioned shuffle join.
    return (
        occurrences.join(counted, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_tokens").alias("n_bpe_tokens"),
            F.sum(F.length("word")).alias("n_chars"),
        )
    )
