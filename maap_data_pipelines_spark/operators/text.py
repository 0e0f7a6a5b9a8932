"""Text-analysis operators for LLM training-data pipelines.

All pure column expressions (JVM codegen, zero UDFs): tokenization stats,
quality scoring, stopword-heuristic language ID, positional rolling-hash
fingerprints. Each operator has a structurally identical DuckDB SQL
rendering so the driver's value-hash check is exact.

Determinism contract: every float output is derived from exact integer
counts via a single division (+ round 6dp) — no float accumulation. All
integer outputs are BIGINT on both engines (Spark ``size``/``length``
return int32 while DuckDB ``len``/``length`` return int64, so the Spark
side casts to long — the driver's value hash is Arrow-type-sensitive).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..functions.hashing import MERSENNE_31, md5_long, md5_long_sql

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "die", "das", "nicht"),
    "en": ("the", "and", "of", "is", "to"),
    "es": ("el", "los", "las", "y", "que"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "wo3"),
}
LANG_ORDER = ("de", "en", "es", "fr", "zh")  # deterministic tie-break


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def _size(col: Column) -> Column:
    """Array length as BIGINT (DuckDB len() parity)."""
    return F.size(col).cast("long")


def _in_list_count(words: Column, vocab: tuple[str, ...]) -> Column:
    return _size(F.filter(words, lambda w: w.isin(*vocab)))


def _in_list_count_sql(words_expr: str, vocab: tuple[str, ...]) -> str:
    lits = ", ".join(f"'{v}'" for v in vocab)
    return f"len(list_filter({words_expr}, w -> w IN ({lits})))"


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    lower = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        _size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        _size(F.regexp_extract_all(lower, F.lit("[a-z]+"), 0)).alias("n_alpha_tokens"),
        _size(F.regexp_extract_all(lower, F.lit("[0-9]+"), 0)).alias("n_num_tokens"),
        _size(F.regexp_extract_all(lower, F.lit("[^a-z0-9 ]"), 0)).alias(
            "n_other_tokens"
        ),
        F.length(F.col("text")).cast("long").alias("n_chars_actual"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' '))                              AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+'))            AS n_alpha_tokens,
       len(regexp_extract_all(lower(text), '[0-9]+'))            AS n_num_tokens,
       len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))        AS n_other_tokens,
       length(text)                                              AS n_chars_actual
FROM documents
"""


def text_quality(docs: DataFrame) -> DataFrame:
    """Quality score from exact integer counts (single-division floats)."""
    words = words_col(F.col("text"))
    n_words = _size(words)
    n_chars = F.length(F.col("text")).cast("long")
    n_punct = _size(F.regexp_extract_all(F.col("text"), F.lit(r"[.,;:!?]"), 0))
    n_stop = _in_list_count(words, STOPWORDS)
    punct_ratio = F.round(n_punct / n_chars, 6)
    stop_ratio = F.round(n_stop / n_words, 6)
    word_score = F.round(F.least(F.lit(100).cast("long"), n_words) / 100, 6)
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars_actual"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        word_score.alias("length_score"),
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' '))  AS n_words,
       length(text)                  AS n_chars_actual,
       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       {_in_list_count_sql("string_split(text, ' ')", STOPWORDS)} AS n_stopwords,
       ROUND(len(regexp_extract_all(text, '[.,;:!?]')) / length(text), 6) AS punct_ratio,
       ROUND({_in_list_count_sql("string_split(text, ' ')", STOPWORDS)}
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       ROUND(LEAST(100, len(string_split(text, ' '))) / 100, 6) AS length_score
FROM documents
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID, aggregated into a confusion table.

    Mirrors n-gram-heuristic language ID at the cheapest useful fidelity;
    ties broken by fixed LANG_ORDER, all-zero scores → 'und'.

    Scale shape: explode words once, count marker hits per language with
    codegen'd conditional sums (map-side combine collapses each doc to one
    row before the shuffle), then decide the winner over the five tiny
    score columns. The naive formulation — a CASE tree re-evaluating an
    interpreted higher-order ``filter`` lambda ~45x per document — was
    measured ~100x slower and would be CPU-bound at 100 TB.
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("word")
    exploded = docs.select("doc_id", F.col("lang").alias("declared_lang"), word)
    score_cols = [
        F.sum(F.when(F.col("word").isin(*markers), 1).otherwise(0)).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = exploded.groupBy("doc_id", "declared_lang").agg(*score_cols)
    # reversed fold means earlier LANG_ORDER entries take precedence on ties
    pred_first = F.lit("und")
    for lang in reversed(LANG_ORDER):
        cond = F.col(f"s_{lang}") > 0
        for other in LANG_ORDER:
            if other == lang:
                continue
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        pred_first = F.when(cond, F.lit(lang)).otherwise(pred_first)
    return (
        scored.select("declared_lang", pred_first.alias("predicted_lang"))
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lang_id_case_sql() -> str:
    w = "string_split(lower(text), ' ')"
    score = {
        lang: _in_list_count_sql(w, markers) for lang, markers in LANG_MARKERS.items()
    }
    branches = []
    for lang in LANG_ORDER:
        conds = [f"({score[lang]}) > 0"]
        for other in LANG_ORDER:
            if other != lang:
                conds.append(f"({score[lang]}) >= ({score[other]})")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


LANG_ID_SQL = f"""
SELECT lang AS declared_lang,
       {_lang_id_case_sql()} AS predicted_lang,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive positional rolling hash (mod 2^31-1) per document.

    The per-term modulus bounds every intermediate: each term is < 2^31,
    so a partial sum only reaches n_partial * 2^31 — exact in int64 up to
    ~2^32 words/doc; DuckDB raises on BIGINT overflow while Spark wraps,
    so bounded intermediates are a parity requirement, not a nicety.
    Modular sums are associative+commutative, so sum-of-(term mod M) mod M
    equals the reference left-fold exactly.

    Scale shape: posexplode + codegen hash + partial aggregation — the
    map-side combine collapses each document to a single (doc_id, sum,
    count) row before the shuffle. The higher-order zip_with/aggregate
    formulation (interpreted lambdas) measured ~50x slower per core.
    """
    word = F.posexplode(words_col(F.col("text")))
    exploded = docs.select("doc_id", word.alias("pos", "word"))
    term = F.pmod(
        (F.col("pos") + 1).cast("long") * (md5_long(F.col("word")) % MERSENNE_31),
        F.lit(MERSENNE_31).cast("long"),
    )
    return exploded.groupBy("doc_id").agg(
        F.pmod(F.sum(term), F.lit(MERSENNE_31).cast("long")).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_words"),
    )


DOC_FINGERPRINT_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(list_zip(words, range(1, len(words) + 1)),
             p -> p[2]::BIGINT * ({md5_long_sql('p[1]')} % {MERSENNE_31}))),
         (x, y) -> (x + y) % {MERSENNE_31}) AS fingerprint,
       len(words) AS n_words
FROM w
"""


QUALITY_MIN_WORDS = 10
QUALITY_MAX_WORDS = 1000
QUALITY_MIN_MEAN_WLEN = 2.0
QUALITY_MAX_MEAN_WLEN = 12.0
QUALITY_MAX_SYMBOL_RATIO = 0.1


def quality_filter(docs: DataFrame) -> DataFrame:
    """C4/Gopher-style hard quality rules -> keep flag + first-fail reason.

    Rules (all from exact integer counts, single divisions):
      word_count   : QUALITY_MIN_WORDS <= n_words <= QUALITY_MAX_WORDS
      mean_wlen    : 2.0 <= (n_chars - n_spaces) / n_words <= 12.0
      has_stopword : >= 1 token from the stopword list
      symbol_ratio : non-alnum-space chars / n_chars <= 0.1
    Reason is the FIRST failing rule in that order ('ok' if kept) —
    deterministic, so the filter's rejection histogram is itself a
    monitorable table.
    """
    words = words_col(F.col("text"))
    n_words = _size(words)
    n_chars = F.length(F.col("text")).cast("long")
    n_spaces = _size(F.regexp_extract_all(F.col("text"), F.lit(" "), 0))
    n_sym = _size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[^a-z0-9 ]"), 0))
    n_stop = _in_list_count(F.split(F.lower(F.col("text")), " "), STOPWORDS)
    mean_wlen = F.round((n_chars - n_spaces) / n_words, 6)
    symbol_ratio = F.round(n_sym / n_chars, 6)
    ok_words = (n_words >= QUALITY_MIN_WORDS) & (n_words <= QUALITY_MAX_WORDS)
    ok_wlen = (mean_wlen >= QUALITY_MIN_MEAN_WLEN) & (
        mean_wlen <= QUALITY_MAX_MEAN_WLEN
    )
    ok_stop = n_stop >= 1
    ok_sym = symbol_ratio <= QUALITY_MAX_SYMBOL_RATIO
    reason = (
        F.when(~ok_words, "word_count")
        .when(~ok_wlen, "mean_wlen")
        .when(~ok_stop, "no_stopword")
        .when(~ok_sym, "symbol_ratio")
        .otherwise("ok")
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop.alias("n_stopwords"),
        (ok_words & ok_wlen & ok_stop & ok_sym).alias("keep"),
        reason.alias("reason"),
    )


_Q_WORDS = "len(string_split(text, ' '))"
_Q_CHARS = "length(text)"
_Q_SPACES = "len(regexp_extract_all(text, ' '))"
_Q_SYM = "len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))"
_Q_STOP = _in_list_count_sql("string_split(lower(text), ' ')", STOPWORDS)

QUALITY_FILTER_SQL = f"""
WITH m AS (
  SELECT doc_id,
         {_Q_WORDS} AS n_words,
         ROUND(({_Q_CHARS} - {_Q_SPACES}) / {_Q_WORDS}, 6) AS mean_wlen,
         ROUND({_Q_SYM} / {_Q_CHARS}, 6) AS symbol_ratio,
         {_Q_STOP} AS n_stopwords
  FROM documents
)
SELECT doc_id, n_words, mean_wlen, symbol_ratio, n_stopwords,
       (n_words BETWEEN {QUALITY_MIN_WORDS} AND {QUALITY_MAX_WORDS})
         AND (mean_wlen BETWEEN {QUALITY_MIN_MEAN_WLEN} AND {QUALITY_MAX_MEAN_WLEN})
         AND (n_stopwords >= 1)
         AND (symbol_ratio <= {QUALITY_MAX_SYMBOL_RATIO}) AS keep,
       CASE WHEN NOT (n_words BETWEEN {QUALITY_MIN_WORDS} AND {QUALITY_MAX_WORDS}) THEN 'word_count'
            WHEN NOT (mean_wlen BETWEEN {QUALITY_MIN_MEAN_WLEN} AND {QUALITY_MAX_MEAN_WLEN}) THEN 'mean_wlen'
            WHEN n_stopwords < 1 THEN 'no_stopword'
            WHEN symbol_ratio > {QUALITY_MAX_SYMBOL_RATIO} THEN 'symbol_ratio'
            ELSE 'ok' END AS reason
FROM m
"""


TOPK_TERMS = 20
TFIDF_TOPK = 3


def term_topk(docs: DataFrame) -> DataFrame:
    """Global top-20 terms by occurrence count (term asc tiebreak).

    Scale shape: explode -> hash-agg on term (map-side combine collapses
    each partition's counts before the shuffle), then a global top-k via
    ``orderBy().limit()`` — Spark plans TakeOrderedAndProject: each
    partition keeps its local top-20, only ~partitions*20 rows reach the
    driver-side merge. No single partition ever sorts the whole vocab.
    """
    from pyspark.sql.window import Window

    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    counts = (
        docs.select(word)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "term")
        .limit(TOPK_TERMS)
    )
    w = Window.orderBy(F.desc("n_occurrences"), "term")
    return counts.withColumn("rnk", F.row_number().over(w).cast("long"))


TERM_TOPK_SQL = f"""
WITH c AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
counts AS (
  SELECT term, COUNT(*) AS n_occurrences FROM c GROUP BY term
  ORDER BY n_occurrences DESC, term LIMIT {TOPK_TERMS}
)
SELECT term, n_occurrences,
       row_number() OVER (ORDER BY n_occurrences DESC, term) AS rnk
FROM counts
"""


def bigram_topk(docs: DataFrame) -> DataFrame:
    """Global top-20 adjacent-word bigrams.

    The bigram list is built with ``arrays_zip(slice(w,1,n-1),
    slice(w,2,n-1))`` — all built-in array expressions, no higher-order
    lambdas (those run interpreted, measured 10-100x slower; see
    doc_fingerprint history) — then explode + hash-agg + the same
    TakeOrderedAndProject top-k as :func:`term_topk`.
    """
    from pyspark.sql.window import Window

    words = words_col(F.lower(F.col("text")))
    n = F.size(words)
    z = F.arrays_zip(
        F.slice(words, 1, n - 1).alias("w1"), F.slice(words, 2, n - 1).alias("w2")
    )
    counts = (
        docs.select(F.explode(z).alias("bg"))
        .select(F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(TOPK_TERMS)
    )
    w = Window.orderBy(F.desc("n_occurrences"), "bigram")
    return counts.withColumn("rnk", F.row_number().over(w).cast("long"))


BIGRAM_TOPK_SQL = f"""
WITH w AS (
  SELECT string_split(lower(text), ' ') AS ws FROM documents
),
b AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM w
),
counts AS (
  SELECT bigram, COUNT(*) AS n_occurrences FROM b GROUP BY bigram
  ORDER BY n_occurrences DESC, bigram LIMIT {TOPK_TERMS}
)
SELECT bigram, n_occurrences,
       row_number() OVER (ORDER BY n_occurrences DESC, bigram) AS rnk
FROM counts
"""


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """Per-document top-3 distinctive terms, integer-exact TF-IDF ranking.

    Ranks by (tf desc, df asc, term asc) — the same ordering tf*log(N/df)
    induces for fixed tf, with no float logarithm to diverge between
    engines. Two hash-aggs (doc-term tf, then term df) + a shuffle join on
    term + a per-doc window whose partition size is bounded by distinct
    terms per document, not by corpus size. The term join key is skewed
    toward stopwords at web scale — AQE skew-join splits those reducers.
    """
    from pyspark.sql.window import Window

    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    tf = (
        docs.select("doc_id", word)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), "df", "term")
    return (
        tf.join(df_, "term")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "rnk")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df,
       row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df, term) AS rnk
FROM tf JOIN df USING (term)
QUALIFY rnk <= {TFIDF_TOPK}
"""


VOCAB_SRC_A = "src0"
VOCAB_SRC_B = "src1"


def vocab_diff(docs: DataFrame) -> DataFrame:
    """Set difference of vocabularies: terms in src0 docs but not src1.

    EXCEPT (DISTINCT) between the two per-source vocabularies — both
    sides collapse to distinct terms BEFORE the set op, so the anti-join
    shuffle carries vocab-sized, not corpus-sized, rows.
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    va = docs.filter(F.col("source") == VOCAB_SRC_A).select(word).distinct()
    vb = docs.filter(F.col("source") == VOCAB_SRC_B).select(word).distinct()
    return va.exceptAll(vb).distinct()


VOCAB_DIFF_SQL = f"""
SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term
FROM documents WHERE source = '{VOCAB_SRC_A}'
EXCEPT
SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term
FROM documents WHERE source = '{VOCAB_SRC_B}'
"""


def fuzzy_word_pairs(docs: DataFrame) -> DataFrame:
    """Edit-distance-1 word pairs via deletion-neighborhood blocking.

    The SymSpell trick makes fuzzy matching an EQUI-join: every word
    emits itself plus its 1-deletion variants as block keys; any pair
    within Levenshtein 1 (insert/delete/substitute) shares at least one
    key, so candidates come from a key self-join — never an all-pairs
    cross join — and the exact ``levenshtein() <= 1`` filter runs on the
    bounded candidate set only. The interpreted ``transform`` lambda that
    generates variants runs on the DISTINCT-vocab table (tiny relative to
    the corpus), not per occurrence — the same vocabulary-first pattern
    as the BPE tokenizer.
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("word")
    vocab = docs.select(word).distinct()
    variants = vocab.select(
        "word",
        F.explode(
            F.concat(
                F.array(F.col("word")),
                F.expr(
                    "transform(sequence(1, length(word)), "
                    "i -> concat(substring(word, 1, i - 1), substring(word, i + 1, length(word))))"
                ),
            )
        ).alias("vkey"),
    ).distinct()
    a = variants.select(F.col("word").alias("word_a"), "vkey")
    b = variants.select(F.col("word").alias("word_b"), "vkey")
    return (
        a.join(b, "vkey")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
        .withColumn("dist", F.levenshtein("word_a", "word_b").cast("long"))
        .filter(F.col("dist") <= 1)
    )


FUZZY_WORD_PAIRS_SQL = """
WITH v AS (
  SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS word FROM documents
)
SELECT a.word AS word_a, b.word AS word_b,
       CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
FROM v a JOIN v b ON a.word < b.word
WHERE levenshtein(a.word, b.word) <= 1
"""


def text_normalize(docs: DataFrame) -> DataFrame:
    """Canonicalize text ahead of exact dedup: case/punct/whitespace.

    lower -> strip non-[a-z0-9 ] -> collapse runs of spaces -> trim; the
    normalized text crosses as md5 plus an exact changed flag. This is
    the step that turns 'Hello,  World!' and 'hello world' into the
    same dedup key — exact dedup without it undercounts duplicates.
    Pure row-local regex work, zero shuffle, scan speed.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_md5"),
    )


TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       length(norm) AS n_chars_norm,
       norm <> text AS changed,
       md5(norm) AS norm_md5
FROM n
"""


def doc_perplexity(docs: DataFrame) -> DataFrame:
    """Per-document bigram-LM perplexity (add-one smoothing, self-trained).

    The classic LM-based quality filter (CCNet/KenLM style): train a
    bigram model on the corpus itself — c(w1,w2) and context counts
    c(w1) via two hash-aggs over the exploded bigram stream — then score
    every document's average surprisal under it,
    ``P(w2|w1) = (c12 + 1) / (c1 + V)`` with V = corpus vocabulary size
    (one-row broadcast). High-perplexity docs are boilerplate/garbled
    outliers under the corpus's own statistics; no external model needed.

    Scale shape: the LM tables are vocabulary-bounded, not corpus-bounded
    — the (w1, w2) join streams the bigram occurrences against hash-agg
    outputs that AQE can broadcast once vocab << corpus; the stopword-
    headed key skew is the standard AQE skew-join case. Every arithmetic
    term is ln(integer), so both engines evaluate identical inputs; the
    float tail beyond 6 dp is rounded away. Docs with < 2 tokens have no
    bigrams and drop out (no perplexity is defined for them).

    Output: (doc_id, n_bigrams, avg_nll, ppl = exp(avg_nll)).
    """
    words = words_col(F.lower(F.col("text")))
    toks = docs.select("doc_id", words.alias("ws"))
    n = F.size(F.col("ws"))
    z = F.arrays_zip(
        F.slice(F.col("ws"), 1, n - 1).alias("w1"),
        F.slice(F.col("ws"), 2, n - 1).alias("w2"),
    )
    pairs = toks.select("doc_id", F.explode(z).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = docs.select(F.explode(words).alias("t")).agg(
        F.countDistinct("t").alias("vocab")
    )
    nll = F.avg(
        F.log(F.col("c1") + F.col("vocab")) - F.log(F.col("c12") + F.lit(1))
    )
    return (
        pairs.join(big, ["w1", "w2"])
        .join(uni, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), nll.alias("nll"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round("nll", 6).alias("avg_nll"),
            F.round(F.exp("nll"), 6).alias("ppl"),
        )
    )


DOC_PERPLEXITY_SQL = """
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM w
),
big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
uni AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1),
v AS (
  SELECT COUNT(DISTINCT t) AS vocab
  FROM (SELECT unnest(ws) AS t FROM w)
),
s AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         AVG(ln(c1 + vocab) - ln(c12 + 1)) AS nll
  FROM pairs JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       ROUND(nll, 6) AS avg_nll,
       ROUND(exp(nll), 6) AS ppl
FROM s
"""



DOC_COS_MAX_DF = 100
DOC_COS_TOPK = 3


def doc_cosine_topk(docs: DataFrame) -> DataFrame:
    """"More like this" by sparse TF-cosine: inverted-index retrieval.

    The bag-of-words complement to ``similar_docs_topk``'s set Jaccard:
    documents as sparse term-frequency vectors, cosine computed WITHOUT
    materializing vectors — the classic IR inverted-index join. A pair
    is scored only if it shares a term whose document frequency is <=
    DOC_COS_MAX_DF (the same hot-key guard as the shingle index: one
    stopword at 100 TB is a quadratic reducer; norms are computed over
    the SAME pruned space so the cosine is self-consistent). Dot
    products are exact int64 sums of tf_a*tf_b; each norm is one sqrt
    of an exact integer, one division, round 6 — the engine-parity
    float discipline. Per-doc top-3 after symmetrizing, ranked
    (cosine desc, neighbor asc) via WindowGroupLimit.
    """
    from pyspark.sql.window import Window

    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    tf = (
        docs.select("doc_id", word)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    kept = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DOC_COS_MAX_DF)
        .select("term")
    )
    tfk = tf.join(kept, "term").localCheckpoint(eager=False)
    norms = tfk.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("ssq"))
    a = tfk.select("term", F.col("doc_id").alias("da"), F.col("tf").alias("ta"))
    b = tfk.select("term", F.col("doc_id").alias("db"), F.col("tf").alias("tb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.sum(F.col("ta") * F.col("tb")).alias("dot"))
    )
    scored = (
        dots.join(norms.select(F.col("doc_id").alias("da"), F.col("ssq").alias("sa")), "da")
        .join(norms.select(F.col("doc_id").alias("db"), F.col("ssq").alias("sb")), "db")
        .select(
            "da",
            "db",
            F.round(
                F.col("dot") / (F.sqrt(F.col("sa")) * F.sqrt(F.col("sb"))), 6
            ).alias("cosine"),
        )
    )
    sym = scored.select(
        F.col("da").alias("doc_id"), F.col("db").alias("neighbor_id"), "cosine"
    ).unionAll(
        scored.select(
            F.col("db").alias("doc_id"), F.col("da").alias("neighbor_id"), "cosine"
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= DOC_COS_TOPK)
        .select("doc_id", "neighbor_id", "cosine", "rnk")
    )


DOC_COSINE_TOPK_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
kept AS (
  SELECT term FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
  WHERE df <= {DOC_COS_MAX_DF}
),
tfk AS MATERIALIZED (SELECT doc_id, term, tf FROM tf JOIN kept USING (term)),
norms AS (SELECT doc_id, SUM(tf * tf) AS ssq FROM tfk GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM tfk a JOIN tfk b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT da, db,
         ROUND(dot / (sqrt(na.ssq::DOUBLE) * sqrt(nb.ssq::DOUBLE)), 6) AS cosine
  FROM dots JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
),
sym AS (
  SELECT da AS doc_id, db AS neighbor_id, cosine FROM scored
  UNION ALL
  SELECT db AS doc_id, da AS neighbor_id, cosine FROM scored
)
SELECT doc_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY doc_id ORDER BY cosine DESC, neighbor_id) AS rnk
FROM sym
QUALIFY rnk <= {DOC_COS_TOPK}
"""



def vocab_overlap(docs: DataFrame) -> DataFrame:
    """Vocabulary overlap between two sources: the INTERSECT set-op.

    The complement of ``vocab_diff``: one summary row with per-source
    vocab sizes, the INTERSECT cardinality, and the exact vocabulary
    Jaccard (integer counts, single division, round 6) — the corpus-
    similarity monitor for "did these two sources converge". All three
    cardinalities shuffle vocab-sized rows (distinct-before-set-op).
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    va = docs.filter(F.col("source") == VOCAB_SRC_A).select(word).distinct()
    vb = docs.filter(F.col("source") == VOCAB_SRC_B).select(word).distinct()
    common = va.intersect(vb)
    na = va.agg(F.count(F.lit(1)).alias("n_vocab_a"))
    nb = vb.agg(F.count(F.lit(1)).alias("n_vocab_b"))
    nc = common.agg(F.count(F.lit(1)).alias("n_common"))
    return (
        na.crossJoin(nb)
        .crossJoin(nc)
        .withColumn(
            "vocab_jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_vocab_a") + F.col("n_vocab_b") - F.col("n_common")),
                6,
            ),
        )
    )


VOCAB_OVERLAP_SQL = f"""
WITH va AS (
  SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE source = '{VOCAB_SRC_A}'
),
vb AS (
  SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE source = '{VOCAB_SRC_B}'
),
c AS (SELECT term FROM va INTERSECT SELECT term FROM vb)
SELECT (SELECT COUNT(*) FROM va) AS n_vocab_a,
       (SELECT COUNT(*) FROM vb) AS n_vocab_b,
       (SELECT COUNT(*) FROM c) AS n_common,
       ROUND((SELECT COUNT(*) FROM c) /
             ((SELECT COUNT(*) FROM va) + (SELECT COUNT(*) FROM vb)
              - (SELECT COUNT(*) FROM c)), 6) AS vocab_jaccard
"""


# --- bm25_topk: integer-exact ranked retrieval ----------------------------

# Static benchmark query set (query_id, terms) — literal on both sides.
BM25_QUERIES = [
    (0, ("hash", "join")),
    (1, ("window", "agg")),
    (2, ("slow", "scan", "filter")),
    (3, ("customer", "order")),
    (4, ("stream", "batch")),
    (5, ("vector", "merge")),
]
BM25_TOPK = 10


def bm25_topk(docs: DataFrame) -> DataFrame:
    """Top-10 docs per query under an integer-exact BM25 variant.

    Classic BM25 shape (k1 = 6/5, b = 3/4) with the term-frequency
    saturation kept as EXACT rational arithmetic folded into int64
    fixed-point: tf-weight_micro = (22·tf·L·10⁶) div (10·L·tf + 3·L +
    9·dl·N) — that IS tf(k1+1)/(tf + k1(1−b+b·dl/avdl)) with avdl = L/N,
    numerator and denominator multiplied through by 10·L, floored once at
    micro precision. The float log-idf is replaced by the monotone
    rational surrogate idf_s = 1000·N div (df+1) (same document ordering
    per term; no transcendental to diverge between engines — the
    tfidf_top_terms lesson). Scores are exact int64 sums, so ranking
    never depends on float association order.

    Plan: tf/df/dl are the inverted-index aggregates; the tiny query set
    broadcasts into the posting lists (equi-join on term — only
    query-term postings survive to scoring); corpus stats ride a 1-row
    broadcast; per-query top-10 uses row_number + filter, which Spark
    rewrites to a WindowGroupLimit partial top-k before the rank
    shuffle. int64 headroom: 22·tf·L·10⁶ needs tf·L < 4·10¹¹ — rescale
    the 10⁶ before corpora beyond ~10¹⁰ tokens.
    """
    from pyspark.sql.window import Window

    words = docs.select(
        "doc_id", F.explode(words_col(F.lower(F.col("text")))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    q = docs.sparkSession.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id BIGINT, term STRING",
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_s", F.expr("(n_docs * 1000) div (df + 1)"))
        .withColumn(
            "tfw",
            F.expr(
                "(22 * tf * total_len * 1000000) div"
                " (10 * total_len * tf + 3 * total_len + 9 * dl * n_docs)"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.expr("idf_s * tfw")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= BM25_TOPK)
    )


_BM25_VALUES = ",\n         ".join(
    f"(CAST({qid} AS BIGINT), '{t}')"
    for qid, terms in BM25_QUERIES
    for t in terms
)

_BM25_CTES = f"""words AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
q(query_id, term) AS (
  VALUES {_BM25_VALUES}
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(SUM(
           ((n_docs * 1000) // (df + 1)) *
           ((22 * tf * total_len * 1000000) //
            (10 * total_len * tf + 3 * total_len + 9 * dl * n_docs))
         ) AS BIGINT) AS score
  FROM tf
  JOIN q USING (term)
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)"""

BM25_TOPK_SQL = f"""
WITH {_BM25_CTES}
SELECT query_id, doc_id, score, rnk
FROM ranked WHERE rnk <= {BM25_TOPK}
"""


def retrieval_ndcg(docs: DataFrame) -> DataFrame:
    """NDCG@10 of the BM25 ranking against a graded lexical-relevance
    truth — the RANKING-QUALITY rung of the retrieval tier (bm25 recall
    monitors ask "did the right docs surface"; NDCG asks "in the right
    ORDER, weighted by grade" — the metric retrieval regressions are
    actually gated on).

    Relevance grade rel(q, d) = number of the query's DISTINCT terms
    present in d (0..|terms| — deterministic, oracle-able, and graded
    rather than binary). DCG = Σ (2^rel − 1)/log2(r+1) over the BM25
    top-10, each rank row floor-quantized to integer MICRO before the
    sum (one identical pow/log2 double tree per row — the zipf
    one-transcendental-per-integer discipline); IDCG re-ranks the
    query's relevant docs by (rel desc, doc_id) through the SAME gain
    tree. ndcg_ppm = dcg·1e6 div idcg, NULL when a query has no
    relevant doc at all.

    Scale shape: composes bm25_topk (inherits its allowlisted 1-row
    corpus-stats broadcast); the relevance frame is the query-term
    postings semi-join (bounded by the query vocabulary, never the
    corpus), the ideal ranking a per-query top-10 WindowGroupLimit.
    """
    from pyspark.sql.window import Window

    ranked = bm25_topk(docs)
    words = docs.select(
        "doc_id", F.explode(words_col(F.lower(F.col("text")))).alias("term")
    ).distinct()
    q = docs.sparkSession.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id BIGINT, term STRING",
    )
    rel = (
        words.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    gain = (
        "CAST(FLOOR((pow(2.0, CAST({rel} AS DOUBLE)) - 1.0) * 1000000"
        " / log2(CAST({rnk} AS DOUBLE) + 1.0)) AS BIGINT)"
    )
    dcg = (
        ranked.join(rel, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            F.expr(
                gain.format(rel="COALESCE(rel, 0)", rnk="rnk")
            ).alias("g"),
        )
        .groupBy("query_id")
        .agg(F.sum("g").alias("dcg_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "doc_id")
    ideal = (
        rel.withColumn("irnk", F.row_number().over(w).cast("long"))
        .filter(F.col("irnk") <= BM25_TOPK)
        .select(
            "query_id",
            F.expr(gain.format(rel="rel", rnk="irnk")).alias("g"),
        )
        .groupBy("query_id")
        .agg(
            F.sum("g").alias("idcg_micro"),
            F.count(F.lit(1)).alias("n_ideal"),
        )
    )
    return (
        dcg.join(ideal, "query_id", "full_outer")
        .select(
            "query_id",
            F.coalesce("dcg_micro", F.lit(0)).alias("dcg_micro"),
            F.coalesce("idcg_micro", F.lit(0)).alias("idcg_micro"),
            F.coalesce("n_ideal", F.lit(0)).alias("n_ideal"),
            F.expr(
                "(COALESCE(dcg_micro, 0) * 1000000)"
                " div NULLIF(COALESCE(idcg_micro, 0), 0)"
            ).alias("ndcg_ppm"),
        )
    )


RETRIEVAL_NDCG_SQL = f"""
WITH {{BM25_CTES}},
topk AS (SELECT query_id, doc_id, rnk FROM ranked WHERE rnk <= {BM25_TOPK}),
dwords AS (SELECT DISTINCT doc_id, term FROM words),
rel AS (
  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS rel
  FROM dwords JOIN q USING (term)
  GROUP BY 1, 2
),
dcg AS (
  SELECT t.query_id,
         CAST(SUM(CAST(FLOOR((pow(2.0, CAST(COALESCE(rel, 0) AS DOUBLE)) - 1.0)
              * 1000000 / log2(CAST(rnk AS DOUBLE) + 1.0)) AS BIGINT))
              AS BIGINT) AS dcg_micro
  FROM topk t LEFT JOIN rel
    ON rel.query_id = t.query_id AND rel.doc_id = t.doc_id
  GROUP BY 1
),
ideal AS (
  SELECT query_id,
         CAST(SUM(CAST(FLOOR((pow(2.0, CAST(rel AS DOUBLE)) - 1.0) * 1000000
              / log2(CAST(irnk AS DOUBLE) + 1.0)) AS BIGINT)) AS BIGINT)
           AS idcg_micro,
         CAST(COUNT(*) AS BIGINT) AS n_ideal
  FROM (
    SELECT query_id, rel,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY rel DESC, doc_id) AS BIGINT) AS irnk
    FROM rel
  ) WHERE irnk <= {BM25_TOPK}
  GROUP BY 1
)
SELECT query_id,
       COALESCE(dcg_micro, 0) AS dcg_micro,
       COALESCE(idcg_micro, 0) AS idcg_micro,
       COALESCE(n_ideal, 0) AS n_ideal,
       (COALESCE(dcg_micro, 0) * 1000000)
         // NULLIF(COALESCE(idcg_micro, 0), 0) AS ndcg_ppm
FROM dcg FULL OUTER JOIN ideal USING (query_id)
"""

RETRIEVAL_NDCG_SQL = RETRIEVAL_NDCG_SQL.format(BM25_CTES=_BM25_CTES)


MAP_REL_MIN_TERMS = 2  # binary relevance: doc carries >= 2 distinct query terms


def retrieval_map(docs: DataFrame) -> DataFrame:
    """Average precision@10 of the BM25 ranking per query, plus the
    corpus MAP — the PRECISION-MASS rung of the retrieval tier beside
    retrieval_ndcg's graded-order rung: NDCG rewards putting HIGH-grade
    docs early, AP rewards putting ALL relevant docs early (a ranker
    can win one and lose the other; regression gates watch both).

    Binary relevance: rel(q, d) = the doc contains >= 2 of the query's
    DISTINCT terms (>= 1 would be degenerate — BM25 only ever ranks
    docs containing a query term, so every ranked doc would be relevant
    and precision identically 1). AP@10 = Σ_{hit ranks i} P@i over
    min(R, 10), with P@i = hits_i·1e6 div i floor-quantized per rank
    row (exact int64 — no float crosses the oracle boundary anywhere in
    this operator); MAP = Σ ap_micro div n_queries, repeated per row
    via a queries-row broadcast cross.

    Scale shape: composes bm25_topk (inherits its allowlisted 1-row
    corpus-stats broadcast); the relevance frame is the query-term
    postings semi-join (query-vocabulary-bounded); the running hit
    count is a window over top-10 rows per query (bounded grain).
    """
    from pyspark.sql.window import Window

    ranked = bm25_topk(docs)
    words = docs.select(
        "doc_id", F.explode(words_col(F.lower(F.col("text")))).alias("term")
    ).distinct()
    q = docs.sparkSession.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id BIGINT, term STRING",
    )
    rel = (
        words.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("grade"))
        .filter(F.col("grade") >= MAP_REL_MIN_TERMS)
        .select("query_id", "doc_id", F.lit(1).cast("long").alias("is_rel"))
    )
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel_total"))
    w = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = (
        ranked.join(rel, ["query_id", "doc_id"], "left")
        .withColumn("b", F.coalesce("is_rel", F.lit(0).cast("long")))
        .withColumn("hits_i", F.sum("b").over(w))
        .withColumn(
            "p_micro",
            F.expr("CASE WHEN b = 1 THEN (hits_i * 1000000) div rnk END"),
        )
    )
    per_q = hits.groupBy("query_id").agg(
        F.sum("b").alias("n_rel_topk"),
        F.coalesce(F.sum("p_micro"), F.lit(0).cast("long")).alias("sum_p_micro"),
    )
    scored = (
        per_q.join(n_rel, "query_id", "full_outer")
        .select(
            "query_id",
            F.coalesce("n_rel_total", F.lit(0)).alias("n_rel_total"),
            F.coalesce("n_rel_topk", F.lit(0)).alias("n_rel_topk"),
            F.coalesce("sum_p_micro", F.lit(0)).alias("sum_p_micro"),
            F.expr(
                "COALESCE(sum_p_micro, 0)"
                f" div NULLIF(LEAST(COALESCE(n_rel_total, 0), {BM25_TOPK}), 0)"
            ).alias("ap_micro"),
        )
    )
    mean = scored.agg(
        F.expr("SUM(COALESCE(ap_micro, 0)) div COUNT(*)").alias("map_micro")
    )
    return scored.crossJoin(F.broadcast(mean))


RETRIEVAL_MAP_SQL = f"""
WITH {{BM25_CTES}},
topk AS (SELECT query_id, doc_id, rnk FROM ranked WHERE rnk <= {BM25_TOPK}),
dwords AS (SELECT DISTINCT doc_id, term FROM words),
rel AS (
  SELECT query_id, doc_id, CAST(1 AS BIGINT) AS is_rel
  FROM dwords JOIN q USING (term)
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MAP_REL_MIN_TERMS}
),
n_rel AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_total FROM rel GROUP BY 1
),
hits AS (
  SELECT t.query_id, t.rnk,
         COALESCE(r.is_rel, 0) AS b,
         CAST(SUM(COALESCE(r.is_rel, 0)) OVER (PARTITION BY t.query_id
              ORDER BY t.rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS hits_i
  FROM topk t LEFT JOIN rel r
    ON r.query_id = t.query_id AND r.doc_id = t.doc_id
),
per_q AS (
  SELECT query_id,
         CAST(SUM(b) AS BIGINT) AS n_rel_topk,
         CAST(COALESCE(SUM(CASE WHEN b = 1
              THEN (hits_i * 1000000) // rnk END), 0) AS BIGINT)
           AS sum_p_micro
  FROM hits GROUP BY 1
),
scored_ap AS (
  SELECT query_id,
         COALESCE(n_rel_total, 0) AS n_rel_total,
         COALESCE(n_rel_topk, 0) AS n_rel_topk,
         COALESCE(sum_p_micro, 0) AS sum_p_micro,
         COALESCE(sum_p_micro, 0)
           // NULLIF(LEAST(COALESCE(n_rel_total, 0), {BM25_TOPK}), 0)
           AS ap_micro
  FROM per_q FULL OUTER JOIN n_rel USING (query_id)
)
SELECT s.*, m.map_micro
FROM scored_ap s CROSS JOIN (
  SELECT CAST(SUM(COALESCE(ap_micro, 0)) // COUNT(*) AS BIGINT) AS map_micro
  FROM scored_ap
) m
"""

RETRIEVAL_MAP_SQL = RETRIEVAL_MAP_SQL.format(BM25_CTES=_BM25_CTES)


_PROX_FAR = 1_000_000_000  # rank-last sentinel for single-term candidates


def bm25_proximity_rerank(docs: DataFrame) -> DataFrame:
    """Two-stage retrieval: BM25 candidates re-ranked by term proximity.

    The restrict-then-expand pattern every multi-stage ranker needs at
    scale: the EXPENSIVE signal (minimum positional distance between
    occurrences of two different query terms) is computed only for the
    ~topk×queries candidate documents — the corpus-wide stage stays the
    cheap inverted-index BM25, and the positional explode runs after a
    broadcast semi-join against the candidate doc set. Per-doc pair work
    is bounded by (query-term occurrences per doc)², i.e. by document
    length — never by corpus size. Candidates whose text contains fewer
    than two distinct query terms keep a rank-last sentinel distance.
    Final order: (min_dist asc, score desc, doc_id) — exact integers, so
    the re-ranking is reshard-stable like the first stage.
    """
    from pyspark.sql.window import Window

    cands = bm25_topk(docs).select("query_id", "doc_id", "score")
    cand_docs = cands.select("doc_id").distinct()
    q = docs.sparkSession.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id BIGINT, term STRING",
    )
    pos = (
        docs.join(F.broadcast(cand_docs), "doc_id")
        .select(
            "doc_id",
            F.posexplode(words_col(F.lower(F.col("text")))).alias("pos", "term"),
        )
        .join(F.broadcast(q), "term")
        .select("query_id", "doc_id", "term", "pos")
    )
    a = pos.select(
        "query_id", "doc_id", F.col("term").alias("ta"), F.col("pos").alias("pa")
    )
    b = pos.select(
        "query_id", "doc_id", F.col("term").alias("tb"), F.col("pos").alias("pb")
    )
    prox = (
        a.join(b, ["query_id", "doc_id"])
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("query_id", "doc_id")
        .agg(F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("min_dist", F.desc("score"), "doc_id")
    return (
        cands.join(prox, ["query_id", "doc_id"], "left")
        .withColumn(
            "min_dist",
            F.coalesce(F.col("min_dist"), F.lit(_PROX_FAR).cast("long")),
        )
        .withColumn("rerank", F.row_number().over(w).cast("long"))
    )


BM25_PROXIMITY_SQL = f"""
WITH {_BM25_CTES},
cands AS (SELECT query_id, doc_id, score FROM ranked WHERE rnk <= {BM25_TOPK}),
cdocs AS (SELECT DISTINCT doc_id FROM cands),
cw AS (
  SELECT d.doc_id, string_split(lower(d.text), ' ') AS ws
  FROM documents d JOIN cdocs USING (doc_id)
),
posall AS (
  SELECT w.doc_id, w.ws[p.i] AS term, p.i AS pos
  FROM cw w, LATERAL (SELECT unnest(generate_series(1, len(w.ws))) AS i) AS p(i)
),
pos AS (
  SELECT q.query_id, a.doc_id, a.term, a.pos FROM posall a JOIN q USING (term)
),
prox AS (
  SELECT a.query_id, a.doc_id,
         CAST(MIN(abs(a.pos - b.pos)) AS BIGINT) AS min_dist
  FROM pos a
  JOIN pos b ON a.query_id = b.query_id AND a.doc_id = b.doc_id
            AND a.term < b.term
  GROUP BY a.query_id, a.doc_id
)
SELECT c.query_id, c.doc_id, c.score,
       COALESCE(p.min_dist, {_PROX_FAR}) AS min_dist,
       row_number() OVER (
         PARTITION BY c.query_id
         ORDER BY COALESCE(p.min_dist, {_PROX_FAR}), c.score DESC, c.doc_id
       ) AS rerank
FROM cands c
LEFT JOIN prox p ON c.query_id = p.query_id AND c.doc_id = p.doc_id
"""


COOC_WIN = 3  # co-occurrence window: positions within 3 tokens
COOC_TOPK = 50


def term_cooccurrence(docs: DataFrame) -> DataFrame:
    """Windowed term co-occurrence counts + exact PMI-surrogate lift.

    The GloVe/word2vec preprocessing primitive: count unordered term
    pairs whose positions fall within ``COOC_WIN`` tokens, rank by count
    with the observed/expected lift c_ab·T/(c_a·c_b) (the monotone
    rational core of PMI — exp/log-free, so both engines agree bit-for-
    bit in int64 micro-units).

    Scale shape: the position self-join reuses the binned-range-join
    trick at token granularity — positions bucket by ``pos div 3``, the
    probe side explodes {b−1, b, b+1} (bounded ×3), candidates come from
    an equi-join on (doc_id, bucket), and each qualifying position pair
    matches on exactly one probe value (the right side keeps its single
    home bucket), so no dedup step is needed. Per-token candidate work
    is O(window), never O(doc²). The final global top-50 is
    TakeOrderedAndProject (per-partition partial top-k, no global sort).
    The DuckDB oracle runs the un-binned inequality self-join — parity
    re-proves the bucket probe is complete. int64 headroom:
    n_cooc·T·10⁶ needs n_cooc·T < 9·10¹² — rescale past ~10⁹ tokens.
    """
    pos = docs.select(
        "doc_id", F.posexplode(words_col(F.lower(F.col("text")))).alias("pos", "term")
    )
    marg = pos.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = pos.agg(F.count(F.lit(1)).alias("t_tokens"))
    b = pos.withColumn("bucket", F.expr(f"pos div {COOC_WIN}"))
    left = b.select(
        "doc_id",
        "term",
        "pos",
        F.explode(F.expr("array(bucket - 1, bucket, bucket + 1)")).alias("probe"),
    )
    right = b.select(
        "doc_id",
        F.col("term").alias("term_r"),
        F.col("pos").alias("pos_r"),
        F.col("bucket").alias("probe"),
    )
    pairs = (
        left.join(right, ["doc_id", "probe"])
        .filter(
            (F.col("pos") < F.col("pos_r"))
            & (F.col("pos_r") - F.col("pos") <= COOC_WIN)
        )
        .select(
            F.least("term", "term_r").alias("term_a"),
            F.greatest("term", "term_r").alias("term_b"),
        )
    )
    cnt = pairs.groupBy("term_a", "term_b").agg(F.count(F.lit(1)).alias("n_cooc"))
    return (
        cnt.join(marg.select(F.col("term").alias("term_a"), F.col("c").alias("c_a")), "term_a")
        .join(marg.select(F.col("term").alias("term_b"), F.col("c").alias("c_b")), "term_b")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "lift_micro", F.expr("(n_cooc * t_tokens * 1000000) div (c_a * c_b)")
        )
        .select("term_a", "term_b", "n_cooc", "lift_micro")
        .orderBy(F.desc("n_cooc"), "term_a", "term_b")
        .limit(COOC_TOPK)
    )


TERM_COOCCURRENCE_SQL = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
pos AS (
  SELECT w.doc_id, w.ws[p.i] AS term, p.i AS pos
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(w.ws))) AS i) AS p(i)
),
marg AS (SELECT term, COUNT(*) AS c FROM pos GROUP BY term),
tot AS (SELECT COUNT(*) AS t_tokens FROM pos),
-- brute inequality self-join: the oracle skips the position bucketing,
-- so parity re-proves the 3-bucket probe is complete
pairs AS (
  SELECT LEAST(a.term, b.term) AS term_a, GREATEST(a.term, b.term) AS term_b
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND a.pos < b.pos
            AND b.pos - a.pos <= {COOC_WIN}
),
cnt AS (SELECT term_a, term_b, COUNT(*) AS n_cooc FROM pairs GROUP BY term_a, term_b)
SELECT c.term_a, c.term_b, c.n_cooc,
       (c.n_cooc * t.t_tokens * 1000000) // (ma.c * mb.c) AS lift_micro
FROM cnt c
JOIN marg ma ON ma.term = c.term_a
JOIN marg mb ON mb.term = c.term_b
CROSS JOIN tot t
ORDER BY c.n_cooc DESC, c.term_a, c.term_b
LIMIT {COOC_TOPK}
"""


RAKE_TOPK = 5
RAKE_SCALE = 1000


def doc_keyphrase_rake(docs: DataFrame) -> DataFrame:
    """RAKE keyphrase extraction: top phrases per source, integer-exact.

    Rapid Automatic Keyword Extraction (Rose et al. 2010) — the classic
    unsupervised keyphrase miner a metadata-enrichment stage runs over a
    crawl: text segments into candidate phrases at stopword/non-alpha
    delimiters; each word scores degree/frequency (degree = summed
    length of phrases containing it — co-occurrence weight); a phrase
    scores the sum of its word scores. Scores are integer milli-units
    ((degree*1000) div freq — integer division, reshard-stable); top
    RAKE_TOPK phrases per source, ties by phrase text.

    Scale shape: one posexplode pass; phrase segmentation is a per-doc
    running sum (doc-sized window partitions); word stats one hash agg
    keyed by vocabulary; phrase assembly one (doc, phrase) agg with
    order carried explicitly via sort_array(struct(pos, word)) —
    collect_list alone is NOT order-deterministic; per-source top-K is
    WindowGroupLimit. No corpus-quadratic step anywhere.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(words_col(F.lower(F.col("text")))).alias("pos", "word"),
    )
    delim = (
        F.col("word").isin(*STOPWORDS) | ~F.col("word").rlike("^[a-z]+$")
    ).cast("int")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    pw = (
        toks.withColumn("d", delim)
        .withColumn("phrase_id", F.sum("d").over(w_doc))
        .filter(F.col("d") == 0)
        .withColumn(
            "phrase_len",
            F.count(F.lit(1))
            .over(Window.partitionBy("doc_id", "phrase_id"))
            .cast("long"),
        )
    )
    wstats = pw.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("degree"),
    )
    scored = pw.join(
        wstats.select(
            "word", F.expr(f"(degree * {RAKE_SCALE}) div freq").alias("wscore")
        ),
        "word",
    )
    pscore = scored.groupBy("doc_id", "source", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("wscore").cast("long").alias("score_milli"),
    )
    agg = pscore.groupBy("source", "phrase").agg(
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_occurrences"),
        F.max("score_milli").alias("score_milli"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("score_milli"), F.col("phrase")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rnk") <= RAKE_TOPK)
        .select(
            "source", "phrase", "n_words", "n_occurrences", "score_milli", "rnk"
        )
        .orderBy("source", "rnk")
    )


_RAKE_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS)

DOC_KEYPHRASE_RAKE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, u['pos'] AS pos, u['word'] AS word FROM (
    SELECT doc_id, source,
           unnest(list_transform(range(1, len(ws)+1),
                  i -> {{'pos': i, 'word': ws[i]}})) AS u
    FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
          FROM documents)
  )
),
marked AS (
  SELECT *, CASE WHEN word IN ({_RAKE_STOPS})
                  OR NOT regexp_matches(word, '^[a-z]+$') THEN 1 ELSE 0 END AS d
  FROM toks
),
ph AS (
  SELECT doc_id, source, pos, word,
         SUM(d) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
  FROM marked QUALIFY d = 0
),
pw AS (
  SELECT *, CAST(COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS BIGINT)
            AS phrase_len
  FROM ph
),
wstats AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(phrase_len) AS BIGINT) AS degree
  FROM pw GROUP BY word
),
pscore AS (
  SELECT pw.doc_id, pw.source, pw.phrase_id,
         string_agg(pw.word, ' ' ORDER BY pw.pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM((w.degree * {RAKE_SCALE}) // w.freq) AS BIGINT) AS score_milli
  FROM pw JOIN wstats w USING (word)
  GROUP BY pw.doc_id, pw.source, pw.phrase_id
),
agg AS (
  SELECT source, phrase, MAX(n_words) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(score_milli) AS score_milli
  FROM pscore GROUP BY 1, 2
)
SELECT source, phrase, n_words, n_occurrences, score_milli,
       CAST(row_number() OVER (PARTITION BY source
            ORDER BY score_milli DESC, phrase) AS BIGINT) AS rnk
FROM agg
QUALIFY rnk <= {RAKE_TOPK}
ORDER BY source, rnk
"""


def doc_length_outliers(docs: DataFrame) -> DataFrame:
    """Model-based formatting-outlier detection: OLS residuals as dataflow.

    Fits ``n_chars ~ b0 + b1*n_ws_tokens + b2*n_vowels`` by ordinary least
    squares and surfaces the 20 documents whose length deviates most from
    the token-predicted value — the "weird formatting" signal (minified
    blobs, ASCII art, concatenated URLs) that per-feature threshold
    filters miss because each individual feature looks normal.

    The distributed-ML shape: ALL sufficient statistics for the 3x3
    normal equations (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y)
    come from ONE map-side-combined aggregate over exact int64 features —
    the same one-pass pattern as lineitem_corr_matrix, extended from
    correlation to model FITTING. The solve is Cramer's rule on the 3x3
    system (closed form, no iterative driver loop — contrast
    embedding_kmeans), computed in doubles with the identical expression
    on the oracle side; the 1-row coefficient frame broadcasts back onto
    the corpus for residual scoring. At 100 TB: one scan + a 1-row
    shuffle + a broadcast join — the cheapest possible supervised signal.

    Determinism: ranking sorts by ROUND(|residual|, 6) DESC then doc_id,
    so float noise below 1e-6 cannot reorder the cut.
    """
    spark = docs.sparkSession
    lower = F.lower(F.col("text"))
    feats = docs.select(
        "doc_id",
        _size(F.split(F.col("text"), " ")).alias("x1"),
        _size(F.regexp_extract_all(lower, F.lit("[aeiou]"), 0)).alias("x2"),
        F.length(F.col("text")).cast("long").alias("y"),
    )
    s = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )

    def det3(a, b, c, d, e, f, g, h, i):
        # doubles, identical term order to the oracle rendering
        return (
            a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
        )

    d = [F.col(c).cast("double") for c in
         ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")]
    n_, s1, s2, sy, s11, s12, s22, s1y, s2y = d
    det = det3(n_, s1, s2, s1, s11, s12, s2, s12, s22)
    det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    det1 = det3(n_, sy, s2, s1, s1y, s12, s2, s2y, s22)
    det2 = det3(n_, s1, sy, s1, s11, s1y, s2, s12, s2y)
    coef = s.select(
        (det0 / det).alias("b0"),
        (det1 / det).alias("b1"),
        (det2 / det).alias("b2"),
    )
    pred = (
        F.col("b0")
        + F.col("b1") * F.col("x1").cast("double")
        + F.col("b2") * F.col("x2").cast("double")
    )
    scored = feats.join(F.broadcast(coef)).select(
        "doc_id",
        "x1",
        "x2",
        "y",
        F.round(pred, 6).alias("pred_chars"),
        F.round(F.abs(F.col("y").cast("double") - pred), 6).alias("abs_resid"),
    )
    return scored.orderBy(F.desc("abs_resid"), "doc_id").limit(20)


DOC_LENGTH_OUTLIERS_SQL = """
WITH feats AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS x1,
         len(regexp_extract_all(lower(text), '[aeiou]')) AS x2,
         length(text) AS y
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1,
         CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
         CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
         CAST(SUM(x2 * y) AS DOUBLE) AS s2y
  FROM feats
),
coef AS (
  SELECT
    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
       + s2 * (s1y * s12 - s11 * s2y))
      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       + s2 * (s1 * s12 - s11 * s2)) AS b0,
    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
       + s2 * (s1 * s2y - s1y * s2))
      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       + s2 * (s1 * s12 - s11 * s2)) AS b1,
    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
       + sy * (s1 * s12 - s11 * s2))
      / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       + s2 * (s1 * s12 - s11 * s2)) AS b2
  FROM stats
)
SELECT doc_id, x1, x2, y,
       ROUND(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE), 6) AS pred_chars,
       ROUND(ABS(CAST(y AS DOUBLE)
             - (b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE))), 6) AS abs_resid
FROM feats CROSS JOIN coef
ORDER BY abs_resid DESC, doc_id
LIMIT 20
"""


QUERY_SQL = {
    "bm25_topk": BM25_TOPK_SQL,
    "bm25_proximity_rerank": BM25_PROXIMITY_SQL,
    "term_cooccurrence": TERM_COOCCURRENCE_SQL,
    "doc_keyphrase_rake": DOC_KEYPHRASE_RAKE_SQL,
    "doc_cosine_topk": DOC_COSINE_TOPK_SQL,
    "vocab_overlap": VOCAB_OVERLAP_SQL,
    "doc_perplexity": DOC_PERPLEXITY_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
    "token_stats": TOKEN_STATS_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "lang_id": LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "quality_filter": QUALITY_FILTER_SQL,
    "term_topk": TERM_TOPK_SQL,
    "bigram_topk": BIGRAM_TOPK_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "vocab_diff": VOCAB_DIFF_SQL,
    "fuzzy_word_pairs": FUZZY_WORD_PAIRS_SQL,
    "doc_length_outliers": DOC_LENGTH_OUTLIERS_SQL,
}


def doc_curriculum(docs: DataFrame) -> DataFrame:
    """Curriculum-phase manifest: quintile difficulty buckets by perplexity.

    Curriculum learning orders training data easy→hard; the standard
    difficulty proxy is LM perplexity (here the self-trained bigram LM of
    :func:`doc_perplexity` — no external model). Buckets come from exact
    interpolated QUANTILE THRESHOLDS (p20/p40/p60/p80 of avg_nll, a
    1-row broadcast), NOT a global ntile: ranking every document in one
    window is a single-partition sort, while threshold-compare is one
    aggregate + a broadcast — the count-distribution trick that survives
    100 TB. Boundary determinism: thresholds are computed from the same
    rounded values both engines see, and bucket edges use `<=`, so a doc
    exactly on a threshold lands identically everywhere.

    Output: (bucket 0-4 easy→hard, n_docs, min_ppl, max_ppl, n_bigrams).
    Note: the perplexity pipeline feeds both the thresholds and the
    scoring pass (lazy plans recompute shared subtrees); a production
    run materializes the scored frame once before phasing.
    """
    p = doc_perplexity(docs).select("doc_id", "n_bigrams", "avg_nll", "ppl")
    thr = p.agg(
        F.percentile(F.col("avg_nll"), F.lit(0.2)).alias("t1"),
        F.percentile(F.col("avg_nll"), F.lit(0.4)).alias("t2"),
        F.percentile(F.col("avg_nll"), F.lit(0.6)).alias("t3"),
        F.percentile(F.col("avg_nll"), F.lit(0.8)).alias("t4"),
    )
    bucket = (
        F.when(F.col("avg_nll") <= F.col("t1"), 0)
        .when(F.col("avg_nll") <= F.col("t2"), 1)
        .when(F.col("avg_nll") <= F.col("t3"), 2)
        .when(F.col("avg_nll") <= F.col("t4"), 3)
        .otherwise(4)
        .cast("long")
    )
    return (
        p.join(F.broadcast(thr))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ppl").alias("min_ppl"),
            F.max("ppl").alias("max_ppl"),
            F.sum("n_bigrams").alias("n_bigrams"),
        )
    )


DOC_CURRICULUM_SQL = f"""
WITH p AS ({DOC_PERPLEXITY_SQL}),
thr AS (
  SELECT quantile_cont(avg_nll, 0.2) AS t1,
         quantile_cont(avg_nll, 0.4) AS t2,
         quantile_cont(avg_nll, 0.6) AS t3,
         quantile_cont(avg_nll, 0.8) AS t4
  FROM p
)
SELECT CAST(CASE WHEN avg_nll <= t1 THEN 0
            WHEN avg_nll <= t2 THEN 1
            WHEN avg_nll <= t3 THEN 2
            WHEN avg_nll <= t4 THEN 3
            ELSE 4 END AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(ppl) AS min_ppl,
       MAX(ppl) AS max_ppl,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams
FROM p CROSS JOIN thr
GROUP BY 1
"""

QUERY_SQL["doc_curriculum"] = DOC_CURRICULUM_SQL


# --- retrieval_rrf_fusion: hybrid lexical + vector-space retrieval --------

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_TOPK = 10


def retrieval_rrf_fusion(docs: DataFrame) -> DataFrame:
    """Hybrid retrieval: BM25 and TF-cosine lists fused by RRF.

    The production hybrid-search shape: two rankers with complementary
    failure modes (BM25's saturated lexical match; sparse TF-cosine's
    length-normalized vector-space view over the SAME inverted index)
    each produce a per-query top-10, and reciprocal rank fusion combines
    them: rrf(d) = sum over lists of 1/(60 + rank_d). Rank positions are
    integers, so the fusion score is computed in exact micro-units
    (1_000_000 div (60 + rank)) — no float ever enters the fused
    ordering, and a document missing from one list contributes exactly 0
    (standard RRF). The cosine ranker drops the per-query norm (constant
    within a query partition — cannot change its ordering) so its score
    is one sqrt + one division, round 6, the engine-parity discipline.

    Scale shape: both rankers share one tf/df/dl aggregation pass; the
    fusion itself is a full outer join of two topk×queries frames —
    trivially small regardless of corpus size. The interesting property
    at 100 TB is what is ABSENT: no dense index is consulted, yet the
    fused list behaves like hybrid search because the two sparse views
    disagree exactly where hybrid search pays off.

    Output: (query_id, doc_id, bm25_rnk, cos_rnk, rrf_micro, rnk) with
    rank 0 marking "absent from that ranker's top-10".
    """
    from pyspark.sql.window import Window

    words = docs.select(
        "doc_id", F.explode(words_col(F.lower(F.col("text")))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    ssq = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("ssq"))
    q = docs.sparkSession.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id BIGINT, term STRING",
    )
    cdot = (
        tf.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tf").alias("dot"))
    )
    cscore = cdot.join(ssq, "doc_id").select(
        "query_id",
        "doc_id",
        F.round(F.col("dot") / F.sqrt(F.col("ssq")), 6).alias("cosine"),
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "doc_id")
    ctop = (
        cscore.withColumn("cos_rnk", F.row_number().over(wc).cast("long"))
        .filter(F.col("cos_rnk") <= RRF_TOPK)
        .select("query_id", "doc_id", "cos_rnk")
    )
    btop = bm25_topk(docs).select(
        "query_id", "doc_id", F.col("rnk").alias("bm25_rnk")
    )
    contrib = f"CAST(1000000 AS BIGINT) div ({RRF_K} + %s)"
    fused = (
        btop.join(ctop, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("bm25_rnk"), F.lit(0).cast("long")).alias("bm25_rnk"),
            F.coalesce(F.col("cos_rnk"), F.lit(0).cast("long")).alias("cos_rnk"),
            (
                F.coalesce(F.expr(contrib % "bm25_rnk"), F.lit(0).cast("long"))
                + F.coalesce(F.expr(contrib % "cos_rnk"), F.lit(0).cast("long"))
            ).alias("rrf_micro"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), "doc_id")
    return fused.withColumn("rnk", F.row_number().over(wf).cast("long"))


RETRIEVAL_RRF_FUSION_SQL = f"""
WITH {_BM25_CTES},
ssq AS (SELECT doc_id, SUM(tf * tf) AS ssq FROM tf GROUP BY doc_id),
cdot AS (
  SELECT q.query_id, tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS dot
  FROM tf JOIN q USING (term)
  GROUP BY q.query_id, tf.doc_id
),
cscore AS (
  SELECT query_id, doc_id, ROUND(dot / sqrt(ssq::DOUBLE), 6) AS cosine
  FROM cdot JOIN ssq USING (doc_id)
),
ctop AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS cos_rnk
  FROM cscore
  QUALIFY cos_rnk <= {RRF_TOPK}
),
btop AS (SELECT query_id, doc_id, rnk AS bm25_rnk FROM ranked WHERE rnk <= {BM25_TOPK}),
fused AS (
  SELECT COALESCE(b.query_id, c.query_id) AS query_id,
         COALESCE(b.doc_id, c.doc_id) AS doc_id,
         COALESCE(b.bm25_rnk, 0) AS bm25_rnk,
         COALESCE(c.cos_rnk, 0) AS cos_rnk,
         CAST(COALESCE(1000000 // ({RRF_K} + b.bm25_rnk), 0)
            + COALESCE(1000000 // ({RRF_K} + c.cos_rnk), 0) AS BIGINT) AS rrf_micro
  FROM btop b
  FULL OUTER JOIN ctop c ON b.query_id = c.query_id AND b.doc_id = c.doc_id
)
SELECT query_id, doc_id, bm25_rnk, cos_rnk, rrf_micro,
       row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rnk
FROM fused
"""

QUERY_SQL["retrieval_rrf_fusion"] = RETRIEVAL_RRF_FUSION_SQL


# -- MMR diversified retrieval ----------------------------------------------

MMR_K = 5  # diversified picks per query (greedy rounds, unrolled)


def _mmr_greedy(cl, sl):
    """Greedy MMR over one query's pool: list of pick dicts.

    Exact replica of the unrolled-round semantics: pick r maximizes
    (rel - max_{s in selected} sim, tie -> lowest doc_id); sims are
    symmetric and default to 0 when no pair row exists (all sims >= 0,
    so max-with-default-0 equals the old COALESCE(MAX(..), 0)).
    """
    rels = {int(c["doc_id"]): int(c["rel"]) for c in cl}
    sm = {
        (int(s["da"]), int(s["db"])): int(s["sim"])
        for s in (sl if sl is not None else [])
    }
    selected: list[int] = []
    rows = []
    for r in range(1, MMR_K + 1):
        best = None
        for d, rv in rels.items():
            if d in selected:
                continue
            ms = max((sm.get((d, s), 0) for s in selected), default=0)
            key = (ms - rv, d)  # minimize (-mmr, doc_id)
            if best is None or key < best[0]:
                best = (key, d, rv, ms)
        if best is None:
            break
        _, d, rv, ms = best
        selected.append(d)
        rows.append(
            {"mmr_rank": r, "doc_id": d, "rel": rv, "max_sim": ms, "mmr": rv - ms}
        )
    return rows


_MMR_PICK_TYPE = ArrayType(
    StructType(
        [
            StructField("mmr_rank", LongType()),
            StructField("doc_id", LongType()),
            StructField("rel", LongType()),
            StructField("max_sim", LongType()),
            StructField("mmr", LongType()),
        ]
    )
)


@pandas_udf(_MMR_PICK_TYPE)
def _mmr_greedy_udf(cands: pd.Series, sims: pd.Series) -> pd.Series:
    return pd.Series([_mmr_greedy(cl, sl) for cl, sl in zip(cands, sims)])


# plan control, not semantics (kmeans.quantize_udf pattern): stop
# Catalyst duplicating the Arrow call around the generate/projection
_mmr_greedy_udf = _mmr_greedy_udf.asNondeterministic()


def retrieval_mmr_topk(docs: DataFrame) -> DataFrame:
    """Maximal-marginal-relevance rerank of the BM25 pool: top-5 DIVERSE.

    The RAG-context selection shape: a plain top-k hands the model five
    near-copies of the same best passage; MMR picks greedily by
    mmr(d) = rel(d) - max_{s in selected} sim(d, s) (lambda = 1/2 with
    the constant folded out — argmax-invariant), trading relevance
    against redundancy. Everything stays exact int64 so the greedy
    argmax never depends on float association order:

    - rel = BM25 score micro-normalized within the pool
      ((score * 1e6) div pool_max);
    - sim = squared-cosine surrogate in micro-units
      ((dot^2 * 1e6) div (ssq_a * ssq_b)) — monotone in cosine (tf >= 0
      so dot >= 0), sqrt-free. int64 headroom: needs ssq < ~3e6, i.e.
      docs far beyond any tokenizable length before it matters.

    Scale shape: the corpus-wide stage is bm25_topk's inverted index;
    everything after restricts to the <= topk x queries pool (pairwise
    sims are pool^2-bounded). The greedy's sequential dependency exists
    ONLY WITHIN a query's <= topk-candidate pool, so it runs as one
    per-query array pass (collect the pool + its sims per query_id,
    unroll the MMR_K picks vectorized per row) — queries stay the
    parallel grain at any corpus size. r11: this replaced MMR_K unrolled
    rounds of pool-frame joins/windows (63 AQE stage-jobs at sf0.1, all
    driver-sequential) with two tiny aggregates + one Arrow batch.
    Output: (query_id, mmr_rank, doc_id, rel, max_sim, mmr).
    """
    # eager=False (r11): the barriers only truncate lineage — no blocking
    # per-barrier driver job; everything computes in the final action.
    pool = bm25_topk(docs).localCheckpoint(eager=False)  # pool + sims: two consumers
    pmax = pool.groupBy("query_id").agg(F.max("score").alias("smax"))
    rel = (
        pool.join(F.broadcast(pmax), "query_id")
        .select(
            "query_id",
            "doc_id",
            F.expr("(score * 1000000) div smax").alias("rel"),
        )
    )
    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    tf = (
        docs.select("doc_id", word)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    pool_docs = pool.select("doc_id").distinct()
    ptf = tf.join(F.broadcast(pool_docs), "doc_id", "left_semi").localCheckpoint(eager=False)
    norms = ptf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("ssq")
    )
    a = ptf.select("term", F.col("doc_id").alias("da"), F.col("tf").alias("ta"))
    b = ptf.select("term", F.col("doc_id").alias("db"), F.col("tf").alias("tb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.sum(F.col("ta") * F.col("tb")).alias("dot"))
    )
    simp = (
        dots.join(norms.select(F.col("doc_id").alias("da"), F.col("ssq").alias("sa")), "da")
        .join(norms.select(F.col("doc_id").alias("db"), F.col("ssq").alias("sb")), "db")
        .select("da", "db", F.expr("(dot * dot * 1000000) div (sa * sb)").alias("sim"))
    )
    sims = simp.unionByName(
        simp.select(F.col("db").alias("da"), F.col("da").alias("db"), "sim")
    )
    qd = pool.select("query_id", "doc_id")
    simq = (
        sims.join(qd.select("query_id", F.col("doc_id").alias("da")), "da")
        .join(qd.select(F.col("query_id").alias("qb"), F.col("doc_id").alias("db")), "db")
        .filter(F.col("query_id") == F.col("qb"))
        .select("query_id", "da", "db", "sim")
    )
    cands = rel.groupBy("query_id").agg(
        F.collect_list(F.struct("doc_id", "rel")).alias("cands")
    )
    simsg = simq.groupBy("query_id").agg(
        F.collect_list(F.struct("da", "db", "sim")).alias("sims")
    )
    picked = (
        cands.join(simsg, "query_id", "left")
        .select(
            "query_id",
            F.explode(_mmr_greedy_udf(F.col("cands"), F.col("sims"))).alias("p"),
        )
    )
    return picked.select(
        "query_id",
        F.col("p.mmr_rank").alias("mmr_rank"),
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.rel").alias("rel"),
        F.col("p.max_sim").alias("max_sim"),
        F.col("p.mmr").alias("mmr"),
    )


def _mmr_round_sql(r: int) -> str:
    prev = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, r))
    return f"""
sel{r} AS MATERIALIZED (
  SELECT query_id, CAST({r} AS BIGINT) AS mmr_rank, doc_id, rel, max_sim, mmr
  FROM (
    SELECT c.query_id, c.doc_id, c.rel,
           CAST(COALESCE(m.max_sim, 0) AS BIGINT) AS max_sim,
           c.rel - CAST(COALESCE(m.max_sim, 0) AS BIGINT) AS mmr,
           row_number() OVER (
             PARTITION BY c.query_id
             ORDER BY c.rel - CAST(COALESCE(m.max_sim, 0) AS BIGINT) DESC, c.doc_id
           ) AS rn
    FROM (
      SELECT rel.* FROM rel
      LEFT JOIN ({prev}) s USING (query_id, doc_id) WHERE s.doc_id IS NULL
    ) c
    LEFT JOIN (
      SELECT sq.query_id, sq.da AS doc_id, CAST(MAX(sq.sim) AS BIGINT) AS max_sim
      FROM simq sq JOIN ({prev}) s ON s.query_id = sq.query_id AND s.doc_id = sq.db
      GROUP BY 1, 2
    ) m ON m.query_id = c.query_id AND m.doc_id = c.doc_id
  ) WHERE rn = 1
)"""


RETRIEVAL_MMR_TOPK_SQL = f"""
WITH {_BM25_CTES},
topd AS MATERIALIZED (
  SELECT query_id, doc_id, score FROM ranked WHERE rnk <= {BM25_TOPK}
),
pmax AS (SELECT query_id, MAX(score) AS smax FROM topd GROUP BY 1),
rel AS MATERIALIZED (
  SELECT query_id, doc_id, CAST((score * 1000000) // smax AS BIGINT) AS rel
  FROM topd JOIN pmax USING (query_id)
),
ptf AS MATERIALIZED (
  SELECT doc_id, term, tf FROM tf
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM topd)
),
norms AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS ssq FROM ptf GROUP BY 1),
dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM ptf a JOIN ptf b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
simp AS (
  SELECT da, db, CAST((dot * dot * 1000000) // (na.ssq * nb.ssq) AS BIGINT) AS sim
  FROM dots JOIN norms na ON na.doc_id = da JOIN norms nb ON nb.doc_id = db
),
sims AS (SELECT da, db, sim FROM simp UNION ALL SELECT db AS da, da AS db, sim FROM simp),
simq AS MATERIALIZED (
  SELECT pa.query_id, s.da, s.db, s.sim
  FROM sims s
  JOIN topd pa ON pa.doc_id = s.da
  JOIN topd pb ON pb.doc_id = s.db AND pb.query_id = pa.query_id
),
sel1 AS MATERIALIZED (
  SELECT query_id, CAST(1 AS BIGINT) AS mmr_rank, doc_id, rel,
         CAST(0 AS BIGINT) AS max_sim, rel AS mmr
  FROM (
    SELECT query_id, doc_id, rel,
           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
    FROM rel
  ) WHERE rn = 1
),
{",".join(_mmr_round_sql(r) for r in range(2, MMR_K + 1))}
SELECT * FROM sel1
{" ".join(f"UNION ALL SELECT * FROM sel{r}" for r in range(2, MMR_K + 1))}
"""

QUERY_SQL["retrieval_mmr_topk"] = RETRIEVAL_MMR_TOPK_SQL


# -- vocabulary growth (Heaps' law read) ------------------------------------

VOCAB_GROWTH_DECILES = 10


def vocab_growth(docs: DataFrame) -> DataFrame:
    """Vocabulary-vs-token growth curve in ingestion order (Heaps' law).

    The corpus-composition monitor: natural text grows vocabulary like
    V ~ k*T^b (b ~ 0.5) — a curve that suddenly flattens means incoming
    data re-hashes what the corpus already had (crawl loop, template
    flood), one that steepens means an encoding/tokenization break or a
    genuinely new domain. Ingestion order = doc_id (the engine-wide
    convention); the corpus is split into 10 equal doc_id deciles and
    each term is attributed to the decile of its PIONEER (min doc_id) —
    so per-decile new-term counts and the cumulative curve come from one
    vocabulary-sized aggregate (never a per-checkpoint rescan; the
    10-row cumulative window is over decile rows only).
    """
    from pyspark.sql.window import Window

    d = VOCAB_GROWTH_DECILES
    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    occ = docs.select("doc_id", word)
    mx = docs.agg((F.max("doc_id") + 1).alias("n_ids"))
    dec = F.least(
        F.lit(d - 1), F.expr(f"(doc_id * {d}) div n_ids")
    ).cast("long").alias("decile")
    first = (
        occ.groupBy("term").agg(F.min("doc_id").alias("doc_id"))
        .join(F.broadcast(mx))
        .select(dec)
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_new_terms"))
    )
    toks = (
        occ.join(F.broadcast(mx))
        .select(dec)
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        first.join(toks, "decile")
        .withColumn("cum_vocab", F.sum("n_new_terms").over(w))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
    )


VOCAB_GROWTH_SQL = f"""
WITH occ AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
mx AS (SELECT MAX(doc_id) + 1 AS n_ids FROM documents),
first AS (
  SELECT LEAST({VOCAB_GROWTH_DECILES - 1},
               (MIN(doc_id) * {VOCAB_GROWTH_DECILES}) // n_ids) AS decile
  FROM occ, mx GROUP BY term, n_ids
),
firsts AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_new_terms
  FROM first GROUP BY decile
),
toks AS (
  SELECT LEAST({VOCAB_GROWTH_DECILES - 1},
               (doc_id * {VOCAB_GROWTH_DECILES}) // n_ids) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM occ, mx GROUP BY 1
)
SELECT decile, n_new_terms, n_tokens,
       CAST(SUM(n_new_terms) OVER (ORDER BY decile) AS BIGINT) AS cum_vocab,
       CAST(SUM(n_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens
FROM firsts JOIN toks USING (decile)
"""

QUERY_SQL["vocab_growth"] = VOCAB_GROWTH_SQL


ZIPF_TOP_TERMS = 1000


def doc_zipf_fit(docs: DataFrame) -> DataFrame:
    """Zipf's-law rank-frequency fit over the corpus vocabulary.

    The companion of ``vocab_growth``'s Heaps curve: natural language has
    term frequency ~ C * rank^s with s near -1; a much flatter slope
    means template/boilerplate flooding, a much steeper one a tiny
    effective vocabulary. Fit = OLS of ln(freq) on ln(rank) over the top
    1000 terms (TakeOrderedAndProject — no global vocab sort), with ln
    values in integer MILLI-units so every OLS sum is exact int64
    arithmetic (products stay < 2^63 at any corpus size); the slope's
    single division is the shared floor(double/) idiom (slope is
    negative, so no `div`). Output: one row — point count, exact sums,
    slope numerator/denominator, slope_milli.
    """
    from pyspark.sql.window import Window

    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    counts = (
        docs.select(word)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(ZIPF_TOP_TERMS)
    )
    w = Window.orderBy(F.desc("n"), "term")
    pts = counts.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        F.round(F.log(F.col("rnk")) * 1000).cast("long").alias("x"),
        F.round(F.log(F.col("n")) * 1000).cast("long").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "n_terms",
        F.col("sx").alias("sum_x_milli"),
        F.col("sy").alias("sum_y_milli"),
        (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "slope_num"
        ),
        (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "slope_den"
        ),
        F.expr(
            "CAST(FLOOR(CAST((n_terms * sxy - sx * sy) * 1000 AS DOUBLE)"
            " / (n_terms * sxx - sx * sx)) AS BIGINT)"
        ).alias("slope_milli"),
    )


DOC_ZIPF_SQL = f"""
WITH c AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY term
  ORDER BY n DESC, term LIMIT {ZIPF_TOP_TERMS}
),
pts AS (
  SELECT CAST(ROUND(LN(row_number() OVER (ORDER BY n DESC, term)) * 1000) AS BIGINT) AS x,
         CAST(ROUND(LN(n) * 1000) AS BIGINT) AS y
  FROM counts
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n_terms, sx AS sum_x_milli, sy AS sum_y_milli,
       n_terms * sxy - sx * sy AS slope_num,
       n_terms * sxx - sx * sx AS slope_den,
       CAST(FLOOR(((n_terms * sxy - sx * sy) * 1000)::DOUBLE / (n_terms * sxx - sx * sx)) AS BIGINT) AS slope_milli
FROM s
"""

QUERY_SQL["doc_zipf_fit"] = DOC_ZIPF_SQL


# --- one-way ANOVA: does a grouping explain a numeric column? ---------------


def doc_length_anova(docs: DataFrame) -> DataFrame:
    """One-way ANOVA of document length across sources — the variance
    rung of the stats tier (chi² tests categorical drift, Mann-Whitney
    ranks two groups; ANOVA asks whether a k-way grouping explains a
    numeric column at all). F = (SSB/(k−1)) / (SSW/(n−k)) from the three
    classic exact sums per group (n, Σx, Σx²).

    Every term stays INTEGER: the between-group sum uses per-group
    floor((Σx)²/n) — s² formed in decimal(38,0)/HUGEINT for overflow
    headroom — so the statistic is an exact integer function of the
    data (the float version's Σ of doubles would be partition-order
    dependent, the hazard the invariance sweep exists to catch). The
    bounded floor bias (< 1 per group) is identical in both engines and
    immaterial at ANOVA's scale. One integer cross-ratio yields F in
    milli. A flat F ≈ 1000 says source explains nothing about length; a
    large F flags a source whose length profile diverges (template or
    truncation artifact).

    Scale shape: one map-side-combined groupBy(source) for the
    sufficient statistics, then a |sources|-row reduce — no window, no
    join on data. Output: one row (k, n, ssb, ssw, f_milli).
    """
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.sum(
            F.expr(
                "CAST(FLOOR(cast(s as decimal(38,0)) * s / n) AS DECIMAL(38,0))"
            )
        ).alias("sbq_dec"),
    )
    return tot.select(
        "k",
        "n",
        F.expr(
            "CAST(sbq_dec - CAST(FLOOR(cast(s as decimal(38,0)) * s / n) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("ssb"),
        F.expr("CAST(ss - sbq_dec AS BIGINT)").alias("ssw"),
        F.expr(
            "CAST((CAST(sbq_dec - CAST(FLOOR(cast(s as decimal(38,0)) * s / n) AS DECIMAL(38,0)) AS DECIMAL(38,0))"
            " * (n - k) * 1000) div (CAST(k - 1 AS DECIMAL(38,0)) * CAST(ss - sbq_dec AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("f_milli"),
    )


DOC_LENGTH_ANOVA_SQL = """
WITH per AS (
  SELECT source, COUNT(*) AS n, SUM(n_chars) AS s,
         SUM(n_chars * n_chars) AS ss
  FROM documents GROUP BY source
),
tot AS (
  SELECT COUNT(*) AS k, SUM(n) AS n, SUM(s) AS s, SUM(ss) AS ss,
         SUM(CAST(s AS HUGEINT) * s // n) AS sbq
  FROM per
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       CAST(sbq - CAST(s AS HUGEINT) * s // n AS BIGINT) AS ssb,
       CAST(ss - sbq AS BIGINT) AS ssw,
       CAST((sbq - CAST(s AS HUGEINT) * s // n) * (n - k) * 1000
            // ((k - 1) * (ss - sbq)) AS BIGINT) AS f_milli
FROM tot
"""

QUERY_SQL["doc_length_anova"] = DOC_LENGTH_ANOVA_SQL


def doc_length_kruskal(docs: DataFrame) -> DataFrame:
    """Kruskal-Wallis H across sources on document length — the k-group
    nonparametric rung of the stats tier (doc_length_anova's F assumes
    the within-group variance structure; KW ranks are distribution-free,
    the ANOVA analogue for skewed length distributions, and the k-group
    generalization of orders_mann_whitney's two-sample U).

    Ranks stay INTEGER by the doubled-average-rank idiom over the VALUE
    grid: per distinct n_chars value the tie group at cumulative offset
    B with c members has doubled rank r2 = 2B + c + 1, so each source's
    doubled rank sum R2_j = Σ c_jv·r2_v is exact int64 (≤ 2N² — safe to
    ~2e9 docs). The between-rank term Q = Σ_j floor(R2_j²/n_j) is formed
    in decimal(38,0)/HUGEINT (the ANOVA sbq pattern — floor bias < 1 per
    source, identical both engines), giving
    H = 3Q/(N(N+1)) − 3(N+1) and the tie correction
    C = 1 − Σ(c³−c)/(N³−N) as one identical double tree in both
    engines: h_milli = floor(H/C·1000). ε² = (H/C − k + 1)/(N − k) is
    the matching effect size (eps2_ppm). All-tied corpora give NULL via
    NULLIF (C = 0), never an error.

    Scale shape: one map-side-combined groupBy(n_chars) for the value
    grid (sized by the LENGTH DOMAIN, never the corpus — the
    documents_ks_drift discipline), one running window over the grid,
    one groupBy(source, n_chars) joined to the grid (both value-grain),
    then two 1-row aggregates crossed (the allowlisted aggregate-sized
    class). No corpus-sized sort, no join on data rows.
    """
    from pyspark.sql.window import Window

    g = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    r2 = g.select(
        "n_chars",
        (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias(
            "r2v"
        ),
    )
    sj = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cj"))
    per = (
        sj.join(r2, "n_chars")
        .groupBy("source")
        .agg(
            F.sum("cj").alias("n_j"),
            F.sum(F.col("cj") * F.col("r2v")).alias("r2_j"),
        )
    )
    # Q term = floor(r2_j^2 / n_j) EXACTLY: Spark decimal division
    # rounds HALF_UP at the reduced result scale before FLOOR, so for
    # n_j past ~2e6 a quotient fraction within half an ulp can round up
    # and floor to +1 vs DuckDB's integer // (ADVICE r10). Subtracting
    # the exact decimal remainder first makes the division exact (zero
    # fraction -> representable -> no rounding), and the result stays
    # DECIMAL — Spark's integral `div` returns BIGINT, which the
    # quotient outgrows near 1e18 at 300x scale.
    agg1 = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_j").alias("n"),
        F.sum(
            F.expr(
                "CAST((CAST(r2_j AS DECIMAL(38,0)) * r2_j"
                " - CAST(r2_j AS DECIMAL(38,0)) * r2_j % n_j) / n_j"
                " AS DECIMAL(38,0))"
            )
        ).alias("q_dec"),
    )
    ties = g.agg(
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).alias("tie_dec")
    )
    s = agg1.crossJoin(F.broadcast(ties))
    h = (
        "(3.0 * CAST(q_dec AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1.0))"
        " - 3.0 * (n + 1.0))"
    )
    corr = (
        "((CAST(n AS DOUBLE) * n * n - n)"
        " / NULLIF((CAST(n AS DOUBLE) * n * n - n) - CAST(tie_dec AS DOUBLE),"
        " 0.0))"
    )
    hc = f"({h} * {corr})"
    eps2 = f"(({hc} - k + 1.0) / NULLIF(CAST(n - k AS DOUBLE), 0.0))"
    return s.select(
        "k",
        "n",
        F.expr("CAST(tie_dec AS BIGINT)").alias("tie_term"),
        F.expr(f"CAST(FLOOR({hc} * 1000) AS BIGINT)").alias("h_milli"),
        F.expr(f"CAST(FLOOR({eps2} * 1000000) AS BIGINT)").alias("eps2_ppm"),
    )


DOC_LENGTH_KRUSKAL_SQL = """
WITH g AS (
  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1
),
r2 AS (
  SELECT n_chars,
         2 * COALESCE(SUM(c) OVER (ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2v
  FROM g
),
sj AS (
  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cj
  FROM documents GROUP BY 1, 2
),
per AS (
  SELECT source, CAST(SUM(cj) AS BIGINT) AS n_j,
         CAST(SUM(cj * r2v) AS BIGINT) AS r2_j
  FROM sj JOIN r2 USING (n_chars)
  GROUP BY 1
),
agg1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_j) AS BIGINT) AS n,
         SUM(CAST(r2_j AS HUGEINT) * r2_j // n_j) AS q_dec
  FROM per
),
ties AS (
  SELECT SUM(CAST(c AS HUGEINT) * c * c - c) AS tie_dec FROM g
)
SELECT k, n, CAST(tie_dec AS BIGINT) AS tie_term,
       CAST(FLOOR((3.0 * CAST(q_dec AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1.0))
             - 3.0 * (n + 1.0))
            * ((CAST(n AS DOUBLE) * n * n - n)
               / NULLIF((CAST(n AS DOUBLE) * n * n - n)
                        - CAST(tie_dec AS DOUBLE), 0.0))
            * 1000) AS BIGINT) AS h_milli,
       CAST(FLOOR((((3.0 * CAST(q_dec AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1.0))
             - 3.0 * (n + 1.0))
            * ((CAST(n AS DOUBLE) * n * n - n)
               / NULLIF((CAST(n AS DOUBLE) * n * n - n)
                        - CAST(tie_dec AS DOUBLE), 0.0)))
            - k + 1.0)
            / NULLIF(CAST(n - k AS DOUBLE), 0.0) * 1000000) AS BIGINT)
         AS eps2_ppm
FROM agg1 CROSS JOIN ties
"""

QUERY_SQL["doc_length_kruskal"] = DOC_LENGTH_KRUSKAL_SQL
QUERY_SQL["retrieval_ndcg"] = RETRIEVAL_NDCG_SQL
QUERY_SQL["retrieval_map"] = RETRIEVAL_MAP_SQL


BURSTY_TOPK = 20


def doc_burstiness(docs: DataFrame) -> DataFrame:
    """Term burstiness (Church & Gale's variance-to-mean ratio / Fano
    factor) for the corpus' top terms — the DISPERSION rung beside the
    frequency monitors (Zipf reads the rank-frequency slope, entropy
    the global mix; burstiness reads HOW a term's mass arrives: VMR ≈ 1
    is Poisson scatter — function words — while VMR ≫ 1 is bursty
    clumping — content words, and, pathologically, a template flooding
    a few documents, exactly what a dedup threshold audit wants
    surfaced per term).

    Over ALL N docs (zeros included, algebraically — never material-
    ized): with T = Σc and S2 = Σc² per term over docs containing it,
    var/mean = (N·S2 − T²)/(N·T), nonnegative by Cauchy-Schwarz, exact
    in decimal(38,0)/HUGEINT and floor-quantized milli (positive ⇒
    floor == truncate in both engines). Top BURSTY_TOPK terms by total
    count, term tie-break.

    Scale shape: explode → one map-side-combined (doc, term) hash-agg →
    term-grain agg → 1-row corpus-count broadcast cross (allowlisted) →
    TakeOrderedAndProject(K). No corpus-sized sort, no join on data.
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    cdt = (
        docs.select("doc_id", word)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_term = cdt.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    vmr = (
        "CAST(FLOOR((CAST(n_docs AS DECIMAL(38,0)) * s2"
        " - CAST(t AS DECIMAL(19,0)) * t) * 1000"
        " / (CAST(n_docs AS DECIMAL(19,0)) * t)) AS BIGINT)"
    )
    return (
        per_term.crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            F.col("t").alias("total_count"),
            F.expr("(t * 1000000) div n_docs").alias("mean_count_micro"),
            F.expr(vmr).alias("vmr_milli"),
        )
        .orderBy(F.desc("total_count"), "term")
        .limit(BURSTY_TOPK)
    )


DOC_BURSTINESS_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
cdt AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM words GROUP BY 1, 2
),
per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c) AS BIGINT) AS t,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM cdt GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT term, df, t AS total_count,
       (t * 1000000) // n_docs AS mean_count_micro,
       CAST((CAST(n_docs AS HUGEINT) * s2 - CAST(t AS HUGEINT) * t) * 1000
            // (CAST(n_docs AS HUGEINT) * t) AS BIGINT) AS vmr_milli
FROM per_term CROSS JOIN n
ORDER BY total_count DESC, term
LIMIT {BURSTY_TOPK}
"""

QUERY_SQL["doc_burstiness"] = DOC_BURSTINESS_SQL


_LNM = "CAST(FLOOR(1000 * ln({})) AS BIGINT)"
_LN2_MILLI = 693  # floor(1000·ln 2) — the exclusive-term JS contribution


def source_js_matrix(docs: DataFrame) -> DataFrame:
    """Pairwise Jensen-Shannon divergence matrix between every source
    pair's unigram distribution — doc_split_js_divergence widened from
    the fixed train/val pair to the full source×source drift atlas (the
    table a mixture rebalance reads to find which sources are
    near-duplicates of each other and which are distributional
    outliers).

    Same integer discipline as the split JS: per SHARED term the log
    ratio reduces to ln(2aB) − ln(aB + bA) over floor-quantized milli
    logs (one transcendental per integer — the zipf discipline), and
    terms EXCLUSIVE to one side contribute exactly (mass)·ln2, folded
    algebraically via the per-source totals minus the shared sums — so
    the vocabulary-grain self-join only materializes SHARED (term,
    pair) rows, never the exclusive fan-out. Bounded [0, 693 milli].

    Scale shape: one exploded-token groupBy(source, term) — map-side
    combined, vocabulary-bounded — one term-grain self-join with
    fan-out ≤ |sources|² (source cardinality is metadata-bounded, not
    corpus-bounded), a |sources|-row totals broadcast, a pairs-row
    reduce. No corpus-grain join.
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("t")
    counts = (
        docs.select("source", word)
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.groupBy("source").agg(F.sum("c").alias("tc"))
    a = counts.select(
        F.col("source").alias("src_a"), "t", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("source").alias("src_b"), "t", F.col("c").alias("cb")
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("tc").alias("ta"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("tc").alias("tb"))
    shared = (
        a.join(b, "t")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_terms"),
            F.sum("ca").alias("sa"),
            F.sum("cb").alias("sb"),
            # ln args multiply in DOUBLE: ca*tb is a count×TOTAL product
            # that wraps int64 near per-source totals of 1e12 × common
            # terms of 1e7 — Spark non-ANSI would wrap silently (ln of a
            # negative -> NaN rows) while DuckDB raises; the double
            # product is IEEE-identical in both engines and ln is
            # evaluated in double anyway, so the quantized-milli floor
            # is unchanged (ADVICE r10).
            F.sum(
                F.expr(
                    f"ca * ({_LNM.format('2 * CAST(ca AS DOUBLE) * tb')}"
                    f" - {_LNM.format('CAST(ca AS DOUBLE) * tb + CAST(cb AS DOUBLE) * ta')})"
                )
            ).alias("skp"),
            F.sum(
                F.expr(
                    f"cb * ({_LNM.format('2 * CAST(cb AS DOUBLE) * ta')}"
                    f" - {_LNM.format('CAST(ca AS DOUBLE) * tb + CAST(cb AS DOUBLE) * ta')})"
                )
            ).alias("skq"),
        )
    )
    # pair spine from the bounded source-totals frame so fully-DISJOINT
    # pairs (the MOST divergent — exactly ln2) still emit a row instead
    # of silently vanishing from the inner-join matrix
    pairs = (
        ta.crossJoin(F.broadcast(tb))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    return (
        pairs.join(F.broadcast(shared), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("n_shared_terms", F.lit(0)).alias("n_shared_terms"),
            F.col("ta").alias("tokens_a"),
            F.col("tb").alias("tokens_b"),
            F.expr(
                f"((COALESCE(skp, 0) + (ta - COALESCE(sa, 0)) * {_LN2_MILLI})"
                f" div ta"
                f" + (COALESCE(skq, 0) + (tb - COALESCE(sb, 0))"
                f"    * {_LN2_MILLI}) div tb) div 2"
            ).alias("js_milli"),
        )
    )


SOURCE_JS_MATRIX_SQL = f"""
WITH counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
        FROM documents)
  GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tc FROM counts GROUP BY 1),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
         CAST(SUM(a.c) AS BIGINT) AS sa,
         CAST(SUM(b.c) AS BIGINT) AS sb,
         CAST(SUM(a.c * ({_LNM.format("2 * CAST(a.c AS DOUBLE) * tb.tc")}
                  - {_LNM.format(
                      "CAST(a.c AS DOUBLE) * tb.tc + CAST(b.c AS DOUBLE) * ta.tc"
                  )})) AS BIGINT)
           AS skp,
         CAST(SUM(b.c * ({_LNM.format("2 * CAST(b.c AS DOUBLE) * ta.tc")}
                  - {_LNM.format(
                      "CAST(a.c AS DOUBLE) * tb.tc + CAST(b.c AS DOUBLE) * ta.tc"
                  )})) AS BIGINT)
           AS skq
  FROM counts a
  JOIN counts b ON a.t = b.t AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT ta.source AS src_a, tb.source AS src_b,
         CAST(ta.tc AS BIGINT) AS ta, CAST(tb.tc AS BIGINT) AS tb
  FROM tot ta CROSS JOIN tot tb WHERE ta.source < tb.source
)
SELECT src_a, src_b,
       COALESCE(n_shared_terms, 0) AS n_shared_terms,
       ta AS tokens_a, tb AS tokens_b,
       ((COALESCE(skp, 0) + (ta - COALESCE(sa, 0)) * {_LN2_MILLI}) // ta
        + (COALESCE(skq, 0) + (tb - COALESCE(sb, 0)) * {_LN2_MILLI}) // tb)
         // 2 AS js_milli
FROM pairs LEFT JOIN shared USING (src_a, src_b)
"""

QUERY_SQL["source_js_matrix"] = SOURCE_JS_MATRIX_SQL


KS_BASELINE_SRC = "src0"


def documents_ks_drift(docs: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test: does the BASELINE
    source's document-length distribution differ from the rest of the
    corpus? — the distribution-shape rung of the drift tier
    (source_lang_drift watches categorical mix, doc_length_anova
    variance structure; KS catches ANY CDF divergence — truncation,
    padding, a template change — without distributional assumptions).

    The statistic is exact INTEGER end-to-end: per distinct n_chars
    value count both sides, cumulative-sum both step functions over the
    value grid (one window over value-grain rows — sized by the length
    domain, never the corpus; the dsir_auc discipline), and maximize
    |cum_base·n_rest − cum_rest·n_base| — the CDF gap scaled by
    n_base·n_rest so no division ever happens before the argmax.
    d_ppm is exact (d_num·1e6 floor-divided) while the product fits
    int64, switching to the quantized denominator (the lorenz
    discipline, error ≤ 1 ppm) once n_base·n_rest > 1e12 — one CASE,
    identical in both engines, so small corpora keep the exact ppm and
    big ones never overflow; the classic
    KS lambda = D·sqrt(n1·n2/(n1+n2)) is one identical double tree,
    floor-quantized milli (lambda > ~1358 rejects at 5%). The argmax
    location ties break to the smallest n_chars (deterministic in both
    engines). int64 headroom: cum·n ≤ n_base·n_rest — safe to ~3e9
    docs a side.

    Scale shape: one map-side-combined groupBy(n_chars), two running
    windows over value-grain rows, a 1-row totals broadcast, one
    TakeOrderedAndProject(1). No corpus-sized sort, no join on data.
    """
    from pyspark.sql.window import Window

    is_base = (F.col("source") == KS_BASELINE_SRC).cast("long")
    vals = docs.groupBy("n_chars").agg(
        F.sum(is_base).alias("c1"),
        F.sum(1 - is_base).alias("c2"),
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cums = vals.select(
        "n_chars",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = vals.agg(
        F.sum("c1").alias("n_base"), F.sum("c2").alias("n_rest")
    )
    gaps = cums.crossJoin(F.broadcast(tot)).select(
        "n_chars",
        "n_base",
        "n_rest",
        F.abs(
            F.col("cum1") * F.col("n_rest") - F.col("cum2") * F.col("n_base")
        ).alias("d_num"),
    )
    lam = (
        "(CAST(d_num AS DOUBLE) / NULLIF(CAST(n_base AS DOUBLE) * n_rest, 0.0)"
        " * sqrt(CAST(n_base AS DOUBLE) * n_rest / (n_base + n_rest)))"
    )
    return (
        gaps.orderBy(F.desc("d_num"), "n_chars")
        .limit(1)
        .select(
            "n_base",
            "n_rest",
            "d_num",
            F.expr(
                "CASE WHEN n_base * n_rest > 1000000000000"
                " THEN d_num div ((n_base * n_rest) div 1000000)"
                " ELSE (d_num * 1000000) div GREATEST(n_base * n_rest, 1) END"
            ).alias("d_ppm"),
            F.expr(f"CAST(FLOOR({lam} * 1000) AS BIGINT)").alias(
                "ks_lambda_milli"
            ),
            F.col("n_chars").alias("at_n_chars"),
        )
    )


DOCUMENTS_KS_DRIFT_SQL = f"""
WITH vals AS (
  SELECT n_chars,
         CAST(SUM(CASE WHEN source = '{KS_BASELINE_SRC}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN source = '{KS_BASELINE_SRC}' THEN 0 ELSE 1 END)
              AS BIGINT) AS c2
  FROM documents GROUP BY 1
),
cums AS (
  SELECT n_chars,
         CAST(SUM(c1) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
  FROM vals
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n_base, CAST(SUM(c2) AS BIGINT) AS n_rest
  FROM vals
),
gaps AS (
  SELECT n_chars, n_base, n_rest,
         ABS(cum1 * n_rest - cum2 * n_base) AS d_num
  FROM cums CROSS JOIN tot
)
SELECT n_base, n_rest, d_num,
       CASE WHEN n_base * n_rest > 1000000000000
            THEN d_num // ((n_base * n_rest) // 1000000)
            ELSE (d_num * 1000000) // GREATEST(n_base * n_rest, 1) END AS d_ppm,
       CAST(FLOOR((CAST(d_num AS DOUBLE)
             / NULLIF(CAST(n_base AS DOUBLE) * n_rest, 0.0)
             * sqrt(CAST(n_base AS DOUBLE) * n_rest / (n_base + n_rest)))
            * 1000) AS BIGINT) AS ks_lambda_milli,
       n_chars AS at_n_chars
FROM gaps
ORDER BY d_num DESC, n_chars
LIMIT 1
"""

QUERY_SQL["documents_ks_drift"] = DOCUMENTS_KS_DRIFT_SQL


def documents_chi2_independence(docs: DataFrame) -> DataFrame:
    """Chi-squared test of independence over the source × lang
    contingency table — the categorical-association rung of the drift
    tier (ANOVA: numeric-vs-k-way, KS: CDF shape, MW: two-group ranks;
    this one asks whether the language MIX is uniform across sources —
    a skew is a crawl-routing or lang-ID regression localized to a
    source).

    Exactness discipline: expected cells E_ij = r_i·c_j/n and the
    per-cell (O−E)²/E are doubles, but each cell's contribution is
    floor-quantized to integer MICRO first and only THEN integer-summed
    — a cross-partition double sum is association-order dependent (the
    exact hazard the invariance sweep exists to catch), an integer sum
    is not, and the ≤1-micro-per-cell floor bias is identical in both
    engines. Output one row: cells, rows, cols, dof, n, chi2_micro (the
    dashboard compares against the chi²(dof) bar).

    The statistic runs over the FULL R × C margin grid (a bounded
    cross of the two total frames), so EMPTY cells contribute their
    expectation — dropping them reads perfect association as half its
    chi2 (pinned by the product-table / determined-column edges).

    Scale shape: one map-side-combined groupBy(source, lang), a
    bounded margin cross + one left join of observed cells, a 1-row
    agg. No windows, no corpus-sized joins.
    """
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows_t = cells.groupBy("source").agg(F.sum("o").alias("r"))
    cols_t = cells.groupBy("lang").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    # the FULL R x C grid, not just observed cells: an empty cell still
    # contributes E to the statistic (O = 0) — dropping it is the classic
    # under-count that reads perfect association as half its chi2
    grid = rows_t.crossJoin(F.broadcast(cols_t))
    e = "(CAST(r AS DOUBLE) * c / n)"
    contrib = (
        grid.join(cells, ["source", "lang"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            F.expr(
                f"CAST(FLOOR((o - {e}) * (o - {e}) / {e} * 1000000) AS BIGINT)"
            ).alias("contrib_micro"),
        )
    )
    return contrib.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        (
            (F.countDistinct("source") - 1) * (F.countDistinct("lang") - 1)
        ).alias("dof"),
        F.sum("contrib_micro").alias("chi2_micro"),
    )


DOCUMENTS_CHI2_SQL = """
WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
),
rows_t AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
cols_t AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
grid AS (SELECT source, r, lang, c FROM rows_t CROSS JOIN cols_t),
contrib AS (
  SELECT grid.source, grid.lang,
         CAST(FLOOR((COALESCE(o, 0) - (CAST(r AS DOUBLE) * c / n))
              * (COALESCE(o, 0) - (CAST(r AS DOUBLE) * c / n))
              / (CAST(r AS DOUBLE) * c / n) * 1000000) AS BIGINT) AS contrib_micro
  FROM grid
  LEFT JOIN cells ON cells.source = grid.source AND cells.lang = grid.lang
  CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST((COUNT(DISTINCT source) - 1) * (COUNT(DISTINCT lang) - 1) AS BIGINT)
         AS dof,
       CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
FROM contrib
"""

QUERY_SQL["documents_chi2_independence"] = DOCUMENTS_CHI2_SQL


def vocab_entropy(docs: DataFrame) -> DataFrame:
    """Shannon entropy of the corpus unigram distribution — the
    information-theoretic rung beside the SHAPE monitors (Zipf fits the
    rank-frequency slope, Heaps the growth curve; entropy is the single
    scalar that moves when EITHER collapses): low H = template flood /
    boilerplate (the signal repetition_stats sees per doc, corpus-wide),
    H near ln(V) = near-uniform vocabulary (shredded text, random ids).

    Identity used: H = ln(N) − (Σ c·ln c)/N over term counts c. Each
    term's c·ln(c) is floor-quantized to integer MICRO and the micros
    integer-summed (the chi2/user_entropy discipline — a cross-partition
    double sum is association-order dependent; ≤1 micro floor bias per
    term, identical both engines); H and the normalized/redundancy
    ratios come from one identical double tree over the three exact
    int64 scalars. Output: n_tokens, n_terms, s_clnc_micro (the exact
    integer sufficient statistic), h_micro_nats, h_norm_ppm (H/ln V),
    redundancy_ppm (1 − H/ln V).

    Scale shape: explode → one map-side-combined hash-agg on term → a
    1-row agg. int64 headroom: Σ c·ln(c)·1e6 ≤ N·ln(N)·1e6 ~ 2e16 at
    1e9 tokens.
    """
    word = F.explode(words_col(F.lower(F.col("text")))).alias("term")
    counts = docs.select(word).groupBy("term").agg(
        F.count(F.lit(1)).alias("c")
    )
    s = counts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("c").alias("n_tokens"),
        F.sum(
            F.expr("CAST(FLOOR(c * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)")
        ).alias("s_clnc_micro"),
    )
    h = (
        "(ln(CAST(n_tokens AS DOUBLE))"
        " - CAST(s_clnc_micro AS DOUBLE) / 1000000.0 / n_tokens)"
    )
    hn = f"({h} / NULLIF(ln(CAST(n_terms AS DOUBLE)), 0.0))"
    return s.select(
        "n_tokens",
        "n_terms",
        "s_clnc_micro",
        F.expr(f"CAST(FLOOR({h} * 1000000) AS BIGINT)").alias("h_micro_nats"),
        F.expr(f"CAST(FLOOR({hn} * 1000000) AS BIGINT)").alias("h_norm_ppm"),
        F.expr(f"CAST(FLOOR((1.0 - {hn}) * 1000000) AS BIGINT)").alias(
            "redundancy_ppm"
        ),
    )


VOCAB_ENTROPY_SQL = """
WITH c AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM c GROUP BY 1),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(FLOOR(c * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
              AS BIGINT) AS s_clnc_micro
  FROM counts
)
SELECT n_tokens, n_terms, s_clnc_micro,
       CAST(FLOOR((ln(CAST(n_tokens AS DOUBLE))
            - CAST(s_clnc_micro AS DOUBLE) / 1000000.0 / n_tokens) * 1000000)
            AS BIGINT) AS h_micro_nats,
       CAST(FLOOR(((ln(CAST(n_tokens AS DOUBLE))
            - CAST(s_clnc_micro AS DOUBLE) / 1000000.0 / n_tokens)
            / NULLIF(ln(CAST(n_terms AS DOUBLE)), 0.0)) * 1000000)
            AS BIGINT) AS h_norm_ppm,
       CAST(FLOOR((1.0 - ((ln(CAST(n_tokens AS DOUBLE))
            - CAST(s_clnc_micro AS DOUBLE) / 1000000.0 / n_tokens)
            / NULLIF(ln(CAST(n_terms AS DOUBLE)), 0.0))) * 1000000)
            AS BIGINT) AS redundancy_ppm
FROM s
"""

QUERY_SQL["vocab_entropy"] = VOCAB_ENTROPY_SQL


def corpus_bigram_entropy(docs: DataFrame) -> DataFrame:
    """Conditional bigram entropy H(W2|W1) and word-level mutual
    information of the corpus — the SEQUENCE rung of the entropy tier
    (vocab_entropy measures the unigram distribution; this measures how
    predictable the NEXT word is given the previous one, the statistic
    that actually moves when template/boilerplate mass floods a corpus:
    unigram entropy can stay flat while H(W2|W1) collapses because the
    same word transitions repeat).

    Identities used (all over exact int64 bigram counts):
      H(W2|W1) = (Σ_ctx c1·ln c1 − Σ_big c12·ln c12) / N
      H(W2)    = ln N − (Σ_w2 c2·ln c2) / N
      MI(W1;W2) = H(W2) − H(W2|W1)
    Each c·ln c is floor-quantized to integer MICRO per row before the
    cross-partition sum (the vocab_entropy discipline), so the three
    sufficient statistics are exact int64 and H(W2|W1) reduces to ONE
    integer division — (s_ctx − s_big) div N — with no float crossing
    the oracle boundary at all; H(W2) and the derived perplexity use
    one identical double tree over the integer scalars. Output: one row
    with n_bigrams, n_contexts, n_distinct_bigrams, the three micro
    sufficient statistics, h_cond_micro_nats, h_w2_micro_nats,
    mi_micro_nats, ppl_bigram_milli (e^H, the effective branching
    factor).

    Scale shape: one arrays_zip bigram explode → two map-side-combined
    hash-aggs (bigram- and context-grain, vocabulary²-bounded, never
    corpus-bounded) → 1-row aggregates crossed. int64 headroom:
    Σ c·ln c·1e6 ≤ N·ln(N)·1e6 ~ 2e16 at 1e9 tokens.
    """
    words = words_col(F.lower(F.col("text")))
    toks = docs.select(words.alias("ws"))
    n = F.size(F.col("ws"))
    z = F.arrays_zip(
        F.slice(F.col("ws"), 1, n - 1).alias("w1"),
        F.slice(F.col("ws"), 2, n - 1).alias("w2"),
    )
    pairs = toks.select(F.explode(z).alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    clnc = "CAST(FLOOR({c} * ln(CAST({c} AS DOUBLE)) * 1000000) AS BIGINT)"
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bs = big.agg(
        F.sum("c12").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.sum(F.expr(clnc.format(c="c12"))).alias("s_big_micro"),
    )
    cs = (
        big.groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
        .agg(
            F.count(F.lit(1)).alias("n_contexts"),
            F.sum(F.expr(clnc.format(c="c1"))).alias("s_ctx_micro"),
        )
    )
    w2s = (
        big.groupBy("w2")
        .agg(F.sum("c12").alias("c2"))
        .agg(F.sum(F.expr(clnc.format(c="c2"))).alias("s_w2_micro"))
    )
    s = bs.crossJoin(F.broadcast(cs)).crossJoin(F.broadcast(w2s))
    h_w2 = (
        "(ln(CAST(n_bigrams AS DOUBLE))"
        " - CAST(s_w2_micro AS DOUBLE) / 1000000.0 / n_bigrams)"
    )
    h_cond = "(CAST((s_ctx_micro - s_big_micro) div n_bigrams AS DOUBLE) / 1000000.0)"
    return s.select(
        "n_bigrams",
        "n_contexts",
        "n_distinct_bigrams",
        "s_ctx_micro",
        "s_big_micro",
        "s_w2_micro",
        F.expr("(s_ctx_micro - s_big_micro) div n_bigrams").alias(
            "h_cond_micro_nats"
        ),
        F.expr(f"CAST(FLOOR({h_w2} * 1000000) AS BIGINT)").alias(
            "h_w2_micro_nats"
        ),
        F.expr(
            f"CAST(FLOOR({h_w2} * 1000000) AS BIGINT)"
            " - (s_ctx_micro - s_big_micro) div n_bigrams"
        ).alias("mi_micro_nats"),
        F.expr(f"CAST(FLOOR(exp({h_cond}) * 1000) AS BIGINT)").alias(
            "ppl_bigram_milli"
        ),
    )


CORPUS_BIGRAM_ENTROPY_SQL = """
WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
pairs AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM w
),
big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM pairs GROUP BY 1, 2),
bs AS (
  SELECT CAST(SUM(c12) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(SUM(CAST(FLOOR(c12 * ln(CAST(c12 AS DOUBLE)) * 1000000)
              AS BIGINT)) AS BIGINT) AS s_big_micro
  FROM big
),
cs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_contexts,
         CAST(SUM(CAST(FLOOR(c1 * ln(CAST(c1 AS DOUBLE)) * 1000000)
              AS BIGINT)) AS BIGINT) AS s_ctx_micro
  FROM (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY 1)
),
w2s AS (
  SELECT CAST(SUM(CAST(FLOOR(c2 * ln(CAST(c2 AS DOUBLE)) * 1000000)
              AS BIGINT)) AS BIGINT) AS s_w2_micro
  FROM (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM big GROUP BY 1)
)
SELECT n_bigrams, n_contexts, n_distinct_bigrams,
       s_ctx_micro, s_big_micro, s_w2_micro,
       (s_ctx_micro - s_big_micro) // n_bigrams AS h_cond_micro_nats,
       CAST(FLOOR((ln(CAST(n_bigrams AS DOUBLE))
            - CAST(s_w2_micro AS DOUBLE) / 1000000.0 / n_bigrams) * 1000000)
            AS BIGINT) AS h_w2_micro_nats,
       CAST(FLOOR((ln(CAST(n_bigrams AS DOUBLE))
            - CAST(s_w2_micro AS DOUBLE) / 1000000.0 / n_bigrams) * 1000000)
            AS BIGINT)
         - (s_ctx_micro - s_big_micro) // n_bigrams AS mi_micro_nats,
       CAST(FLOOR(exp(CAST((s_ctx_micro - s_big_micro) // n_bigrams
            AS DOUBLE) / 1000000.0) * 1000) AS BIGINT) AS ppl_bigram_milli
FROM bs CROSS JOIN cs CROSS JOIN w2s
"""
QUERY_SQL["corpus_bigram_entropy"] = CORPUS_BIGRAM_ENTROPY_SQL
