"""BPE tokenizer: pinned tokenizations, invariants, Spark-side parity."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from maap_data_pipelines_spark.operators.bpe import bpe_encode, bpe_token_stats


def test_pinned_tokenizations():
    # hand-derived from the MERGES ranks
    assert bpe_encode("the") == ["the"]
    assert bpe_encode("scan") == ["scan"]
    assert bpe_encode("data") == ["data"]
    assert bpe_encode("table") == ["tab", "le"]
    assert bpe_encode("x") == ["x"]
    assert bpe_encode("") == []


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=24))
def test_encode_invariants(word):
    toks = bpe_encode(word)
    assert "".join(toks) == word  # lossless
    if word:
        assert 1 <= len(toks) <= len(word)


def test_spark_counts_match_reference(spark):
    texts = [
        (0, "the fast table scan"),
        (1, "slow data row"),
        (2, "query value check"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r.doc_id: r for r in bpe_token_stats(docs).collect()}
    for doc_id, text in texts:
        words = text.split(" ")
        assert out[doc_id].n_words == len(words)
        assert out[doc_id].n_bpe_tokens == sum(len(bpe_encode(w)) for w in words)
        assert out[doc_id].n_chars == sum(len(w) for w in words)


def test_train_bpe_learns_expected_merge_sequence(spark):
    from maap_data_pipelines_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        [(1, "abab abab abab"), (2, "abab cd"), (3, "cd")], ["doc_id", "text"]
    )
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in train_bpe(docs, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    # hand-derived: (a,b) appears twice per 'abab' occurrence (4 occ -> 8),
    # then (ab,ab) once per occurrence (4), then (c,d) (2); then no pair
    # with support >= 2 remains -> early stop at 3 merges of 8 requested
    assert got == [(0, "a", "b", 8), (1, "ab", "ab", 4), (2, "c", "d", 2)]


def test_train_bpe_tie_breaks_lexically(spark):
    from maap_data_pipelines_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame([(1, "xy xy yx yx")], ["doc_id", "text"])
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in train_bpe(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    # (x,y) and (y,x) both have count 2 -> lexical tie-break picks (x,y)
    assert got == [(0, "x", "y", 2), (1, "y", "x", 2)]


def test_train_bpe_deterministic_under_repartition(spark):
    from maap_data_pipelines_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, "roll roll rock rock row") for i in range(6)], ["doc_id", "text"]
    )
    a = [tuple(r) for r in train_bpe(docs, n_merges=5).orderBy("merge_rank").collect()]
    b = [
        tuple(r)
        for r in train_bpe(docs.repartition(5), n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    assert a == b and len(a) >= 2
