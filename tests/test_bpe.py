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
