"""Behavioral pins for the text-analysis operators."""

from __future__ import annotations

from maap_data_pipelines_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_token_stats_counts(spark):
    df = _docs(spark, [(1, "Hello world 42 times!", "en")])
    r = text.token_stats(df).collect()[0]
    assert r.n_ws_tokens == 4
    assert r.n_alpha_tokens == 3  # hello, world, times
    assert r.n_num_tokens == 1
    assert r.n_other_tokens == 1  # '!'
    assert r.n_chars_actual == len("Hello world 42 times!")


def test_text_quality_ratios(spark):
    df = _docs(spark, [(1, "the cat sat on the mat.", "en")])
    r = text.text_quality(df).collect()[0]
    assert r.n_words == 6
    assert r.n_stopwords == 3  # the, on, the ('mat.' has punctuation)
    assert r.n_punct == 1
    assert abs(r.stopword_ratio - round(3 / 6, 6)) < 1e-9


def test_lang_id_confusion(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog of the house", "en"),
            (2, "der hund und die katze nicht", "de"),
            (3, "xyzzy plugh qwerty", "en"),
        ],
    )
    rows = {(r.declared_lang, r.predicted_lang): r.n_docs for r in text.lang_id(df).collect()}
    assert rows[("en", "en")] == 1
    assert rows[("de", "de")] == 1
    assert rows[("en", "und")] == 1


def test_doc_fingerprint_order_sensitive(spark):
    df = _docs(spark, [(1, "alpha beta", "en"), (2, "beta alpha", "en")])
    rows = {r.doc_id: r.fingerprint for r in text.doc_fingerprint(df).collect()}
    assert rows[1] != rows[2]  # positional hash: order matters
    df2 = _docs(spark, [(3, "alpha beta", "en")])
    again = text.doc_fingerprint(df2).collect()[0].fingerprint
    assert again == rows[1]  # deterministic
