"""Text-analysis function tests: deterministic behavior pinning for the
expressions that back X4 queries (lang-id, quality metrics, shingles,
fingerprints)."""

from __future__ import annotations

from nagios_custom_etl_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    normalized_fingerprint,
    quality_metrics,
    rolling_hashes,
    tokens,
    word_shingles,
)


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "x y"), (2, "")], "id long, text string")
    out = df.select(
        "id",
        tokens("text").alias("toks"),
        word_shingles("text", 3).alias("sh"),
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[0]["toks"] == ["a", "b", "c", "d"]
    assert rows[0]["sh"] == ["a b c", "b c d"]
    assert rows[1]["sh"] == ["x y"]  # shorter than n → single whole-text shingle
    assert rows[2]["toks"] == []


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it was happy"),
            (1, "der hund ist nicht in der küche und sie"),
            (2, "el perro es un animal que vive en la casa"),
            (3, "zz qq xx vv"),  # no markers
        ],
        "id long, text string",
    )
    out = {r["id"]: r["pl"] for r in df.select("id", lang_id("text").alias("pl")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_metrics_values(spark):
    df = spark.createDataFrame([(0, "the cat, the hat!")], "id long, text string")
    m = quality_metrics("text")
    r = df.select(*[v.alias(k) for k, v in m.items()]).head()
    assert r["n_chars"] == 17
    assert r["n_tokens"] == 4
    assert r["n_distinct_tokens"] == 3  # the, cat,, hat! → 'the' repeats... tokens include punct
    assert r["punct_ratio"] > 0
    assert 0 < r["stopword_ratio"] <= 1


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(0, "don't stop-me now!")], "id long, text string")
    n = df.select(bpe_ish_token_count("text").alias("n")).head()["n"]
    # don | ' | t | stop | - | me | now | !
    assert n == 8


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, " HELLO  WORLD ")],
        "id long, text string",
    )
    fps = [r["fp"] for r in df.select(normalized_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert len(fps[0]) == 64  # sha256 hex


def test_rolling_hashes_shape(spark):
    df = spark.createDataFrame([(0, "abcdefghij")], "id long, text string")
    hs = df.select(rolling_hashes("text", 8).alias("h")).head()["h"]
    assert len(hs) == 3  # 10 - 8 + 1
    assert len(set(hs)) == 3


def test_bigram_lm_ranks_repetition_above_novelty(spark):
    """The corpus-trained bigram LM must score a doc made of common
    bigrams as more fluent (higher mean log P) than a doc whose bigrams
    appear nowhere else."""
    from nagios_custom_etl_spark.plans import all_queries
    import tempfile, os

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "s", len(common)) for i in range(20)]
    rows.append((100, "zxq wvu tsr qpo nml kji", "en", "s", 23))  # novel bigrams
    d = tempfile.mkdtemp(prefix="lm_fixture_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    out = all_queries()["x4i_bigram_lm_score"].fn(spark, d).collect()
    # least-fluent list is ordered ascending by mean logp: the novel doc
    # must rank first (most surprising)
    assert out[0]["doc_id"] == 100
    assert all(out[0]["avg_logp_r"] < r["avg_logp_r"] for r in out[1:])


def test_lexicon_sentiment_planted_phrases(spark):
    """x89's operator on planted sentences: positive, negative,
    negated-positive ("not good" counts negative), negated-negative
    ("never bad" counts positive), mixed, and lexicon-free neutral."""
    from pyspark.sql import Row

    from nagios_custom_etl_spark.functions.text import lexicon_sentiment

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="The service was good, great even. Amazing!"),
            Row(doc_id=2, text="terrible and broken; truly awful"),
            Row(doc_id=3, text="this is not good"),
            Row(doc_id=4, text="it was never bad"),
            Row(doc_id=5, text="good but slow"),
            Row(doc_id=6, text="a plain factual sentence"),
        ]
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_pos, r.n_neg, r.score, r.label)
        for r in lexicon_sentiment(docs).collect()
    }
    assert got[1] == (7, 3, 0, 3, "positive")
    assert got[2] == (5, 0, 3, -3, "negative")
    assert got[3] == (4, 0, 1, -1, "negative")  # negation flips 'good'
    assert got[4] == (4, 1, 0, 1, "positive")  # negation flips 'bad'
    assert got[5] == (3, 1, 1, 0, "neutral")  # balanced mix
    assert got[6] == (4, 0, 0, 0, "neutral")  # no lexicon hits
