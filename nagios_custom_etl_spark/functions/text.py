"""Text-analysis expression layer (SURVEY §2.12 X4): tokenization, quality
scoring, language ID, fingerprinting. Pure built-in Column expressions —
JVM-side, codegen-friendly, no Python UDFs — so they run unchanged at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/punctuation splitter for token *counting*: runs of word
# chars, or single non-space punctuation marks.
BPE_ISH_TOKEN_RE = r"\w+|[^\w\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty strings removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """Token count under a BPE-ish regex (words + punctuation marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), 0))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token-array column.

    PERF: ``toks`` is referenced inside a HOF lambda, where Catalyst
    re-evaluates free references per element — pass a *materialized
    column* (project the token array in a prior select), not the raw
    tokenization expression, or shingling degrades to O(tokens²).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.when(F.size(toks) >= n, sh).otherwise(F.array(F.concat_ws(" ", toks))))


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (for MinHash/Jaccard).

    Single-expression convenience form; for bulk pipelines prefer
    ``select(tokens(...).alias("_toks"))`` then ``shingles_from_tokens``
    (see its PERF note).
    """
    return shingles_from_tokens(tokens(col), n)


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

EN_STOPWORDS = (
    "the a an and or of to in is are was were be been for on with as by at it this that",
)


def quality_metrics(col: str | Column) -> dict[str, Column]:
    """Standard quality signals for a free-text column.

    Returns named Column expressions; callers select the ones they need.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    stop_list = F.split(F.lit(EN_STOPWORDS[0]), " ")
    n_stop = F.size(F.array_intersect(toks, stop_list))
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
        "avg_token_len": (
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast(
                "double"
            )
            / F.greatest(n_tok, F.lit(1))
        ),
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)),
        "alpha_ratio": n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop.cast("double") / F.greatest(n_tok, F.lit(1)),
    }


# ---------------------------------------------------------------------------
# language ID: distinct-token overlap against per-language marker lexicons
# (n-gram/stopword heuristic — deterministic and engine-portable)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, str] = {
    "en": "the of and to in is it that was for on are with as be at",
    "de": "der die das und ist nicht ich sie mit ein eine zu den von",
    "es": "el la los las de que y en un una es no por con para",
    "fr": "le la les et est un une dans pour que qui ne pas de du",
    "zh": "的 是 不 了 在 人 有 我 他 这 中 大 来 上 国",
}


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Marker-token hit count per language over the distinct token set."""
    toks = F.array_distinct(tokens(col))
    return {
        lang: F.size(F.array_intersect(toks, F.split(F.lit(markers), " ")))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: str | Column, min_hits: int = 1) -> Column:
    """argmax language by marker hits; 'und' when below min_hits.

    Ties break by language code order (deterministic, engine-portable).
    """
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(min_hits - 1)
    for lang in sorted(scores):  # later wins only on strictly greater
        s = scores[lang]
        improved = s > best_score
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(improved, s).otherwise(best_score)
    return best_lang


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def normalized_fingerprint(col: str | Column) -> Column:
    """sha256 of the casefolded, whitespace-collapsed text — the exact-dedup
    key (X1), robust to formatting noise."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), 256)


def rolling_hashes(col: str | Column, k: int = 8) -> Column:
    """Rolling character k-gram hash set (xxhash64) — winnowing-style
    fingerprint basis. array<bigint> per document."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - k + 1, F.lit(1)))
    return F.transform(idx, lambda i: F.xxhash64(F.substring(c, i, k)))


# ---------------------------------------------------------------------------
# lexicon sentiment (X4's last named sub-feature, SURVEY §2.12: "simple
# lexicon sentiment via map-literal join")
# ---------------------------------------------------------------------------

# Deliberately includes words the fixture corpus actually uses (fast/slow)
# so the operator scores real text, not just planted suffixes.
SENTIMENT_POS = (
    "good", "great", "excellent", "love", "happy", "best",
    "wonderful", "amazing", "fast", "reliable",
)
SENTIMENT_NEG = (
    "bad", "terrible", "awful", "hate", "sad", "worst",
    "horrible", "slow", "broken", "unreliable",
)
SENTIMENT_NEGATORS = ("not", "no", "never", "without", "hardly")

SENTIMENT_TOKEN_RE = "[a-z]+"


def lexicon_sentiment(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    pos_words: tuple[str, ...] = SENTIMENT_POS,
    neg_words: tuple[str, ...] = SENTIMENT_NEG,
    negators: tuple[str, ...] = SENTIMENT_NEGATORS,
):
    """Per-document lexicon sentiment: tokenize, broadcast-join tokens
    against a ±1-weighted lexicon, flip a hit's polarity when the
    immediately preceding token is a negator ("not good" counts
    negative), and aggregate to (n_tokens, n_pos, n_neg, score, label).

    The lexicon join is the "map-literal join" the survey names: a
    driver-literal word→weight relation broadcast to every executor —
    the same plan shape scales to a real 100k-entry lexicon table
    (still broadcast-sized), while the token side streams. Negation is
    a LAG over (doc, position) — one window at per-document width, no
    second pass over the text. Everything is built-in expressions
    (regexp tokenize, broadcast hash join, window, aggregate): zero
    Python in the hot path, so the per-token cost is JVM codegen.
    Docs with no tokens produce no row (both engines agree: nothing to
    score). Reference scope: the reference has no text analytics; this
    extends its perfdata parsing (extract.py) toward the LLM-pipeline
    quality stack per SURVEY §2.12/PAPERS.md:5.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    lex = F.broadcast(
        spark.createDataFrame(
            [(w, 1) for w in pos_words] + [(w, -1) for w in neg_words],
            "word string, weight int",
        )
    )
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(SENTIMENT_TOKEN_RE), 0
    )
    t = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    j = t.join(lex, t.tok == lex.word, "left")
    w = Window.partitionBy(id_col).orderBy("pos")
    flip = F.when(F.lag("tok").over(w).isin(*negators), F.lit(-1)).otherwise(F.lit(1))
    signed = (F.coalesce(F.col("weight"), F.lit(0)) * flip).alias("signed")
    per_tok = j.select(F.col(id_col), signed)
    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("signed") > 0).cast("int")).cast("long").alias("n_pos"),
        F.sum((F.col("signed") < 0).cast("int")).cast("long").alias("n_neg"),
        F.sum("signed").cast("long").alias("score"),
    )
    label = (
        F.when(F.col("score") > 0, F.lit("positive"))
        .when(F.col("score") < 0, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )
    return agg.withColumn("label", label)
