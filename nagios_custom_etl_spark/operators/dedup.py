"""Deduplication operators (SURVEY §2.12 X1/X2): exact, MinHash+LSH,
SimHash, n-gram Jaccard. All pure DataFrame compositions — shingling,
hashing and banding are built-in higher-order functions (JVM-side); the
only shuffles are the band-bucket join and the final pair aggregation,
both on well-distributed hash keys.

Scale notes (100 TB): MinHash-LSH cost is O(docs × num_hashes) map-side
work plus a self-join on (band_id, band_hash) — bucket keys are uniform
by construction, so no skew salting is needed unless many exact
duplicates share a bucket; ``exact-first`` dedup (cheap) before LSH
removes that mass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nagios_custom_etl_spark.functions.text import normalized_fingerprint, tokens, word_shingles

# ---------------------------------------------------------------------------
# X1 — exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    Deterministic keeper choice (min id) — ``dropDuplicates`` keeps an
    arbitrary row, which is fine for semantics but untestable; min-id is
    the same single shuffle.
    """
    fp = normalized_fingerprint(text_col).alias("fingerprint")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# X2 — MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature(text_col: str | Column, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """array<bigint> MinHash signature over word-shingle sets.

    One xxhash64 per (seed, shingle); min per seed. Pure expressions —
    evaluated per row with no shuffle.
    """
    sh = word_shingles(text_col, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(F.transform(sh, lambda s: F.xxhash64(seed, s))),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows -> signatures -> (band_id, band_hash) buckets -> self-join within
    bucket -> distinct (a, b) pairs with a < b. Probability a pair with
    Jaccard j is emitted: 1 - (1 - j^(num_hashes/bands))^bands.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes, shingle_n)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = (
        df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
        .select("_id", F.explode(F.array(*band_structs)).alias("band"))
        .select("_id", "band.band_id", "band.band_hash")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact word-shingle Jaccard for candidate pairs; keeps >= threshold."""
    sh = df.select(F.col(id_col).alias("_jid"), word_shingles(text_col, shingle_n).alias("_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.col("a._sh")) + F.size(F.col("b._sh")) - inter
    return (
        pairs.join(a, pairs.id_a == F.col("a._jid"))
        .join(b, pairs.id_b == F.col("b._jid"))
        .select("id_a", "id_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Full X2 pipeline: LSH candidates, exact-Jaccard verified."""
    pairs = lsh_candidate_pairs(df, id_col, text_col, num_hashes, bands, shingle_n)
    return jaccard_verify(df, pairs, id_col, text_col, threshold, shingle_n)


# ---------------------------------------------------------------------------
# X2 — exact n-gram Jaccard via inverted shingle index (the oracle-checkable
# exact counterpart of MinHash: same verified pairs, no probabilistic miss)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """All pairs with shingle-Jaccard >= threshold.

    Inverted index: explode distinct shingles, self-join on shingle,
    count shared shingles per pair, derive the union from per-doc set
    sizes. Only pairs sharing >= 1 shingle are ever materialized — at
    scale, a stopword-ish shingle can fan out; cap it with a document
    frequency filter if needed (not required on the fixtures).
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# X2 — SimHash (64-bit) for near-dup at Hamming distance <= k
# ---------------------------------------------------------------------------


def simhash64(text_col: str | Column) -> Column:
    """64-bit SimHash over whitespace tokens.

    Per row: fold the token array into a 64-slot vote vector (+1/-1 per
    bit of each token's xxhash64), then assemble the sign bits. Sequential
    fold, all built-ins; bit positions are static so shifts stay literal.
    """
    toks = tokens(text_col)
    zero = F.array_repeat(F.lit(0).cast("bigint"), 64)

    def bit_votes(t: Column) -> Column:
        return F.array(
            *[
                F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
                .cast("bigint")
                for b in range(64)
            ]
        )

    votes = F.aggregate(toks, zero, lambda acc, t: F.zip_with(acc, bit_votes(t), lambda a, v: a + v))
    out = F.lit(0).cast("bigint")
    for b in range(64):
        # bit 63 is the sign bit of a long: its weight is long-min
        weight = F.lit(1 << b if b < 63 else -(1 << 63)).cast("bigint")
        out = out + F.when(F.element_at(votes, b + 1) > 0, weight).otherwise(F.lit(0).cast("bigint"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= max_hamming between SimHashes.

    Banding for scale: split the 64-bit hash into 4 16-bit bands — two
    hashes within Hamming k<=3 must agree exactly on >=1 band (pigeonhole),
    so candidates come from an equi-join on (band_id, band_value), never a
    cross join.
    """
    sigs = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("sim"))
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("sim"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_value"),
        )
        for b in range(4)
    ]
    banded = sigs.select("_id", "sim", F.explode(F.array(*band_structs)).alias("band")).select(
        "_id", "sim", "band.band_id", "band.band_value"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
