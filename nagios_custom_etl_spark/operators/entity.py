"""Fuzzy entity resolution: approximate string matching between two
record sets (edit distance <= k) without a cartesian product.

The reference keys everything on exact host/service names fetched from
the Nagios API (extract.py:80-99, hosts_to_csv.py) — records from a
second source (a CMDB export, a ticket system) rarely spell those names
identically, and linking them is an entity-resolution join. The classic
scale trap is |L| x |R| distance computations; the standard fix
(q-gram / prefix filtering from the similarity-join literature) is used
here:

1. profile every string into its distinct character trigrams;
2. compute corpus document frequency per trigram over BOTH sides —
   shared boilerplate ("Customer#", a common hostname prefix) gets a
   huge DF and is never used for blocking;
3. keep each string's ``k_rare`` rarest trigrams (ties broken by the
   gram itself — a total order, so both engines pick identical sets);
4. candidate pairs = strings sharing at least one rare gram (an
   inverted-index equi-join on the gram — postings are small BY
   CONSTRUCTION since only low-DF grams are indexed);
5. verify candidates with exact ``levenshtein`` <= ``max_distance``.

Edits confined to high-DF boilerplate leave both strings' rare-gram
sets identical, so recall on realistic typos is total (asserted against
planted corruptions in tests). At 100 TB the gram DF table is a
one-pass aggregate and the candidate join shuffles on the gram key;
nothing is ever all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import cache_once


def char_trigrams(col: str | Column) -> Column:
    """Distinct character 3-grams of a string as an array; empty for
    strings shorter than 3 (guarded — Spark's ``sequence(1, 0)``
    DESCENDS rather than producing an empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - 2), lambda i: F.substring(c, i, 3)
    )
    return F.when(F.length(c) >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    text_left: str,
    text_right: str,
    max_distance: int = 2,
    k_rare: int = 4,
) -> DataFrame:
    """Blocked approximate join: ``(id_left, id_right, distance)`` for
    every cross-side pair within ``max_distance`` edits that shares a
    rare trigram. Output ids keep the caller's column names."""
    l_str = left.select(F.col(id_left).alias("_id"), F.col(text_left).alias("_name"))
    r_str = right.select(F.col(id_right).alias("_id"), F.col(text_right).alias("_name"))
    both = l_str.withColumn("_side", F.lit("L")).unionByName(
        r_str.withColumn("_side", F.lit("R"))
    )
    grams = both.select(
        "_id", "_side", F.explode(char_trigrams("_name")).alias("_g")
    )
    # corpus DF per gram across both sides: high-DF boilerplate grams
    # rank last and never enter a rare set
    gram_df = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    from pyspark.sql import Window

    w = Window.partitionBy("_side", "_id").orderBy("_df", "_g")
    rare = cache_once(
        grams.join(gram_df, "_g")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_rare)
        .select("_id", "_side", "_g")
    )
    cand = (
        rare.filter(F.col("_side") == "L")
        .select(F.col("_id").alias("_lid"), "_g")
        .join(
            rare.filter(F.col("_side") == "R").select(F.col("_id").alias("_rid"), "_g"),
            "_g",
        )
        .select("_lid", "_rid")
        .distinct()
    )
    lnames = l_str.select(F.col("_id").alias("_jlid"), F.col("_name").alias("_lname"))
    rnames = r_str.select(F.col("_id").alias("_jrid"), F.col("_name").alias("_rname"))
    verified = (
        cand.join(lnames, F.col("_lid") == F.col("_jlid"))
        .join(rnames, F.col("_rid") == F.col("_jrid"))
        .withColumn("distance", F.levenshtein("_lname", "_rname").cast("long"))
        .filter(F.col("distance") <= max_distance)
    )
    return verified.select(
        F.col("_lid").alias(id_left), F.col("_rid").alias(id_right), "distance"
    )


def editdist1_self_join(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """Exact edit-distance<=1 self-join via the FastSS / SymSpell
    deletion neighborhood — complete by construction, never all-pairs.

    For a string ``s``, its deletion neighborhood D(s) = {s} plus every
    single-character deletion of s. If levenshtein(s, t) <= 1 then
    D(s) and D(t) intersect (substitution: delete the differing
    position from both; insertion/deletion: the longer string's
    deletion IS the shorter string) — so blocking on exploded deletion
    variants misses nothing. The converse does not hold (transposed
    "ab"/"ba" share variants at distance 2), so candidates are verified
    with exact ``levenshtein`` before emitting; the blocking guarantees
    RECALL, the verify guarantees PRECISION.

    Returns (id_a, id_b, distance) with id_a < id_b, distinct.

    100 TB notes: the variant explode is O(n * len) rows joined on the
    variant string — an inverted-index bucket equi-join exactly like the
    MinHash band join (operators/dedup.py), shuffled on the variant key
    and AQE-split on hot buckets. Generalizing to k>1 multiplies the
    neighborhood by len^k — for k>=2 the segment-pigeonhole family
    (PassJoin) is the right tool; k=1 covers the dominant typo class
    and is the exactness sweet spot.
    """
    c = F.col(str_col)
    variants = F.array_union(
        F.array(c),
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                F.substring(c, F.lit(1), i - 1),
                c.substr(i + 1, F.length(c)),
            ),
        ),
    )
    # length >= 1: the usual deletion neighborhood; length == 0: the empty
    # string is its own (only) variant — dropping it would lose ("", "")
    # distance-0 and ("", one-char) distance-1 pairs (the one-char side's
    # deletion IS ""); NULL strings fall out of the explode (no variants),
    # matching SQL's null-never-equals join semantics.
    ex = df.select(
        F.col(id_col).alias("_id"),
        c.alias("_s"),
        F.explode(
            F.when(F.length(c) >= 1, variants).otherwise(
                F.when(c.isNotNull(), F.array(c))
            )
        ).alias("_v"),
    )
    a = ex.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_v")
    b = ex.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_v")
    return (
        a.join(b, "_v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.levenshtein("_sa", "_sb").cast("long").alias("distance"))
        .filter(F.col("distance") <= 1)
        .distinct()
    )
