"""Deterministic unit fixtures for the probabilistic dedup operators
(SURVEY §5.3): planted duplicates with known Jaccard; LSH recall vs the
exact pair set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def planted(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup of 0
        (3, "completely different text about spark query engines and columnar storage"),
        (4, "another unrelated document discussing benchmark suites and optimizers"),
        (5, base.upper()),  # normalized-exact dup of 0 (case only)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_planted(planted):
    out = exact_dedup(planted, "doc_id", "text").collect()
    by_keeper = {r["doc_id"]: r["n_copies"] for r in out}
    # 0, 1 and 5 share a normalized fingerprint; keeper is min id = 0
    assert by_keeper[0] == 3
    assert by_keeper[3] == 1 and by_keeper[4] == 1
    assert 1 not in by_keeper and 5 not in by_keeper


def test_ngram_jaccard_planted(planted):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted, "doc_id", "text", 0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0  # one-word change
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_lsh_recall_on_planted(planted):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(planted, "doc_id", "text", 0.6).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(planted, "doc_id", "text", threshold=0.6).collect()
    }
    # verified output can never contain false positives
    assert approx <= exact
    # high-similarity planted pairs must be recalled
    assert (0, 1) in approx and (0, 2) in approx


def test_minhash_lsh_recall_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert approx <= exact
    if exact:
        recall = len(approx & exact) / len(exact)
        # 32 hashes / 8 bands: P(candidate | j=0.5) ≈ 1-(1-0.5^4)^8 ≈ 0.40,
        # rising steeply with j; fixture near-dups are designed high-j.
        assert recall >= 0.5, f"LSH recall {recall:.2f} on {len(exact)} exact pairs"


def test_simhash_planted(spark, planted):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(planted, "doc_id", "text", max_hamming=6).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text → identical simhash
    assert (0, 3) not in pairs  # unrelated text stays apart

    # 16-bit banding *guarantees* recall only at hamming<=3 (pigeonhole over
    # 4 bands); a one-token edit in a long doc flips few bits — must be found.
    long_base = " ".join(f"word{i}" for i in range(200))
    long_rows = spark.createDataFrame(
        [(10, long_base), (11, long_base.replace("word100", "changed"))],
        "doc_id long, text string",
    )
    long_pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(long_rows, "doc_id", "text", max_hamming=3).collect()
    }
    assert (10, 11) in long_pairs and long_pairs[(10, 11)] <= 3


def test_lsh_candidates_no_self_pairs(planted):
    cands = lsh_candidate_pairs(planted, "doc_id", "text").collect()
    assert all(r["id_a"] < r["id_b"] for r in cands)


def test_ngram_jaccard_df_cap_prunes_hot_shingle(spark):
    """A corpus-wide-common shingle (boilerplate footer) must not
    quadratically fan out the inverted-index self-join: with a DF cap it
    is dropped from the index AND the set sizes, so the 20 boilerplate
    docs produce ZERO pairs while a genuine duplicate pair (whose
    shingles stay under the cap) still scores 1.0."""
    footer = "all rights reserved worldwide"
    rows = [(i, f"unique{i}alpha unique{i}beta unique{i}gamma {footer}") for i in range(20)]
    dup = "spark engines rewrite the optimizer landscape quietly"
    rows += [(100, dup), (101, dup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", 0.05, 3).collect()
    capped = ngram_jaccard_pairs(df, "doc_id", "text", 0.05, 3, max_df=5).collect()
    # uncapped: every boilerplate doc pairs with every other (C(20,2)=190)
    # purely through the shared footer shingles, plus the true dup pair
    assert len(uncapped) == 190 + 1
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped}
    assert got == {(100, 101): 1.0}


def test_ngram_jaccard_df_cap_noop_when_under_cap(spark):
    """A cap above every shingle's DF must not change any pair or score
    (the capped universe equals the full universe)."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "columnar storage engines love vectorized execution"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 0.3, 3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 0.3, 3, max_df=100).collect()
    }
    assert base == capped and (0, 1) in base


def test_containment_catches_subset_duplication(spark):
    """X32: a short doc fully quoted inside a longer one has containment
    1.0 from the short side while its Jaccard stays below any near-dup
    threshold — the case symmetric dedup misses."""
    from nagios_custom_etl_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, short), (1, long), (2, "totally unrelated words about storage engines")],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r for r in containment_pairs(df, "doc_id", "text", 0.9, 3).collect()}
    assert set(got) == {(0, 1)}
    r = got[(0, 1)]
    assert r["cont_a"] == 1.0  # every shingle of the short doc is in the long one
    assert r["cont_b"] < 0.5
    # and symmetric Jaccard would have missed it at the same threshold
    jac = {
        (p["id_a"], p["id_b"]) for p in ngram_jaccard_pairs(df, "doc_id", "text", 0.5).collect()
    }
    assert (0, 1) not in jac


def test_novelty_curve_orders_discovery(spark):
    """X31: first doc is all-new, an exact later copy contributes nothing,
    a half-overlapping doc scores in between."""
    from nagios_custom_etl_spark.operators.dedup import novelty_curve

    base = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, base + " nine ten eleven twelve thirteen fourteen")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in novelty_curve(df, "doc_id", "text", 3).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0
    assert 0.0 < got[2]["novelty"] < 1.0
    assert got[2]["n_new"] == got[2]["n_sh"] - got[0]["n_sh"]  # exactly the new tail


def test_connected_components_chain_clique_singleton(spark):
    """Chain 1-2-3-4 (diameter 3, needs >1 propagation round), clique
    10-11-12, isolated pair 20-21: every node labels with its component
    min."""
    from nagios_custom_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_near_dup_clusters_survivor_choice(spark):
    """Transitive near-dups collapse to one cluster; survivor is the
    highest-quality member with min-id tie-break."""
    from nagios_custom_etl_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7), (9, 50)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = near_dup_clusters(docs, pairs, "doc_id", "n_chars").collect()
    assert len(rows) == 1  # singleton 4 / 9 not emitted
    r = rows[0]
    assert (r["component"], r["n_members"], r["survivor"]) == (1, 3, 2)


def test_decontaminate_planted_overlap(spark):
    """A train doc embedding an eval doc's 5-gram is flagged; clean train
    docs are not."""
    from nagios_custom_etl_spark.operators.dedup import decontaminate

    evalset = spark.createDataFrame(
        [(100, "the capital of france is paris obviously")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "students learn that the capital of france is paris in school"),
            (2, "a totally unrelated document about spark shuffle partitions"),
        ],
        "doc_id long, text string",
    )
    got = decontaminate(train, evalset, "doc_id", "text", shingle_n=5).collect()
    assert [(r["doc_id"], r["n_shared_shingles"] > 0) for r in got] == [(1, True)]


def test_repetition_metrics_planted(spark):
    """A degenerate looping doc scores near 1 on both metrics; a
    no-repeat doc scores 0 on dup-3gram."""
    from nagios_custom_etl_spark.operators.dedup import repetition_metrics

    loop = " ".join(["buy now"] * 10)  # "buy now buy now ..."
    clean = "every word in this sentence appears exactly once"
    docs = spark.createDataFrame(
        [(1, loop, len(loop)), (2, clean, len(clean))],
        "doc_id long, text string, n_chars long",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(docs, "doc_id", "text", "n_chars").collect()}
    # loop doc: "now buy" occurs 9x, "buy now" 10x -> top 2-gram covers
    # 10*7=70 of 79 chars; every 3-gram repeats
    assert got[1]["top_2gram_frac"] == pytest.approx(70 / 79)
    assert got[1]["dup_3gram_frac"] > 1.0  # overlapping occurrences counted
    assert got[2]["dup_3gram_frac"] == 0.0
    assert 0 < got[2]["top_2gram_frac"] < 0.5


def test_boilerplate_stats_planted(spark):
    from nagios_custom_etl_spark.operators.dedup import boilerplate_stats

    footer = "contact us at example dot com for details"  # 8 tokens -> 4 5-gram shingles
    rows = [
        (0, "alpha beta gamma delta epsilon zeta " + footer),
        (1, "one two three four five six seven " + footer),
        (2, "red orange yellow green blue indigo " + footer),
        (3, "unique words only in this document here appear"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_stats(df, "doc_id", "text", shingle_n=5, min_df=3).collect()
    }
    assert len(out) == 4
    # the footer contributes 4 shared shingles to docs 0-2 (df=3); the
    # seam shingles straddling unique-prefix/footer differ per doc (df=1)
    for doc in (0, 1, 2):
        assert out[doc]["n_boiler"] == 4, out[doc]
        assert 0 < out[doc]["boiler_ratio"] < 1
    assert out[3]["n_boiler"] == 0
    assert out[3]["boiler_ratio"] == 0.0
    # short doc (< shingle_n tokens) counts one whole-doc shingle
    short = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    row = boilerplate_stats(
        df.unionByName(short), "doc_id", "text", shingle_n=5, min_df=3
    ).filter("doc_id = 9").collect()[0]
    assert row["n_shingles"] == 1 and row["n_boiler"] == 0


def test_minhash_pairs_equal_exact_pairs_on_fixture(spark, sf_dir):
    """x13's scale-path guarantee: LSH candidates + exact-Jaccard verify
    reproduce the exact inverted-index pair set on the fixture (recall
    1.0 at these similarity levels), so the clustering oracle holds."""
    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, 3).collect()}
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert exact == mh and len(exact) > 0


def test_stars_cc_equals_minlabel_and_bounds_rounds(spark):
    """connected_components_stars must label identically to min-label
    propagation, and converge on a 120-node shuffled chain within
    far fewer rounds than the diameter (O(log² n) vs O(n))."""
    import random

    from nagios_custom_etl_spark.operators.dedup import (
        connected_components,
        connected_components_stars,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    base = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    stars = {r["node"]: r["component"] for r in connected_components_stars(pairs).collect()}
    assert stars == base

    nodes = list(range(5000, 5120))
    random.Random(3).shuffle(nodes)
    chain = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in zip(nodes, nodes[1:])], "id_a long, id_b long"
    )
    # diameter 119: min-label would need ~119 rounds; stars gets 12
    got = {
        r["node"]: r["component"]
        for r in connected_components_stars(chain, max_iterations=12).collect()
    }
    assert got == {n: min(nodes) for n in nodes}


def test_dup_span_coverage_planted(spark):
    from nagios_custom_etl_spark.operators.dedup import dup_span_coverage

    rep = "a b c d e f g h"  # the shared 8-gram
    docs = spark.createDataFrame(
        [
            # doc 0: the repeated 8-gram at pos 2 of 12 tokens -> 8 covered
            (0, "x y " + rep + " z Q"),
            # doc 1: overlapping duplicated region — positions 0..8 (9 tokens):
            # shingles at 0 and 1 both duplicated (1's window is b..h i? no —
            # only the planted 8-gram repeats), so exactly pos 0..7 again
            (1, rep + " tail1 tail2"),
            # doc 2: no duplicated shingle, long enough to have shingles
            (2, "p q r s t u v w x y z"),
            # doc 3: shorter than 8 tokens -> zero shingles, zero coverage
            (3, "too short text"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_covered, r.dup_ratio_r)
        for r in dup_span_coverage(docs, "doc_id", "text", n=8).collect()
    }
    assert got[0] == (12, 8, round(8 / 12, 6))
    assert got[1] == (10, 8, round(8 / 10, 6))
    assert got[2] == (11, 0, 0.0)
    assert got[3] == (3, 0, 0.0)


def test_dup_span_coverage_merges_overlapping_islands(spark):
    from nagios_custom_etl_spark.operators.dedup import dup_span_coverage

    # two docs sharing a 10-token run -> shingles at pos 0,1,2 all repeat;
    # the three [p, p+7] intervals merge into ONE island covering 10
    run = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame(
        [(0, run + " uniqA uniqB"), (1, run + " other tokens")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.dup_covered for r in dup_span_coverage(docs, "doc_id", "text").collect()}
    assert got == {0: 10, 1: 10}


def test_dup_span_coverage_hot_shingle(spark):
    """Planted hot shingle — one boilerplate 8-gram in >=50% of docs
    (the skew shape the r8 verdict flagged): the corpus count now goes
    through groupBy+semi-join (map-side partials crush the hot key;
    the join gets AQE skew splitting) instead of a window partitioned
    by the shingle, and the answer must be exact regardless."""
    from nagios_custom_etl_spark.operators.dedup import dup_span_coverage

    boiler = "subscribe to our newsletter for more great content"  # 8 tokens
    rows = [(i, f"u{i}a u{i}b " + boiler + f" u{i}c") for i in range(600)]
    rows += [(1000 + i, f"v{i}a v{i}b v{i}c v{i}d v{i}e v{i}f v{i}g v{i}h v{i}i") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_span_coverage(docs, "doc_id", "text", n=8).collect()
    hot = [r for r in out if r.doc_id < 1000]
    cold = [r for r in out if r.doc_id >= 1000]
    assert len(hot) == 600 and all(r.dup_covered == 8 for r in hot)
    assert len(cold) == 200 and all(r.dup_covered == 0 for r in cold)
