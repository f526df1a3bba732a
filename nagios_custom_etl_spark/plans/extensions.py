"""Extension-operator queries (SURVEY §2.12 X1–X6): dedup, similarity
search, text analysis, multimodal columns, time windows. Exercised on the
``documents`` / ``embeddings`` / ``events`` fixtures; SQL-expressible ones
carry DuckDB oracles, probabilistic/LSH ones are rows-only here and
recall-tested against exact baselines in tests/.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import cache_once, load_table
from nagios_custom_etl_spark.functions.text import (
    lang_id,
    normalized_fingerprint,
    quality_metrics,
    tokens,
)
from nagios_custom_etl_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_near_dup_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    repetition_metrics,
    simhash_near_dup_pairs,
)
from nagios_custom_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_build,
    ivf_search,
)
from nagios_custom_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# X1 — exact dedup
# ---------------------------------------------------------------------------


@register(
    "x1_exact_dedup",
    oracle="""
    SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id,
                 sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
          FROM documents)
    GROUP BY fingerprint
    """,
    doc="X1 exact dedup: normalized-text fingerprint, deterministic min-id "
    "keeper, copy counts (generalizes reference extract.py:115-132 J3).",
)
def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "x1b_dedup_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           COUNT(DISTINCT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_unique,
           COUNT(*) - COUNT(DISTINCT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_dupes
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="X1 dedup statistics per language partition.",
)
def x1b_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = normalized_fingerprint("text")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(fp).alias("n_unique"),
            (F.count(F.lit(1)) - F.count_distinct(fp)).alias("n_dupes"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# X2 — near-duplicate detection
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.5
SHINGLE_N = 3
# Inverted-index fan-out cap (CCNet-style): shingles in more than this many
# documents are dropped from the index and the set sizes before pairing.
# 5 engages on the fixture (max organic DF is 7 at sf0.01) so the capped
# path itself is oracle-validated; at 100 TB this is a corpus fraction.
MAX_SHINGLE_DF = 5


@register(
    "x2_ngram_jaccard_pairs",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    capped AS (
      SELECT doc_id, shingle FROM shingled
      WHERE shingle IN (
        SELECT shingle FROM shingled GROUP BY shingle HAVING COUNT(*) <= {MAX_SHINGLE_DF}
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM capped a JOIN capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON shared.id_a = sa.doc_id
    JOIN sizes sb ON shared.id_b = sb.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= {JACCARD_THRESHOLD}
    """,
    doc="X2 exact n-gram Jaccard near-dup pairs via inverted shingle index "
    "with a document-frequency cap on the index (the CCNet-style guard "
    "against hot-shingle quadratic fan-out) — the oracle-checkable exact "
    "counterpart of MinHash-LSH.",
)
def x2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d, "doc_id", "text", JACCARD_THRESHOLD, SHINGLE_N, max_df=MAX_SHINGLE_DF
    )


@register(
    "x2b_minhash_lsh_neardup",
    oracle=None,  # probabilistic candidate recall — verified vs exact in tests
    doc="X2 MinHash+LSH near-dup: shingle→minhash→band→bucket-join→exact "
    "Jaccard verify. Rows-only here; recall vs the exact pair set is "
    "asserted in tests/test_dedup.py.",
)
def x2b_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=JACCARD_THRESHOLD, num_hashes=32, bands=8
    ).orderBy("id_a", "id_b")


@register(
    "x2c_simhash_neardup",
    oracle=None,  # engine-specific hash basis — planted-dup behavior in tests
    doc="X2 SimHash near-dup at Hamming<=3 with 16-bit pigeonhole banding.",
)
def x2c_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=6).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# X3 — similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "x3_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cos_sim_r
    FROM embeddings, q
    ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC, vec_id
    LIMIT 10
    """,
    doc="X3 brute-force cosine top-k (exact ANN baseline). Similarity is "
    "rounded to 6dp in the output to absorb engine-side fp formula "
    "differences; ranking uses the unrounded value.",
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    out = cosine_topk(em, "embedding", "vec_id", qvec, k=10)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim_r"))


@register(
    "x3b_embedding_neardup_lsh",
    oracle="""
    -- planted near-dups: each vector's 0.9-scaled copy at vec_id+1000000.
    -- scaling preserves direction ⇒ cosine exactly 1 and identical sign-LSH
    -- buckets, so LSH recall is total; no organic fixture pair reaches 0.85
    -- (max pairwise cosine ≈ 0.48).
    SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
           CAST(1.0 AS DOUBLE) AS cos_sim_r
    FROM embeddings
    """,
    doc="X3/X1 embedding-cosine near-dup pairs via multi-table sign-LSH "
    "buckets + exact cosine verify, demonstrated on planted scaled copies.",
)
def x3b_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.vector import as_double_array

    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("embedding")
    )
    copies = em.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.9).alias("embedding"),
    )
    return (
        embedding_near_dup_pairs(
            em.unionByName(copies),
            "embedding",
            "vec_id",
            dim=64,
            threshold=0.85,
            n_planes=8,
            n_tables=6,
        )
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim_r"))
        .orderBy("id_a", "id_b")
    )


@register(
    "x3c_ann_ivf",
    oracle=None,  # k-means cell boundaries are engine-specific; recall in tests
    doc="X3 IVF approximate search: k-means coarse cells (pyspark.ml), "
    "n_probe nearest cells scanned exactly. The scale path: index table "
    "partitioned by cell_id → partition-pruned probes.",
)
def x3c_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    assigned, centroids = ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    hits = ivf_search(assigned, centroids, "embedding", "vec_id", qvec, k=10, n_probe=3)
    return hits.select("vec_id", F.round("cos_sim", 6).alias("cos_sim_r"))


def _recall_per_query(exact_all: DataFrame, approx_all: DataFrame, k: int) -> DataFrame:
    """recall@k with a guaranteed row PER probe query: aggregate from the
    exact side with a hit flag (left join + count of matches), so a
    catastrophic recall regression reports recall_at_10 = 0.0 instead of
    silently shrinking the result set (ADVICE r4 — the old left_semi +
    groupBy dropped zero-hit queries, ambiguous for a rows-only
    regression-contract query). The exact side always has k rows per
    query, so every query_id emits exactly one row. The approx side is
    deduplicated first — a left join would otherwise multiply rows on a
    duplicate (query_id, vec_id) and report recall > 1.0, masking a
    regression (the left_semi this replaced counted each at most once)."""
    keys = list(exact_all.columns)
    hits = approx_all.dropDuplicates(keys).withColumn("_hit", F.lit(1))
    return (
        exact_all.join(hits, keys, "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").alias("n_hits"),
            (F.count("_hit").cast("double") / k).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@register(
    "x3d_ann_recall",
    oracle=None,  # k-means cells are engine-specific; the METRIC is the
    # contract — recall@10 vs the exact brute-force top-k, one row per
    # probe query, so an index/probing regression flips the driver row
    doc="X3 ANN quality gate: recall@10 of the IVF index (n_probe=3 of 8 "
    "cells) against exact brute-force cosine top-10, for three probe "
    "queries. Distributed semi-join intersection; only the three query "
    "vectors touch the driver. NOTE the fixture embeddings are "
    "near-isotropic, so coarse-quantization recall is modest by "
    "construction for some queries (0.4–1.0 here, flat in n_probe) — "
    "the row is a REGRESSION gate on index+probe behavior, not an "
    "absolute-quality claim.",
)
def x3d_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import cosine_topk_join

    em = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    k = 10
    # one bounded driver fetch for all probe queries (cells are picked
    # driver-side from the centroid list), one broadcast pass for the
    # exact side — not a scan per query
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in em.filter(F.col("vec_id") < 3).collect()
    }
    exact_all = cosine_topk_join(
        em, em.filter(F.col("vec_id") < 3), "embedding", "vec_id", "embedding", "vec_id", k=k
    ).select("query_id", F.col("nbr_id").alias("vec_id"))
    approx_parts = [
        ivf_search(assigned, centroids, "embedding", "vec_id", qv, k=k, n_probe=3)
        .select(F.lit(qid).alias("query_id"), "vec_id")
        for qid, qv in sorted(qvecs.items())
    ]
    approx_all = reduce(DataFrame.unionByName, approx_parts)
    return _recall_per_query(exact_all, approx_all, k)


@register(
    "x49_pq_ann",
    oracle=None,  # codebooks are k-means (engine-specific); the contract
    # is the recall metric vs exact cosine top-k plus the compression
    # ratio, which is pure arithmetic
    doc="X49 product quantization ANN (operators/similarity.py::pq_train/"
    "pq_encode/pq_topk — Jegou et al. TPAMI 2011): codebooks train "
    "driver-side on a deterministic hash-ordered sample (constant work "
    "at any scale, the FAISS recipe); ENCODING is the distributed hot "
    "path (vectorized Arrow pandas UDF, one numpy argmin per subspace "
    "per batch); ADC search is pure built-ins over the m-int codes with "
    "a broadcast per-query LUT literal — the float vectors are never "
    "read at search time. 64-dim float64 -> 16 byte-codes = the "
    "compression that fits a 10^11-vector index in cluster memory at "
    "100 TB. Output: recall@10 vs exact cosine per probe query + "
    "bytes-per-vector. NOTE the fixture embeddings are near-isotropic "
    "(hardest case for quantization), so recall ~0.6 here is the "
    "by-construction regression baseline, not a quality ceiling.",
)
def x49_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import (
        cosine_topk_join,
        pq_encode,
        pq_train,
        pq_topk,
    )

    em = cache_once(load_table(spark, sf_dir, "embeddings"))
    k = 10
    codebooks = pq_train(em, "embedding", "vec_id", m=16, ks=64, seed=42)
    codes = cache_once(pq_encode(em, "embedding", "vec_id", codebooks))
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in em.filter(F.col("vec_id") < 3).collect()
    }
    exact_all = cosine_topk_join(
        em, em.filter(F.col("vec_id") < 3), "embedding", "vec_id", "embedding", "vec_id", k=k
    ).select("query_id", F.col("nbr_id").alias("vec_id"))
    approx_parts = [
        pq_topk(codes, codebooks, "vec_id", qv, k=k)
        .select(F.lit(qid).alias("query_id"), "vec_id")
        for qid, qv in sorted(qvecs.items())
    ]
    approx_all = reduce(DataFrame.unionByName, approx_parts)
    return _recall_per_query(exact_all, approx_all, k).withColumn(
        "code_bytes_per_vec", F.lit(16).cast("long")
    )


@register(
    "x49b_ivf_pq",
    oracle=None,  # k-means cells + codebooks are engine-specific; the
    # recall metric vs exact cosine is the regression contract
    doc="X49b IVF-PQ composition (operators/similarity.py::ivf_pq_topk): "
    "coarse cell routing (driver-picked probe cells, partition-prunable) "
    "+ ADC over the m-byte codes within probed cells — the full FAISS "
    "serving shape; per-query cost is (n_probe/n_cells) x codes-bytes. "
    "Probe-all reproduces plain PQ exactly (test-pinned). Output: "
    "recall@10 vs exact cosine for 3 probe queries at n_probe=3 of 8.",
)
def x49b_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import (
        cosine_topk_join,
        ivf_build,
        ivf_pq_topk,
        pq_encode,
        pq_train,
    )

    em = cache_once(load_table(spark, sf_dir, "embeddings"))
    k = 10
    assigned, centroids = ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    codebooks = pq_train(em, "embedding", "vec_id", m=16, ks=64, seed=42)
    codes = cache_once(pq_encode(em, "embedding", "vec_id", codebooks))
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in em.filter(F.col("vec_id") < 3).collect()
    }
    exact_all = cosine_topk_join(
        em, em.filter(F.col("vec_id") < 3), "embedding", "vec_id", "embedding", "vec_id", k=k
    ).select("query_id", F.col("nbr_id").alias("vec_id"))
    approx_parts = [
        ivf_pq_topk(assigned, centroids, codes, codebooks, "vec_id", qv, k=k, n_probe=3)
        .select(F.lit(qid).alias("query_id"), "vec_id")
        for qid, qv in sorted(qvecs.items())
    ]
    approx_all = reduce(DataFrame.unionByName, approx_parts)
    return _recall_per_query(exact_all, approx_all, k)


# one source of truth for the planted-lossless PQ twins (x49c/x49d):
# the probed pattern, the PQ hyperparameters, and the query vector —
# editing one of these in only one twin would desynchronize their
# shared oracle and flip exactly one red
_PLANTED_PQ = {"m": 2, "ks": 8, "seed": 7}
_PLANTED_QUERY_PATTERN = 3
_PLANTED_QUERY_VEC = [float((j == _PLANTED_QUERY_PATTERN) * 2 + 1) for j in range(8)] * 2
_PLANTED_PQ_ORACLE_TAIL = f"""
    SELECT vec_id, CAST(0.0 AS DOUBLE) AS adc_dist_r
    FROM embeddings WHERE vec_id % 8 = {_PLANTED_QUERY_PATTERN}
    ORDER BY vec_id LIMIT 12
    """


def _planted_pattern_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) where each vector is pattern ``vec_id % 8``
    repeated over both 8-dim subspaces — 8 distinct subvectors, so PQ
    with ks=8 is lossless (Lloyd's distinct-rows init seeds every
    pattern as its own codeword) and ADC equals true squared-L2."""
    em = load_table(spark, sf_dir, "embeddings").select("vec_id")
    pat = F.col("vec_id") % 8
    return em.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda j: F.when((j % 8) == pat, F.lit(3.0)).otherwise(F.lit(1.0)),
        ).alias("embedding"),
    )


@register(
    "x49c_pq_adc_planted",
    oracle="""
    -- planted-lossless PQ: each vector is one of 8 pattern subvectors
    -- repeated over both subspaces (pattern = vec_id % 8), so with ks=8
    -- every distinct subvector becomes its own codeword (Lloyd init is
    -- distinct-rows), encoding is lossless and ADC distance equals true
    -- squared-L2 on the normalized vectors: 0 for matching patterns,
    -- 0.5 for every other pair (patterns are permutations of each
    -- other). Top-12 for the probed pattern's query is therefore exactly
    -- the 12 smallest vec_ids of that pattern, all at distance 0 — SQL-
    -- predictable end to end (VERDICT r4 task 4).
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X49c oracle-checked PQ ADC correctness: the full train -> "
    "distributed encode (vectorized Arrow pandas UDF) -> broadcast-LUT "
    "ADC top-k chain (operators/similarity.py::pq_train/pq_encode/"
    "pq_topk) on planted codeword-exact vectors, where the approximate "
    "search provably equals the exact answer and a DuckDB oracle can "
    "predict every output cell. Complements the organic-recall "
    "regression gates (x49/x49b) with a hash-checked row.",
)
def x49c_pq_adc_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import pq_encode, pq_topk, pq_train

    planted = _planted_pattern_embeddings(spark, sf_dir)
    cb = pq_train(planted, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(planted, "embedding", "vec_id", cb)
    q = _PLANTED_QUERY_VEC
    # keep only the zero-distance matches out of the top-12: if a
    # regenerated fixture ever had < 12 vec_ids with vec_id % 8 = 3,
    # pq_topk would backfill with distance-0.5 rows while the oracle's
    # WHERE ... LIMIT 12 returns fewer — the filter makes both sides
    # "the first <=12 exact matches" for ANY id population (project notes:
    # never pin to data-dependent fixture thresholds)
    return (
        pq_topk(codes, cb, "vec_id", q, k=12)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x49d_ivf_pq_planted",
    oracle="""
    -- x49c's planted-lossless construction routed through the FULL
    -- IVF-PQ serving chain (ivf_build cell assignment -> driver-picked
    -- probe cells -> ADC within routed cells) with probe-all: routing
    -- covers every cell regardless of how k-means carved them, so the
    -- answer equals plain planted PQ — SQL-predictable like x49c.
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X49d oracle-checked IVF-PQ composition: the complete FAISS "
    "serving shape (coarse cell routing + ADC over codes in probed "
    "cells, operators/similarity.py::ivf_pq_topk) hash-checked end to "
    "end on the planted codeword-exact vectors with probe-all routing. "
    "Complements x49c (plain PQ oracle) and x49b (organic IVF-PQ "
    "recall gate): every stage of the approximate serving chain now has "
    "a driver-hash-verifiable row.",
)
def x49d_ivf_pq_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import (
        ivf_build,
        ivf_pq_topk,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    assigned, centroids = ivf_build(planted, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(planted, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(planted, "embedding", "vec_id", cb)
    q = _PLANTED_QUERY_VEC
    return (
        ivf_pq_topk(assigned, centroids, codes, cb, "vec_id", q, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x52_ann_index_persist_roundtrip",
    oracle="""
    -- x49d's planted-lossless IVF-PQ construction round-tripped through
    -- DISK: build -> ann_write_index (assigned rows partitioned by
    -- cell_id + centroid/codebook JSON sidecar) -> ann_load_index (zero
    -- KMeans/Lloyd fits, zero encode passes — test-pinned) -> probe-all
    -- ADC. Persistence must be invisible to the answer, so the oracle is
    -- exactly the planted-PQ prediction (VERDICT r5 task 1).
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X52 ANN index persistence: the durable form of the session memos "
    "(operators/similarity.py::ann_write_index/ann_load_index) — a "
    "serving restart costs a sidecar read + parquet analysis instead of "
    "re-training codebooks and re-encoding the corpus (at 10^11 vectors "
    "the system's most expensive job). Search from the loaded index "
    "hash-matches the same DuckDB oracle as the in-memory chain; the "
    "cell_id partition filter prunes probed cells at file-listing level.",
)
def x52_ann_index_persist_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_load_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    assigned, centroids = ivf_build(planted, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(planted, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(planted, "embedding", "vec_id", cb)
    # deterministic per-process dir, cleaned per invocation (overwrite-mode
    # write + fresh load keep reruns idempotent anyway)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x52_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x53_ann_index_codes_only",
    oracle="""
    -- the 10^11-vector representation end to end: the persisted index
    -- stores ONLY m-byte PQ codes (no float vectors) + the sidecar, and
    -- the loaded search must still produce the exact planted answer via
    -- ADC. Same prediction as x49c/x52 — the storage mode must be
    -- invisible to the ADC result.
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X53 codes-only persisted index (ann_write_index with "
    "vec_col=None): the compressed serving representation — m bytes per "
    "vector, no float payload — round-tripped through disk and searched "
    "with the broadcast-LUT ADC. exact_search correctly refuses (no "
    "vectors stored; test-pinned); at 100 TB this mode is what fits the "
    "full index in cluster storage, with exact re-rank delegated to the "
    "corpus table when needed.",
)
def x53_ann_index_codes_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_load_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    assigned, centroids = ivf_build(planted, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(planted, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(planted, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x53_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", None, codes, cb)
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x54_ann_index_incremental_append",
    oracle="""
    -- incremental index maintenance: the index is built and persisted on
    -- HALF the corpus (vec_id % 16 < 8 — every pattern present, so PQ
    -- stays planted-lossless), then the other half is appended through
    -- ann_append_to_index (expression-assigned cells, encode with the
    -- FROZEN stored codebooks, files appended into the cell partitions —
    -- zero refits). Probe-all search over the grown index must find the
    -- planted matches from BOTH halves: the same top-12 prediction as
    -- x49c, which spans odd and even vec_ids.
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X54 incremental append to a persisted index "
    "(operators/similarity.py::ann_append_to_index — the FAISS `add` "
    "operation): new vectors route to cells via a pure argmin expression "
    "over the stored centroids and encode with the stored codebooks; "
    "quantizers stay frozen (re-training is a separate full-rebuild "
    "job). The grown index answers for old AND new rows under the same "
    "planted oracle; assignment parity with KMeans.transform and "
    "zero-refit appends are test-pinned.",
)
def x54_ann_index_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_load_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    initial = planted.filter(F.col("vec_id") % 16 < 8)
    arrivals = planted.filter(F.col("vec_id") % 16 >= 8)
    assigned, centroids = ivf_build(initial, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(initial, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(initial, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x54_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    ann_append_to_index(spark, path, arrivals)
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x55_ann_index_delete",
    oracle="""
    -- deletion completes the index lifecycle: build+persist on the full
    -- planted corpus, then delete every vec_id % 16 >= 8 row (only the
    -- affected cell partitions are rewritten — an anti-join per touched
    -- cell, untouched cells' files never read). Probe-all search must
    -- then find ONLY surviving planted matches: vec_id % 8 = 3 rows
    -- with vec_id % 16 < 8, i.e. exactly vec_id % 16 = 3.
    SELECT vec_id, CAST(0.0 AS DOUBLE) AS adc_dist_r
    FROM embeddings WHERE vec_id % 16 = 3
    ORDER BY vec_id LIMIT 12
    """,
    doc="X55 index deletion (operators/similarity.py::"
    "ann_delete_from_index): ids arrive as a DataFrame (a 100 TB "
    "deletion list joins distributed, never a driver IN-list); touched "
    "cells are found with one bounded metadata join and rewritten via "
    "dynamic partition overwrite. The shrunk index must stop answering "
    "for deleted rows — SQL-predictable on the planted construction.",
)
def x55_ann_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_delete_from_index,
        ann_load_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    assigned, centroids = ivf_build(planted, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(planted, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(planted, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x55_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    ann_delete_from_index(
        spark, path, planted.filter(F.col("vec_id") % 16 >= 8).select("vec_id")
    )
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x56_ann_index_compaction",
    oracle="""
    -- compaction is layout-only maintenance: after the x54 build+append
    -- (which leaves one file per (write, cell)), ann_compact_index
    -- rewrites sliver-heavy cells into file-sized output — and the
    -- probe-all answer must be byte-identical to the uncompacted index:
    -- the same planted prediction as x49c/x54, spanning both halves.
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X56 index compaction (operators/similarity.py::"
    "ann_compact_index — OPTIMIZE for the ANN index): file counts per "
    "cell from a distributed input_file_name() pass, only cells over "
    "the per-cell file threshold rewritten (dynamic partition "
    "overwrite, one task per cell). Answers are layout-invariant by "
    "oracle; the file-count drop is pinned in tests/test_similarity.py.",
)
def x56_ann_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_compact_index,
        ann_load_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    initial = planted.filter(F.col("vec_id") % 16 < 8)
    assigned, centroids = ivf_build(initial, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(initial, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(initial, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x56_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    # four appends leave ≥5 files per touched cell — the sliver pile
    for lo, hi in ((8, 10), (10, 12), (12, 14), (14, 16)):
        batch = planted.filter((F.col("vec_id") % 16 >= lo) & (F.col("vec_id") % 16 < hi))
        ann_append_to_index(spark, path, batch)
    ann_compact_index(spark, path, max_files_per_cell=2)
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x57_ann_range_search",
    oracle="""
    -- range search (the FAISS range_search shape): EVERYTHING at least
    -- this similar, not top-k. On the planted construction cosine is
    -- exactly 1.0 for same-pattern pairs and 0.75 for every other pair
    -- (normalized patterns are permutations of each other), so a 0.9
    -- threshold returns precisely the full same-pattern set — unbounded
    -- cardinality, SQL-predictable.
    SELECT vec_id, CAST(1.0 AS DOUBLE) AS cos_sim_r
    FROM embeddings WHERE vec_id % 8 = 3
    ORDER BY vec_id
    """,
    doc="X57 range search over the persisted index "
    "(AnnIndex.range_search): all rows with cosine >= threshold within "
    "probed cells — a filter over the partition-pruned scan with no "
    "limit and no global sort, so the result stays distributed at any "
    "cardinality (what dedup/decontamination consumes, vs top-k's "
    "serving shape). Runs against the write->load round trip, so the "
    "whole chain is disk-backed.",
)
def x57_ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_load_index,
        ann_write_index,
        ivf_build,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    assigned, centroids = ivf_build(planted, "embedding", "vec_id", n_cells=4, seed=11)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x57_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding")
    idx = ann_load_index(spark, path)
    return (
        idx.range_search(_PLANTED_QUERY_VEC, min_cosine=0.9, n_probe=4)
        .select("vec_id", F.round("cos_sim", 6).alias("cos_sim_r"))
        .orderBy("vec_id")
    )


@register(
    "x3f_ann_ivf_join",
    oracle=None,  # k-means cells are engine-specific; recall@10 vs the
    # exact join is the regression contract, parity proven in tests
    doc="X3 IVF-routed top-k JOIN (operators/similarity.py::"
    "cosine_topk_join_ivf): per-query neighbors WITHOUT broadcasting the "
    "query side — queries rank the broadcast centroid table map-side, "
    "keep n_probe cells, equi-join on cell_id, window top-k. The "
    "non-broadcastable-query-side path VERDICT r3 asked for; probing all "
    "cells reproduces the brute-force join exactly (tested). Output: "
    "recall@10 vs the exact join for 5 probe queries (n_probe=3 of 8).",
)
def x3f_ann_ivf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import (
        cosine_topk_join,
        cosine_topk_join_ivf,
    )

    em = load_table(spark, sf_dir, "embeddings")
    qs = em.filter(F.col("vec_id") < 5)
    k = 10
    exact = cosine_topk_join(
        em, qs, "embedding", "vec_id", "embedding", "vec_id", k=k
    ).select("query_id", "nbr_id")
    approx = cosine_topk_join_ivf(
        em, qs, "embedding", "vec_id", "embedding", "vec_id",
        k=k, n_cells=8, n_probe=3, seed=42,
    ).select("query_id", "nbr_id")
    return _recall_per_query(exact, approx, k)


# ---------------------------------------------------------------------------
# X4 — text analysis
# ---------------------------------------------------------------------------


@register(
    "x4_token_stats",
    oracle="""
    SELECT doc_id,
           length(toks) AS n_tokens,
           length(list_distinct(toks)) AS n_distinct_tokens,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
             / greatest(length(toks), 1) AS avg_token_len
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents WHERE doc_id % 20 = 0)
    ORDER BY doc_id
    """,
    doc="X4 token counting: whitespace tokens, distinct tokens, mean length.",
)
def x4_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    m = quality_metrics("text")
    return d.select(
        "doc_id",
        m["n_tokens"].alias("n_tokens"),
        m["n_distinct_tokens"].alias("n_distinct_tokens"),
        m["avg_token_len"].alias("avg_token_len"),
    ).orderBy("doc_id")


@register(
    "x4b_quality_filter",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           COUNT(CASE WHEN n_chars BETWEEN 100 AND 5000
                       AND length(list_filter(string_split(text, ' '), t -> t <> '')) >= 20
                      THEN 1 END) AS n_quality
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="X4 quality scoring/filtering: length + token-count gates per lang "
    "(punct/stopword ratios exercised in tests — fixture text has no punct).",
)
def x4b_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    is_quality = (
        F.col("n_chars").between(100, 5000) & (F.size(tokens("text")) >= 20)
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(is_quality, 1)).alias("n_quality"),
        )
        .orderBy("lang")
    )


def _lang_id_oracle() -> str:
    """Generate the DuckDB form of functions.text.lang_id: same marker
    lexicons, same first-at-max-in-sorted-order tie semantics."""
    from nagios_custom_etl_spark.functions.text import LANG_MARKERS

    score_cols = ",\n             ".join(
        f"length(list_intersect(toks, {[w for w in markers.split()]})) AS s_{lang}"
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    langs = sorted(LANG_MARKERS)
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    winner = " ".join(f"WHEN s_{lang} = gmax THEN '{lang}'" for lang in langs)
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {score_cols}
      FROM (SELECT doc_id, lang,
                   list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
            FROM documents WHERE doc_id % 10 = 0)
    )
    SELECT doc_id, lang,
           CASE WHEN gmax < 1 THEN 'und' {winner} END AS predicted_lang
    FROM (SELECT *, {gmax} AS gmax FROM scored)
    ORDER BY doc_id
    """


@register(
    "x4c_lang_id",
    oracle=_lang_id_oracle(),
    doc="X4 language ID: marker-lexicon hit scoring over distinct tokens, "
    "argmax with deterministic first-in-order ties, 'und' below threshold; "
    "oracle generated from the same lexicons.",
)
def x4c_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select("doc_id", "lang", lang_id("text").alias("predicted_lang")).orderBy("doc_id")


@register(
    "x4d_fingerprint",
    oracle="""
    SELECT source,
           COUNT(DISTINCT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_fingerprints,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="X4 document fingerprinting (normalized sha256) aggregated by source.",
)
def x4d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count_distinct(normalized_fingerprint("text")).alias("n_fingerprints"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X5 — multimodal columns: opaque binary payload + typed metadata.
# The fixture set has no media table, so the payload is derived (text →
# bytes) — the *plumbing* (binary columns, magic sniffing, size metadata)
# is the operator under test; real decode lives in operators/multimodal.py
# behind mapInPandas with a stubbed codec.
# ---------------------------------------------------------------------------


@register(
    "x5_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substring(text, 1, 4) AS magic,
           CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END AS size_class
    FROM documents WHERE doc_id % 50 = 0 ORDER BY doc_id
    """,
    doc="X5 multimodal plumbing: opaque binary payload column + typed "
    "metadata (byte length, magic prefix, size class) — schema-first, "
    "decode stubbed in operators/multimodal.py.",
)
def x5_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.substring("text", 1, 4).alias("magic"),
        F.when(F.octet_length(payload) > 300, "large").otherwise("small").alias("size_class"),
    ).orderBy("doc_id")


@register(
    "x5b_multimodal_real_decode",
    oracle="""
    -- planted real media: even doc_ids are 24bpp BMPs (decoder reports
    -- pixel dims; checksum = fill * padded_row_size * height), odd are
    -- 16-bit PCM WAVs (decoder reports frames/channels; checksum =
    -- fill * frames * channels * 2). The oracle predicts the decode
    -- output arithmetically from the id — only a decoder that actually
    -- parses the header + content bytes matches it.
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS mime,
           CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16
                ELSE 8 + doc_id % 32 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 8
                ELSE 1 + (doc_id // 2) % 2 END AS height,
           CASE WHEN doc_id % 2 = 0
                THEN (doc_id % 251) * (((3 * (1 + doc_id % 16) + 3) // 4) * 4)
                     * (1 + doc_id % 8)
                ELSE (doc_id % 251) * (8 + doc_id % 32) * (1 + (doc_id // 2) % 2) * 2
           END AS checksum
    FROM documents WHERE doc_id % 10 = 0 OR doc_id % 10 = 1
    ORDER BY media_id
    """,
    doc="X5 REAL media decode end to end: distributed mapInPandas encode of "
    "planted BMP/WAV payloads -> mapInPandas stdlib decode "
    "(operators/multimodal.py: struct-parsed BMP pixel buffer, wave-module "
    "PCM) -> features the SQL oracle predicts from id arithmetic.",
)
def x5b_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.multimodal import extract_features, planted_media

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10 == 0) | (F.col("doc_id") % 10 == 1))
        .select(F.col("doc_id").alias("media_id"))
    )
    feats = extract_features(planted_media(ids), codec="real")
    return feats.select("media_id", "mime", "width", "height", "checksum").orderBy("media_id")


@register(
    "x48_image_resize",
    oracle="""
    -- planted BMPs (w = 1+id%16, h = 1+id%8, every content byte id%251)
    -- nearest-neighbor downscaled to fit max_dim=4: target dims are pure
    -- integer arithmetic (w' = max(1, w*4 // max(w,h)), only shrinking),
    -- resized pixels are all the fill byte with zero row padding, so the
    -- re-decode checksum is fill*3*w'*h'; an un-resized payload keeps the
    -- planted encoding whose padding is also fill (fill*row_size*h).
    -- Only a resize that actually re-encodes a valid BMP the decoder can
    -- re-parse matches this.
    WITH src AS (
      SELECT doc_id,
             1 + doc_id % 16 AS w,
             1 + doc_id % 8 AS h,
             doc_id % 251 AS f,
             greatest(1 + doc_id % 16, 1 + doc_id % 8) AS m
      FROM documents WHERE doc_id % 4 = 0
    )
    SELECT doc_id AS media_id,
           CASE WHEN m <= 4 THEN w ELSE greatest(1, w * 4 // m) END AS width,
           CASE WHEN m <= 4 THEN h ELSE greatest(1, h * 4 // m) END AS height,
           CASE WHEN m <= 4 THEN f * (((3 * w + 3) // 4) * 4) * h
                ELSE f * 3 * greatest(1, w * 4 // m) * greatest(1, h * 4 // m)
           END AS checksum
    FROM src ORDER BY media_id
    """,
    doc="X48 REAL image resize end to end (operators/multimodal.py::"
    "resize_images): planted BMP -> nearest-neighbor downscale to fit "
    "max_dim=4 (mapInPandas, per-row independent, no shuffle) -> stdlib "
    "re-decode; the SQL oracle predicts the post-resize dims and pixel "
    "checksum from id arithmetic, so only a resize that re-encodes a "
    "decoder-valid BMP matches.",
)
def x48_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.multimodal import (
        extract_features,
        planted_media,
        resize_images,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select(F.col("doc_id").alias("media_id"))
    )
    small = resize_images(planted_media(ids), max_dim=4)
    feats = extract_features(small, codec="real")
    return feats.select("media_id", "width", "height", "checksum").orderBy("media_id")


# ---------------------------------------------------------------------------
# X6 — time windows over the events stream table (batch semantics here;
# streaming variants in streaming/ops.py with identical window logic)
# ---------------------------------------------------------------------------


@register(
    "x6_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="X6/ST tumbling 10-minute window aggregate — same window() operator "
    "drives the Structured Streaming variant.",
)
def x6_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.scalar import dsum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 12, 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "x6b_session_window",
    oracle="""
    WITH gapped AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM gapped
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_seq ORDER BY user_id, session_start
    """,
    doc="X6 session windows (30-min gap): session_window() in Spark vs the "
    "classic lag/cumsum sessionization as the oracle — same semantics.",
)
def x6b_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "x7_training_data_pipeline",
    oracle="""
    -- end-to-end LLM training-data curation pass, SQL-oracle form:
    -- quality gate -> lang selection -> exact-dedup keeper -> stats
    WITH fingerprinted AS (
      SELECT doc_id, lang, n_chars,
             length(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
      WHERE lang IN ('en', 'de', 'es', 'fr')
        AND n_chars BETWEEN 100 AND 5000
    ),
    kept AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fingerprinted
      WHERE n_tokens >= 20
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept WHERE rn = 1
    GROUP BY lang ORDER BY lang
    """,
    doc="X1+X4 composite: the 100 TB training-data curation pass — quality "
    "gates (length + token count), language selection, exact dedup with "
    "deterministic keeper, corpus token accounting — one lazy plan, one "
    "shuffle per stage boundary.",
)
def x7_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    gated = d.filter(
        F.col("lang").isin("en", "de", "es", "fr") & F.col("n_chars").between(100, 5000)
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        tokens("text").alias("_toks"),
        normalized_fingerprint("text").alias("fp"),
    )
    with_counts = gated.select(
        "doc_id", "lang", "n_chars", "fp", F.size("_toks").alias("n_tokens")
    ).filter(F.col("n_tokens") >= 20)
    keeper = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
    return (
        with_counts.withColumn("rn", keeper)
        .filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "x4e_tfidf",
    oracle="""
    -- pure-SQL tf-idf with smoothed idf = ln((N+1)/(df+1)) + 1
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents WHERE lang = 'en'
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE lang = 'en')
    SELECT tf.doc_id, tf.term,
           round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf_r
    FROM tf JOIN df USING (term) CROSS JOIN n
    ORDER BY tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) DESC, tf.doc_id, tf.term
    LIMIT 25
    """,
    doc="X4 tf-idf as pure DataFrame ops (term counts + smoothed idf join) "
    "— no ml-lib hashing, so scores are exact and oracle-checkable. "
    "Rounded to 6dp in output to absorb libm ln() last-ulp differences.",
)
def x4e_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.count()  # tiny driver-side scalar, like the oracle's CTE
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(df_, "term").select(
        "doc_id", "term", (F.col("tf") * idf).alias("_tfidf")
    )
    return (
        scored.orderBy(F.desc("_tfidf"), "doc_id", "term")
        .limit(25)
        .select("doc_id", "term", F.round("_tfidf", 6).alias("tfidf_r"))
    )


@register(
    "x6c_znormalized_metric",
    oracle="""
    -- two-pass z-normalization with exact-decimal moments so both engines
    -- see identical doubles: mean = dec-sum/n; var from decimal(30,10)
    -- squared deviations (deterministic double->decimal rounding per row)
    WITH stats AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v,
             COUNT(*) AS n
      FROM events WHERE user_id < 5 GROUP BY user_id
    ),
    sq AS (
      SELECT e.user_id, e.event_id, e.value, s.mean_v, s.n,
             CAST((e.value - s.mean_v) * (e.value - s.mean_v) AS DECIMAL(30,10)) AS dev2
      FROM events e JOIN stats s USING (user_id) WHERE e.user_id < 5
    ),
    var_ AS (
      SELECT user_id, CAST(SUM(dev2) AS DOUBLE) / (MAX(n) - 1) AS var_v
      FROM sq GROUP BY user_id
    )
    SELECT sq.event_id, sq.user_id,
           round((sq.value - sq.mean_v) / sqrt(var_.var_v), 4) AS zscore_r
    FROM sq JOIN var_ USING (user_id)
    WHERE sq.event_id % 7 = 0
    ORDER BY sq.user_id, sq.event_id
    """,
    doc="X6 z-normalized metric values per key (the normalization step of "
    "z-normalized stream-similarity distance) with engine-exact moments.",
)
def x6c_znormalized_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.scalar import dsum

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    stats = ev.groupBy("user_id").agg(
        (dsum("value", 12, 2) / F.count(F.lit(1))).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = ev.join(F.broadcast(stats), "user_id")
    dev2 = ((F.col("value") - F.col("mean_v")) * (F.col("value") - F.col("mean_v"))).cast(
        "decimal(30,10)"
    )
    var_ = (
        joined.groupBy("user_id")
        .agg((F.sum(dev2).cast("double") / (F.max("n") - 1)).alias("var_v"))
    )
    return (
        joined.join(F.broadcast(var_), "user_id")
        .filter(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            "user_id",
            F.round((F.col("value") - F.col("mean_v")) / F.sqrt("var_v"), 4).alias("zscore_r"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "x8_asof_join",
    oracle="""
    -- DuckDB has a native ASOF JOIN; the Spark side composes it from
    -- union + last_value(ignorenulls) over a per-key window (one shuffle)
    SELECT e.event_id, e.user_id,
           strftime(m.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_signup_ts
    FROM (SELECT * FROM events WHERE event_type <> 'signup' AND event_id % 11 = 0) e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') m
      ON e.user_id = m.user_id AND e.ts >= m.ts
    ORDER BY e.event_id
    """,
    doc="J-ext backward as-of join (latest marker at-or-before each event): "
    "union + last_value window composition — one key shuffle, no range "
    "explosion, no per-group pandas. Oracle: DuckDB native ASOF JOIN.",
)
def x8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.joins import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter((F.col("event_type") != "signup") & (F.col("event_id") % 11 == 0)).select(
        "event_id", "user_id", "ts"
    )
    markers = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("marker_ts")
    )
    joined = asof_join_backward(
        left, markers, ["user_id"], "ts", "marker_ts", ["marker_ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("marker_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_signup_ts"),
    ).orderBy("event_id")


def _skew_join_agg(spark: SparkSession, sf_dir: str, plant_hot_key: bool) -> DataFrame:
    """Shared body for the skew twins: events joined to a sub-broadcast-
    threshold customer dim through salted_join with a forced shuffle join
    (the 100 TB shape — a dim that needs salting is one too big to
    broadcast). ``plant_hot_key`` remaps 20% of events (event_id % 5 = 0)
    onto one user so a single key carries 20% of the join input; salting
    spreads it over 16 shuffle buckets, so the skewed run must land
    within ~the unskewed twin's time instead of pinning one reducer."""
    from nagios_custom_etl_spark.functions.scalar import dsum
    from nagios_custom_etl_spark.operators.joins import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    uid = (
        F.when(F.col("event_id") % 5 == 0, F.lit(7)).otherwise(F.col("user_id"))
        if plant_hot_key
        else F.col("user_id")
    )
    skewed = ev.select("event_id", uid.cast("bigint").alias("uid"), "value")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 1500)
        .select(F.col("c_custkey").cast("bigint").alias("uid"), "c_mktsegment")
    )
    joined = salted_join(
        skewed, dim, "uid", "inner", salt_buckets=16, force_shuffle_join=True
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("uid").alias("n_users"),
            dsum("value", 12, 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


_SKEW_ORACLE = """
    WITH mapped AS (
      SELECT event_id,
             CASE WHEN {hot} AND event_id % 5 = 0 THEN 7 ELSE user_id END AS uid,
             value
      FROM events
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT m.uid) AS n_users,
           CAST(SUM(CAST(m.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM mapped m JOIN customer c ON m.uid = c.c_custkey
    WHERE c.c_custkey < 1500
    GROUP BY 1 ORDER BY 1
"""


@register(
    "x50_skewed_join_salted",
    oracle=_SKEW_ORACLE.format(hot="TRUE"),
    doc="X50 skew-hardened join under a PLANTED HOT KEY (20% of events on "
    "one user): operators/joins.py::salted_join spreads the hot key over "
    "16 salt buckets — exchange partitioning is (uid, _salt), so no "
    "single reducer owns the hot key — through a forced sort-merge join "
    "(the non-broadcastable-dim regime where skew actually bites). "
    "Salting must not change semantics: the oracle is the PLAIN join. "
    "Benchmarked against its unskewed twin (x50b) — within 2x is the "
    "VERDICT r4 task-6 gate.",
)
def x50_skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _skew_join_agg(spark, sf_dir, plant_hot_key=True)


@register(
    "x50b_uniform_join_salted",
    oracle=_SKEW_ORACLE.format(hot="FALSE"),
    doc="X50b the unskewed twin of x50: identical plan on the natural "
    "(uniform) user_id distribution — the baseline that makes the "
    "skewed entry's bench number interpretable.",
)
def x50b_uniform_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _skew_join_agg(spark, sf_dir, plant_hot_key=False)


@register(
    "x6d_sliding_window",
    oracle="""
    -- sliding windows (width 10m, slide 5m): each event belongs to exactly
    -- two windows — its 5m bucket and the one 5m earlier
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type, value
      FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM assigned GROUP BY w_start, event_type ORDER BY 1, 2
    """,
    doc="X6/ST sliding windows (10m width, 5m slide): Spark's window() "
    "replicates each row into width/slide windows; oracle assigns the "
    "same two buckets explicitly.",
)
def x6d_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.scalar import dsum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 12, 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# shared by x3e (batched serving) and st13 (the same exact top-k through
# the streaming serving loop): one oracle, two execution paths
X3E_TOPK_ORACLE = """
    -- per-query exact top-3 neighbors for a small query set
    SELECT query_id, nbr_id, rank
    FROM (
      SELECT q.vec_id AS query_id, v.vec_id AS nbr_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(v.embedding::DOUBLE[],
                                               q.embedding::DOUBLE[]) DESC,
                        v.vec_id
             ) AS rank
      FROM embeddings v
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """


@register(
    "x3e_topk_per_query",
    oracle=X3E_TOPK_ORACLE,
    doc="X3 batched ANN serving shape: exact top-k for every query row via "
    "broadcast(queries) x vectors + per-query window — ranks only in the "
    "output (engine-identical), similarities validated in tests.",
)
def x3e_topk_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import cosine_topk_join

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5)
    out = cosine_topk_join(em, queries, "embedding", "vec_id", "embedding", "vec_id", k=3)
    return out.select("query_id", "nbr_id", "rank").orderBy("query_id", "rank")


@register(
    "x9_robust_zscore_pandas",
    oracle="""
    -- grouped-map pandas parity: median/MAD in SQL (quantile_cont matches
    -- pandas' linear-interpolated median)
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med_v
      FROM events WHERE user_id < 4 GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id, quantile_cont(abs(e.value - m.med_v), 0.5) AS mad_v
      FROM events e JOIN med m USING (user_id) WHERE e.user_id < 4
      GROUP BY e.user_id
    )
    SELECT e.user_id, e.event_id,
           round((e.value - m.med_v) / (1.4826 * d.mad_v), 6) AS robust_z_r
    FROM events e JOIN med m USING (user_id) JOIN mad d USING (user_id)
    WHERE e.user_id < 4 AND d.mad_v > 0 AND e.event_id % 9 = 0
    ORDER BY e.user_id, e.event_id
    """,
    doc="§2.11 escape hatch: applyInPandas grouped-map robust z-score "
    "(median/MAD per key) — the sanctioned slow path, oracle-checked "
    "against the SQL rank-statistics equivalent.",
)
def x9_robust_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.pandas_ops import robust_zscore

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 4)
    out = robust_zscore(ev, "user_id", "value")
    return (
        out.filter(F.col("robust_z").isNotNull() & (F.col("event_id") % 9 == 0))
        .select("user_id", "event_id", F.round("robust_z", 6).alias("robust_z_r"))
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# X10 — deterministic sampling / splitting (training-data curation).
# Randomness is md5 over the stable doc id, so the *sampling decisions
# themselves* are oracle-checked: DuckDB computes the identical digest.
# ---------------------------------------------------------------------------

from nagios_custom_etl_spark.operators.sampling import (  # noqa: E402
    fraction_to_hex_threshold,
    hash_sample,
    hash_split,
    pack_documents,
    packing_efficiency,
    stratified_sample,
)

_T80 = fraction_to_hex_threshold(0.8)
_T90 = fraction_to_hex_threshold(0.9)
_T10 = fraction_to_hex_threshold(0.1)


@register(
    "x10_train_val_split",
    oracle=f"""
    SELECT split, lang, COUNT(*) AS n_docs
    FROM (
      SELECT lang,
             CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < '{_T80}' THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < '{_T90}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="X10 deterministic train/val/test split (80/10/10) by md5 bucket "
    "on doc_id — map-only, partition-layout-independent; per-(split,lang) "
    "counts. The bucket assignment is bit-identical in the oracle.",
)
def x10_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "x10b_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strata'), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 40
    ORDER BY lang, doc_id
    """,
    doc="X10 exact-count stratified sample: 40 docs per language, chosen "
    "by hash order (uniform without replacement, reproducible across "
    "cluster layouts — unlike sampleBy). One shuffle on the stratum key.",
)
def x10b_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, ["lang"], 40, "doc_id")
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


@register(
    "x10c_hash_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR) || ':sample') < '{_T10}'
    ORDER BY doc_id
    """,
    doc="X10 deterministic Bernoulli(0.1) sample — map-only filter, no "
    "shuffle; kept ids are stable under reruns and cluster resizes.",
)
def x10c_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.1).select("doc_id", "source").orderBy("doc_id")


# ---------------------------------------------------------------------------
# X11 — sequence packing (greedy token-bin packing per source shard).
# The running fill is sequential state -> applyInPandas group map; the
# packing itself is rows-only here and invariance-tested in tests/.
# ---------------------------------------------------------------------------


@register(
    "x11_doc_packing",
    oracle=None,  # sequential-state group map; capacity/determinism in tests
    doc="X11 greedy sequence packing: fill 512-token bins per source in "
    "doc_id order via applyInPandas (SURVEY §2.11 escape hatch — the fill "
    "is inherently sequential state). Bins never exceed capacity unless a "
    "single doc does.",
)
def x11_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents").withColumn("n_tok", token_count("text"))
    return pack_documents(d, "source", "doc_id", "n_tok", capacity=512).orderBy(
        "source", "doc_id"
    )


@register(
    "x11b_packing_efficiency",
    oracle=None,  # derived from the rows-only packing
    doc="X11 packing stats per source: bins used, mean fill ratio, wasted "
    "tokens at capacity 512.",
)
def x11b_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents").withColumn("n_tok", token_count("text"))
    packed = pack_documents(d, "source", "doc_id", "n_tok", capacity=512)
    return (
        packing_efficiency(packed, "source", 512)
        .select(
            "source",
            "n_bins",
            F.round("mean_fill_ratio", 6).alias("mean_fill_ratio_r"),
            "wasted_tokens",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X4 (cont.) — PII-style redaction: regex scrub with oracle parity. The
# fixture text has no PII, so a synthetic email column derived from the
# row exercises the scrub end-to-end.
# ---------------------------------------------------------------------------


@register(
    "x4f_redact",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-0100 re: ' ||
             substr(text, 1, 40),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS pass1,
           regexp_replace(
             regexp_replace(
               'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-0100 re: ' ||
               substr(text, 1, 40),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g') AS redacted
    FROM documents WHERE doc_id % 7 = 0
    ORDER BY doc_id
    """,
    doc="X4 PII redaction: email + phone regex scrub (regexp_replace is "
    "codegen'd, replace-all in both engines; patterns restricted to "
    "RE2/Java-common syntax).",
)
def x4f_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    synth = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-0100 re: "),
        F.substring("text", 1, 40),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
    pass1 = F.regexp_replace(synth, email_re, "<EMAIL>")
    return d.select(
        "doc_id",
        pass1.alias("pass1"),
        F.regexp_replace(pass1, phone_re, "<PHONE>").alias("redacted"),
    ).orderBy("doc_id")


@register(
    "x10d_mixture_rebalance",
    oracle="""
    -- replicate mixture_rebalance end-to-end: per-stratum keep-fraction
    -- from the CURRENT counts (n_total = min(count/weight); frac =
    -- min(1, weight*n_total/count) — every step in DOUBLE, matching the
    -- driver's float arithmetic bit-for-bit), then the md5 keep
    -- decision per doc. The hex threshold is format(int(f * 2**64),
    -- '016x') + 16 zeros; md5 < threshold over 32 hex chars is
    -- equivalent and reproduced verbatim. Weights MUST be CAST to
    -- DOUBLE (bare literals parse as DECIMAL and drift).
    WITH w(lang, wt) AS (
      VALUES ('en', CAST(0.4 AS DOUBLE)), ('fr', CAST(0.3 AS DOUBLE)),
             ('de', CAST(0.3 AS DOUBLE))
    ),
    c AS (
      SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n, ANY_VALUE(w.wt) AS wt
      FROM documents d JOIN w ON d.lang = w.lang GROUP BY d.lang
    ),
    ntot AS (SELECT MIN(CAST(n AS DOUBLE) / wt) AS n_total FROM c),
    fr AS (
      SELECT lang, least(CAST(1.0 AS DOUBLE), (wt * n_total) / CAST(n AS DOUBLE)) AS f
      FROM c, ntot
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN fr ON d.lang = fr.lang
    WHERE fr.f >= 1.0
       OR md5(CAST(d.doc_id AS VARCHAR) || ':mixture') <
          lower(lpad(hex(CAST(trunc(fr.f * power(CAST(2 AS DOUBLE), 64)) AS HUGEINT)),
                     16, '0')) || '0000000000000000'
    ORDER BY d.doc_id
    """,
    doc="X10 data-mixture rebalance: downsample languages to a 40/30/30 "
    "en/fr/de target via per-stratum md5 keep-fractions — metadata count "
    "pass + map-only filter, deterministic across layouts. Oracle-exact "
    "since r7: the keep-fraction derivation AND each per-doc md5 "
    "decision are replicated in DuckDB (double arithmetic matches the "
    "driver's float path bit-for-bit), so the FULL rebalanced id set "
    "hash-checks, not just its counts.",
)
def x10d_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sampling import mixture_rebalance

    d = load_table(spark, sf_dir, "documents")
    out = mixture_rebalance(d, "lang", "doc_id", {"en": 0.4, "fr": 0.3, "de": 0.3})
    return out.select("doc_id", "lang").orderBy("doc_id")


# ---------------------------------------------------------------------------
# X12 — range (interval) join without an equi key. Spark's native plan for
# point-in-interval is BroadcastNestedLoopJoin — O(|L|*|R|); the bucketed
# rewrite is a hash join (see operators/joins.py::bucketed_range_join).
# ---------------------------------------------------------------------------


@register(
    "x12_range_join",
    oracle="""
    SELECT p.event_id, COUNT(*) AS n_nearby_errors
    FROM (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT CAST(floor(epoch(ts)) AS BIGINT) - 600 AS lo,
                 CAST(floor(epoch(ts)) AS BIGINT) + 600 AS hi
          FROM events WHERE event_type = 'error') e
      ON p.ts_s BETWEEN e.lo AND e.hi
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
    doc="X12 bucketed range join: purchases within ±10min of any error "
    "event (no equi key). Interval explode over 20-min buckets turns the "
    "nested-loop into an equi hash join; exact predicate re-applied as "
    "residual.",
)
def x12_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.joins import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        (F.unix_timestamp("ts") - 600).alias("lo"),
        (F.unix_timestamp("ts") + 600).alias("hi"),
    )
    joined = bucketed_range_join(purchases, errors, "ts_s", "lo", "hi", bucket_width=1200)
    return (
        joined.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_nearby_errors"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# X13 — near-dup CLUSTERS: connected components over the exact-Jaccard pair
# set, keep-best survivor per cluster. Pairs under-delete (transitive
# near-dups); clusters are what a production dedup actually drops against.
# ---------------------------------------------------------------------------


@register(
    "x13_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON shared.id_a = sa.doc_id
      JOIN sizes sb ON shared.id_b = sb.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
            >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    ranked AS (
      SELECT component, node,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY d.n_chars DESC, node) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS n_members
      FROM comp JOIN documents d ON comp.node = d.doc_id
    )
    SELECT component, n_members, node AS survivor
    FROM ranked WHERE rn = 1 AND n_members >= 2
    ORDER BY component
    """,
    doc="X13 near-dup clustering: MinHash-LSH candidate pairs with exact-"
    "Jaccard verification (the scale path — candidates from banded "
    "bucket equi-joins, never the full shingle self-join) -> connected "
    "components (min-label propagation, O(diameter) joined rounds with "
    "per-round checkpointing) -> keep-best survivor (max n_chars, tie "
    "min id). Oracle computes the same components from the exact pair "
    "set via a recursive-CTE transitive closure; the LSH verify step "
    "makes the engine's edge set exact-threshold too (pairs below "
    "threshold are discarded, and recall is 1.0 on the fixtures — "
    "asserted equal to the exact inverted-index pairs in tests).",
)
def x13_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import minhash_near_dup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=JACCARD_THRESHOLD, shingle_n=SHINGLE_N
    )
    return near_dup_clusters(d, pairs, "doc_id", "n_chars").orderBy("component")


# ---------------------------------------------------------------------------
# X14 — benchmark decontamination: train docs sharing a 5-gram with the
# held-out test split (the standard pre-training train/test overlap scrub).
# ---------------------------------------------------------------------------


@register(
    "x14_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':split') AS h,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, h, unnest(list_distinct(
               [array_to_string(toks[i : i + 4], ' ')
                FOR i IN range(1, greatest(length(toks) - 4, 1) + 1)])) AS shingle
      FROM toks
    ),
    train_sh AS (SELECT doc_id, shingle FROM sh WHERE h < '{_T80}'),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE h >= '{_T90}')
    SELECT doc_id, COUNT(*) AS n_shared_shingles
    FROM train_sh JOIN eval_sh USING (shingle)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="X14 decontamination: flag train-split docs sharing any distinct "
    "word 5-gram with the test split (splits from the deterministic md5 "
    "bucket of x10). Eval shingle set broadcasts at scale; scrub is "
    "map-side against the training scan.",
)
def x14_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    split = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    train = split.filter(F.col("split") == "train")
    evalset = split.filter(F.col("split") == "test")
    return decontaminate(train, evalset, "doc_id", "text", shingle_n=5).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X15 — repetition metrics (Gopher-style quality signals).
# ---------------------------------------------------------------------------


@register(
    "x15_repetition_metrics",
    oracle="""
    WITH toks AS (
      SELECT doc_id, n_chars,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id % 5 = 0
    ),
    g2 AS (
      SELECT doc_id, shingle, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(
               [array_to_string(toks[i : i + 1], ' ')
                FOR i IN range(1, greatest(length(toks) - 1, 1) + 1)]) AS shingle
            FROM toks)
      GROUP BY doc_id, shingle
    ),
    top2 AS (
      SELECT doc_id, cnt * length(shingle) AS top2_chars,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, shingle) AS rn
      FROM g2
    ),
    g3 AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt > 1 THEN cnt * length(shingle) ELSE 0 END) AS dup3_chars
      FROM (SELECT doc_id, shingle, COUNT(*) AS cnt
            FROM (SELECT doc_id, unnest(
                     [array_to_string(toks[i : i + 2], ' ')
                      FOR i IN range(1, greatest(length(toks) - 2, 1) + 1)]) AS shingle
                  FROM toks)
            GROUP BY doc_id, shingle)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(p.top2_chars, 0) AS DOUBLE) / t.n_chars AS top_2gram_frac,
           CAST(coalesce(g3.dup3_chars, 0) AS DOUBLE) / t.n_chars AS dup_3gram_frac
    FROM toks t
    LEFT JOIN (SELECT doc_id, top2_chars FROM top2 WHERE rn = 1) p USING (doc_id)
    LEFT JOIN g3 USING (doc_id)
    ORDER BY t.doc_id
    """,
    doc="X15 Gopher-style repetition signals: char share of the most "
    "frequent word 2-gram and of duplicated word 3-grams, per doc. "
    "Codegen'd explode + count + window-max; ratios are single IEEE "
    "divisions of exact integers (bit-identical to the oracle).",
)
def x15_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return repetition_metrics(d, "doc_id", "text", "n_chars").orderBy("doc_id")


# ---------------------------------------------------------------------------
# X4 — BPE-ish subword token accounting. Whitespace tokens undercount what
# a trainer pays for; a GPT-style pre-tokenizer regex (letter runs, digit
# runs, single punctuation) is the standard cheap proxy for budgeting
# token counts before running the real tokenizer.
# ---------------------------------------------------------------------------

_BPE_ISH = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "x4g_bpe_token_budget",
    oracle=f"""
    SELECT doc_id,
           length(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws_tokens,
           length(regexp_extract_all(lower(text), '{_BPE_ISH}')) AS n_bpe_tokens,
           CAST(n_chars AS DOUBLE)
             / greatest(length(regexp_extract_all(lower(text), '{_BPE_ISH}')), 1)
             AS chars_per_bpe_token
    FROM documents
    WHERE doc_id % 10 = 0
    ORDER BY doc_id
    """,
    doc="X4 token budgeting: whitespace vs BPE-ish regex pre-tokenizer "
    "counts and chars-per-token, per doc. The regex uses only literal "
    "classes so Java (Spark) and RE2 (DuckDB) agree.",
)
def x4g_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    bpe = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_ISH), F.lit(0))
    return d.select(
        "doc_id",
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(F.size(bpe), F.lit(1))
        ).alias("chars_per_bpe_token"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X16 — Python UDTF escape hatch (§2.11): lateral row fan-out in Python.
# Demo only — the codegen'd generator form in operators/dedup.py is the hot
# path for the same semantics.
# ---------------------------------------------------------------------------


@register(
    "x16_udtf_bigrams",
    oracle="""
    SELECT doc_id, pos, bigram FROM (
      SELECT doc_id, unnest([{'pos': i - 1, 'bigram': toks[i] || ' ' || toks[i+1]}
                             FOR i IN range(1, length(toks))], recursive := true)
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents WHERE doc_id % 50 = 0))
    ORDER BY doc_id, pos
    """,
    doc="X16 Python UDTF (Spark 4) applied via LATERAL: per-doc bigram "
    "fan-out in imperative Python — the sanctioned escape hatch when "
    "per-row expansion needs a real tokenizer/parser library. Small doc "
    "subset: every emitted byte crosses the JVM<->Python boundary.",
)
def x16_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.udtf_ops import bigrams_via_udtf

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return bigrams_via_udtf(d, "doc_id", "text").orderBy("doc_id", "pos")


# ---------------------------------------------------------------------------
# X13b — semantic dedup (SemDeDup-style): embedding-cosine near-dup pairs
# collapsed into clusters by connected components. Same clustering engine
# as the text path (x13), driven by the vector similarity operator.
# ---------------------------------------------------------------------------


@register(
    "x13b_semantic_dedup_clusters",
    oracle="""
    -- planted geometry (cf. x3b): every vector has exactly one near-dup —
    -- its 0.9-scaled copy at vec_id+1000000 (cosine exactly 1); no organic
    -- pair reaches the 0.85 threshold. Components are therefore exactly
    -- the (v, v+1M) pairs, labeled by their min id.
    SELECT vec_id AS component, CAST(2 AS BIGINT) AS n_members
    FROM embeddings ORDER BY component
    """,
    doc="X13b semantic dedup: sign-LSH cosine near-dup pairs over "
    "embeddings (planted scaled copies) -> connected components -> "
    "per-cluster member counts. The embedding twin of x13's text "
    "clustering.",
)
def x13b_semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.vector import as_double_array
    from nagios_custom_etl_spark.operators.dedup import connected_components

    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("embedding")
    )
    copies = em.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 0.9).alias("embedding"),
    )
    pairs = embedding_near_dup_pairs(
        em.unionByName(copies), "embedding", "vec_id",
        dim=64, threshold=0.85, n_planes=8, n_tables=6,
    ).select("id_a", "id_b")
    return (
        connected_components(pairs)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# X17 — corpus-frequency boilerplate detection (C4-style cleaning signal)
# ---------------------------------------------------------------------------

BOILER_SHINGLE_N = 5
BOILER_MIN_DF = 3


@register(
    "x17_boilerplate_ratio",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {BOILER_SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {BOILER_SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    dfreq AS (SELECT shingle, COUNT(*) AS n_docs FROM shingled GROUP BY shingle),
    boiler AS (SELECT shingle FROM dfreq WHERE n_docs >= {BOILER_MIN_DF})
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(b.shingle) AS n_boiler,
           CAST(COUNT(b.shingle) AS DOUBLE) / COUNT(*) AS boiler_ratio
    FROM shingled s LEFT JOIN boiler b USING (shingle)
    GROUP BY s.doc_id
    """,
    doc="X17 corpus-frequency boilerplate: fraction of each doc's distinct "
    "5-gram shingles that appear in >= 3 documents corpus-wide — the "
    "C4/RefinedWeb repeated-content cleaning signal as one explode + two "
    "aggs + a semi join (operators/dedup.py::boilerplate_stats).",
)
def x17_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import boilerplate_stats

    return boilerplate_stats(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        shingle_n=BOILER_SHINGLE_N,
        min_df=BOILER_MIN_DF,
    )


# ---------------------------------------------------------------------------
# X18 — scalable global row ids (no single-reducer sort)
# ---------------------------------------------------------------------------


@register(
    "x18_global_row_ids",
    oracle="""
    SELECT doc_id, n_chars,
           ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS row_id
    FROM documents
    """,
    doc="X18 global contiguous example ids in a total order without the "
    "single-partition window: range repartition + per-partition "
    "row_number + driver-cumulated offsets (operators/ids.py) — the "
    "zipWithIndex scheme, DataFrame-native, identical numbering to "
    "ROW_NUMBER() OVER (ORDER BY ...).",
)
def x18_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.ids import global_row_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return global_row_ids(docs, [F.col("n_chars").desc(), F.col("doc_id")])


# ---------------------------------------------------------------------------
# X19 — learned document classifier (pyspark.ml pipeline, fastText-style)
# ---------------------------------------------------------------------------


@register(
    "x19_quality_classifier",
    oracle=None,  # model scores are not SQL-expressible; accuracy bounds
    # and planted-separability are tested in tests/test_ml.py
    doc="X19 learned doc classifier (weak-label distillation): "
    "RegexTokenizer->HashingTF->IDF->LogisticRegression (operators/ml.py) "
    "trained on a deterministic hash-split against a topic-seed weak "
    "label (doc mentions 'spark' — the keyword-seeded bootstrap used for "
    "domain/quality filters); returns the holdout confusion matrix. All "
    "stages JVM-side and deterministic (murmur3 features, zero-init "
    "L-BFGS); scoring is map-only with the coefficient vector broadcast.",
)
def x19_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.ml import score_documents, train_text_classifier
    from nagios_custom_etl_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "label", F.array_contains(tokens("text"), "spark").cast("double")
    )
    split = hash_split(docs, "doc_id", {"train": 0.8, "holdout": 0.2})
    train = split.filter(F.col("split") == "train")
    holdout = split.filter(F.col("split") == "holdout")
    # 12 L-BFGS iterations converge on the keyword-separable objective
    # (verified: identical confusion matrix to maxIter=20 on the
    # fixtures) — each extra iteration is a full treeAggregate pass
    model = train_text_classifier(train, "text", "label", max_iter=12)
    scored = score_documents(model, holdout, "doc_id", "text")
    return (
        scored.join(holdout.select("doc_id", "label"), "doc_id")
        .groupBy(F.col("label").cast("int").alias("label"), "prediction")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )


# ---------------------------------------------------------------------------
# X20 — mergeable-sketch aggregates (DataSketches: HLL / KLL / Theta)
# ---------------------------------------------------------------------------


@register(
    "x20_sketch_rollup",
    oracle="""
    -- DuckDB has no DataSketches build, but the sketch CONTRACT is
    -- SQL-predictable (the a3/a8 pattern): exact per-lang + overall
    -- anchors, with flags asserting the HLL estimate within 10% of the
    -- exact distinct count and both KLL quantiles within 10% relative
    -- of the exact interpolated quantiles. The '__all__' row's flags
    -- verify the MERGED sketches (hll_union_agg / kll_sketch_merge)
    -- against the overall exacts — sketch reaggregation itself is
    -- hash-checked.
    WITH toks AS (
      SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    per AS (
      SELECT d.lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             quantile_cont(d.n_chars, 0.5) AS p50_chars,
             quantile_cont(d.n_chars, 0.95) AS p95_chars
      FROM documents d GROUP BY d.lang
    ),
    dt AS (SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_tokens
           FROM toks GROUP BY lang),
    overall AS (
      SELECT '__all__' AS lang,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
             (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM toks) AS distinct_tokens,
             (SELECT quantile_cont(n_chars, 0.5) FROM documents) AS p50_chars,
             (SELECT quantile_cont(n_chars, 0.95) FROM documents) AS p95_chars
    )
    SELECT lang, n_docs, distinct_tokens, p50_chars, p95_chars,
           TRUE AS hll_within, TRUE AS kll_within
    FROM (SELECT p.lang, p.n_docs, dt.distinct_tokens, p.p50_chars, p.p95_chars
          FROM per p JOIN dt USING (lang)
          UNION ALL SELECT * FROM overall)
    ORDER BY lang
    """,
    doc="X20 mergeable-sketch corpus profile: per-lang HLL distinct-token "
    "estimate + KLL length quantiles, with the '__all__' row re-"
    "aggregated FROM THE SKETCHES (hll_union_agg / kll_sketch_merge) — "
    "the kilobyte-state, reaggregatable rollup that replaces exact "
    "COUNT(DISTINCT)/percentile at 100 TB (operators/sketches.py). "
    "Emits exact anchors + within-bound flags over the estimates so the "
    "sketch contract (including merge correctness on '__all__') is "
    "oracle-hash-checked.",
)
def x20_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import vocab_sketch_rollup

    d = load_table(spark, sf_dir, "documents")
    est = vocab_sketch_rollup(d)
    toks = d.select(
        "lang", F.explode(F.split("text", r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("n_chars", 0.5).alias("p50_chars"),
        F.percentile("n_chars", 0.95).alias("p95_chars"),
    )
    dt = toks.groupBy("lang").agg(F.count_distinct("tok").alias("distinct_tokens"))
    exact_per = per.join(dt, "lang")
    exact_all = (
        d.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.percentile("n_chars", 0.5).alias("p50_chars"),
            F.percentile("n_chars", 0.95).alias("p95_chars"),
        )
        .crossJoin(toks.agg(F.count_distinct("tok").alias("distinct_tokens")))
        .withColumn("lang", F.lit("__all__"))
    )
    exact = exact_per.unionByName(exact_all.select(*exact_per.columns))
    rel = lambda est_c, ex_c: F.abs(est_c - ex_c) / F.greatest(ex_c, F.lit(1e-9))  # noqa: E731
    return (
        exact.join(est.select(
            "lang",
            F.col("distinct_tokens_est"),
            F.col("p50_chars").alias("_kp50"),
            F.col("p95_chars").alias("_kp95"),
        ), "lang")
        .select(
            "lang",
            "n_docs",
            "distinct_tokens",
            "p50_chars",
            "p95_chars",
            (rel(F.col("distinct_tokens_est"), F.col("distinct_tokens")) <= 0.1).alias(
                "hll_within"
            ),
            (
                (rel(F.col("_kp50"), F.col("p50_chars")) <= 0.1)
                & (rel(F.col("_kp95"), F.col("p95_chars")) <= 0.1)
            ).alias("kll_within"),
        )
        .orderBy("lang")
    )


@register(
    "x20b_theta_overlap",
    oracle="""
    -- theta estimates are implementation-specific, but exact set algebra
    -- is not: anchors are the exact distinct-token set sizes and exact
    -- Jaccard; the flag asserts every theta estimate (|A|, |B|, |A∩B|,
    -- |A\\B|, jaccard) within 10% of its exact value.
    WITH toks AS (
      SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents WHERE lang IN ('en', 'fr')
    ),
    a AS (SELECT DISTINCT tok FROM toks WHERE lang = 'en'),
    b AS (SELECT DISTINCT tok FROM toks WHERE lang = 'fr'),
    sizes AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM a WHERE tok IN (SELECT tok FROM b)) AS n_common
    )
    SELECT 'en' AS lang_a, 'fr' AS lang_b,
           n_a, n_b, n_common,
           n_a - n_common AS n_only_a,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard,
           TRUE AS theta_within
    FROM sizes
    """,
    doc="X20 theta-sketch set algebra: estimated |A|, |B|, |A n B|, "
    "|A \\ B| and Jaccard between the en and fr token sets — distinct-set "
    "intersection without shuffling distinct values "
    "(operators/sketches.py::vocab_overlap_theta). Emits the exact set "
    "sizes + a within-10% flag over every theta estimate, so the sketch "
    "algebra contract is oracle-hash-checked.",
)
def x20b_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import vocab_overlap_theta

    d = load_table(spark, sf_dir, "documents")
    est = vocab_overlap_theta(d, "en", "fr")
    toks = (
        d.filter(F.col("lang").isin("en", "fr"))
        .select("lang", F.explode(F.split("text", r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    a = toks.filter(F.col("lang") == "en").select("tok").distinct()
    b = toks.filter(F.col("lang") == "fr").select("tok").distinct()
    exact = (
        a.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(
            a.join(b, "tok", "left_semi").agg(F.count(F.lit(1)).alias("n_common"))
        )
    )
    rel = lambda est_c, ex_c: F.abs(est_c - ex_c) / F.greatest(ex_c, F.lit(1e-9))  # noqa: E731
    return exact.crossJoin(
        est.select("n_a_est", "n_b_est", "n_common_est", "n_only_a_est", "jaccard_est")
    ).select(
        F.lit("en").alias("lang_a"),
        F.lit("fr").alias("lang_b"),
        "n_a",
        "n_b",
        "n_common",
        (F.col("n_a") - F.col("n_common")).alias("n_only_a"),
        (F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias(
            "jaccard"
        ),
        (
            (rel(F.col("n_a_est"), F.col("n_a")) <= 0.1)
            & (rel(F.col("n_b_est"), F.col("n_b")) <= 0.1)
            & (rel(F.col("n_common_est"), F.col("n_common")) <= 0.1)
            & (rel(F.col("n_only_a_est"), F.col("n_a") - F.col("n_common")) <= 0.1)
            & (
                rel(
                    F.col("jaccard_est"),
                    F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                )
                <= 0.1
            )
        ).alias("theta_within"),
    )


# ---------------------------------------------------------------------------
# X21 — per-domain document caps (pretraining domain balancing)
# ---------------------------------------------------------------------------

DOMAIN_CAP = 20


@register(
    "x21_domain_cap",
    oracle=f"""
    -- keep the {DOMAIN_CAP} longest docs per source (ties by doc_id),
    -- the domain-balancing cap applied before mixture weighting
    SELECT source, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn <= {DOMAIN_CAP}
    ORDER BY source, doc_id
    """,
    doc="X21 per-domain cap: at most N docs per source, best-first "
    "(n_chars desc, id tiebreak) — one shuffle on the domain key, local "
    "per-key sort; at 100 TB hot domains are exactly the AQE-skew case "
    "and the cap prunes them before any downstream join.",
)
def x21_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .drop("rn")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# X22 — token-count histogram (corpus length distribution)
# ---------------------------------------------------------------------------

HIST_BUCKET_TOKENS = 10


@register(
    "x22_token_histogram",
    oracle=f"""
    SELECT CAST(floor(len(list_filter(string_split(text, ' '), t -> t <> ''))
                      / {HIST_BUCKET_TOKENS}) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS min_tokens,
           CAST(MAX(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    doc="X22 corpus length histogram: fixed-width token-count buckets — "
    "map-only bucket assignment + one agg; the standard pre-training "
    "length-distribution audit (token budgeting, truncation planning).",
)
def x22_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents")
    n = token_count("text")
    return (
        d.select(F.floor(n / HIST_BUCKET_TOKENS).cast("bigint").alias("bucket"), n.alias("_n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_n").cast("bigint").alias("min_tokens"),
            F.max("_n").cast("bigint").alias("max_tokens"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# X23 — dynamic pivot (groupBy().pivot(): long -> wide without per-column
# select lists; the relational twin of T2's positional array unpack)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "x23_dynamic_pivot",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="X23 dynamic pivot: groupBy().pivot(col, values) with the value "
    "list declared — one shuffle, map-side partial agg per (key, pivot "
    "value); declaring values skips the extra distinct-scan pass Spark "
    "otherwise runs to discover columns (the required form at 100 TB).",
)
def x23_dynamic_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X4h — BM25 ranked retrieval (Okapi, fixed query terms)
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "join", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack 2009)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for BM25_TERMS over english documents — shared by
    x4h (ranked retrieval) and x58 (hybrid fusion's lexical leg)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    row = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = row["n"], row["avgdl"]  # tiny driver scalars (oracle CTE twin)
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )


@register(
    "x4h_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents WHERE lang = 'en'
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('spark', 'join', 'window') GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25_r
    FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """,
    doc="X4 BM25 ranked retrieval (Okapi k1=1.2 b=0.75) for a literal "
    "query-term set: tf per (doc, term), df per term (broadcast — the "
    "query vocabulary is tiny), doc-length normalization against the "
    "corpus average; top-k via TakeOrderedAndProject.",
)
def x4h_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
        .select("doc_id", F.round("score", 6).alias("bm25_r"))
    )


@register(
    "x58_hybrid_rrf_retrieval",
    oracle=f"""
    -- hybrid retrieval: the lexical leg (BM25 over documents, x4h's
    -- exact formula) and the vector leg (cosine to vec 0's embedding)
    -- each produce a top-20 ranking; reciprocal-rank fusion combines
    -- them: rrf(id) = Σ_legs 1/({RRF_K} + rank_leg). Ranks use round-6
    -- scores with id tiebreaks (cross-engine score parity at 6dp is the
    -- proven convention — x4h/x3 hash-green), and 1/(k+rank) sums are
    -- bit-identical IEEE arithmetic, so the fused list hash-checks.
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents WHERE lang = 'en'
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('spark', 'join', 'window') GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT * FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id) AS lrank
        FROM scored
      ) WHERE lrank <= 20
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    vec AS (
      SELECT * FROM (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 ORDER BY round(list_cosine_similarity(embedding::DOUBLE[], qv), 6)
                          DESC, vec_id
               ) AS vrank
        FROM embeddings, q
      ) WHERE vrank <= 20
    )
    SELECT COALESCE(l.doc_id, v.doc_id) AS id,
           round(COALESCE(1.0 / ({RRF_K} + l.lrank), 0)
                 + COALESCE(1.0 / ({RRF_K} + v.vrank), 0), 9) AS rrf_r
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY COALESCE(1.0 / ({RRF_K} + l.lrank), 0)
             + COALESCE(1.0 / ({RRF_K} + v.vrank), 0) DESC,
             COALESCE(l.doc_id, v.doc_id)
    LIMIT 15
    """,
    doc="X58 hybrid retrieval with reciprocal-rank fusion: the lexical "
    "(BM25, shared with x4h via _bm25_scored) and vector (brute-force "
    "cosine) legs each rank their top 20, fused by "
    "rrf = Σ 1/(k + rank) with k=60 — the standard score-free fusion "
    "for combining keyword and embedding retrieval in training-data "
    "curation. Each leg's rank window sits above its own bounded "
    "candidate set (top-20), so the fusion join is trivially "
    "broadcast-sized at any corpus scale; ranks use round-6 scores with "
    "id tiebreaks so both engines agree deterministically.",
)
def x58_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from nagios_custom_etl_spark.functions.vector import cosine

    em = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    # single-partition rank windows are fine HERE because each input is
    # already a bounded candidate set (scored terms / one cosine scan
    # feeding a top-20) — at scale the candidate generator bounds them
    lex = (
        _bm25_scored(spark, sf_dir)
        .withColumn(
            "lrank",
            F.row_number().over(W.orderBy(F.round("score", 6).desc(), "doc_id")),
        )
        .filter(F.col("lrank") <= 20)
        .select("doc_id", "lrank")
    )
    vec = (
        em.select(
            F.col("vec_id").alias("doc_id"),
            cosine("embedding", F.lit(qvec).cast("array<double>")).alias("_cos"),
        )
        .withColumn(
            "vrank",
            F.row_number().over(W.orderBy(F.round("_cos", 6).desc(), "doc_id")),
        )
        .filter(F.col("vrank") <= 20)
        .select("doc_id", "vrank")
    )
    rrf = F.coalesce(1.0 / (RRF_K + F.col("lrank")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("vrank")), F.lit(0.0)
    )
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(F.col("doc_id").alias("id"), rrf.alias("_rrf"))
        .orderBy(F.desc("_rrf"), "id")
        .limit(15)
        .select("id", F.round("_rrf", 9).alias("rrf_r"))
    )


# ---------------------------------------------------------------------------
# X4i — bigram-LM fluency scoring (CCNet-style perplexity quality signal)
# ---------------------------------------------------------------------------


@register(
    "x4i_bigram_lm_score",
    oracle="""
    -- add-one-smoothed bigram LM trained on the corpus, scoring each doc
    -- by mean log P(w2|w1); least-fluent (most surprising) 20 docs.
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2
      FROM (
        SELECT doc_id,
               unnest([{'w1': ts[i], 'w2': ts[i+1]} FOR i IN range(1, len(ts))]) AS bg
        FROM toks WHERE len(ts) >= 2
      )
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
    c1 AS (SELECT t AS w1, COUNT(*) AS c1
           FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT t) AS v
          FROM (SELECT unnest(ts) AS t FROM toks)),
    scored AS (
      SELECT p.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             AVG(ln((c12.c12 + 1.0) / (c1.c1 + v.v))) AS lp
      FROM pairs p JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY p.doc_id
    )
    SELECT doc_id, n_bigrams, round(lp, 6) AS avg_logp_r
    FROM scored ORDER BY lp, doc_id LIMIT 20
    """,
    doc="X4 bigram-LM fluency scoring: train add-one-smoothed bigram "
    "probabilities on the corpus (one agg on the bigram key), score every "
    "doc by mean log-likelihood (join back on the SAME bigram "
    "co-partitioning — exchange reused, unigram/vocab side broadcast) — "
    "the CCNet/KenLM perplexity-filter shape with the model expressed "
    "relationally instead of as an external artifact.",
)
def x4i_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks_arr = d.select("doc_id", tokens("text").alias("ts"))
    sz = F.size("ts")
    pairs = (
        toks_arr.filter(sz >= 2)
        .select(
            "doc_id",
            F.posexplode(F.arrays_zip(F.slice("ts", 1, sz - 1), F.slice("ts", 2, sz - 1))).alias(
                "_p", "_z"
            ),
        )
        .select("doc_id", F.col("_z.0").alias("w1"), F.col("_z.1").alias("w2"))
    )
    # pairs feeds both the bigram-count aggregation and the scoring join —
    # uncached, the tokenize+explode subtree executes twice (the project-notes
    # both-sides rule). At 100 TB persist to a checkpointed table instead.
    pairs = cache_once(pairs)
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    all_toks = toks_arr.select(F.explode("ts").alias("t"))
    c1 = all_toks.groupBy(F.col("t").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    vocab = all_toks.distinct().count()  # tiny driver scalar (oracle CTE twin)
    logp = F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(vocab)))
    scored = (
        pairs.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.avg(logp).alias("lp"))
    )
    return (
        scored.orderBy("lp", "doc_id")
        .limit(20)
        .select("doc_id", "n_bigrams", F.round("lp", 6).alias("avg_logp_r"))
    )


# ---------------------------------------------------------------------------
# X24 — PCA dimensionality reduction over the embedding column
# ---------------------------------------------------------------------------


@register(
    "x24_embedding_pca",
    oracle="""
    -- planted-basis PCA: coordinates are scaled Rademacher bits of
    -- vec_id over the full 0..255 range (one bit per axis, dyadic
    -- scales 8,4,2,...), so the sample covariance is EXACTLY diagonal
    -- (mean 0 and all cross-products cancel in exact dyadic fp
    -- arithmetic) and the eigenbasis is the coordinate axes in closed
    -- form. The Spark side runs the REAL pyspark.ml PCA (distributed
    -- Gramian + driver eigensolve + map-side projection) and
    -- normalizes each component's sign against the vec_id=0 row, so
    -- the projected coordinates are bit-identical to this closed form.
    SELECT vec_id,
           CAST(8 * (2 * ((vec_id >> 0) & 1) - 1) AS DOUBLE) AS pc1,
           CAST(4 * (2 * ((vec_id >> 1) & 1) - 1) AS DOUBLE) AS pc2,
           CAST(2 * (2 * ((vec_id >> 2) & 1) - 1) AS DOUBLE) AS pc3
    FROM embeddings WHERE vec_id < 256 ORDER BY vec_id
    """,
    doc="X24 PCA over the embedding column (pyspark.ml): covariance via "
    "one distributed Gramian pass, eigendecomposition on the driver "
    "(d x d — constant at any corpus size), projection map-only with "
    "the basis broadcast. The standard pre-ANN compression step; "
    "composes with int8 quantization (X3). Oracle-exact via the "
    "planted-basis trick (the x49c pattern in vector space): vectors "
    "are built from Rademacher bits of vec_id with strictly-ordered "
    "dyadic scales, making the eigenbasis closed-form and the whole "
    "fit+transform path hash-checkable; eigenvector sign (the one "
    "implementation-defined degree of freedom) is fixed by a "
    "reference-row convention, collecting k doubles — bounded "
    "metadata. Variance-capture on the REAL embeddings remains "
    "property-tested in tests/test_similarity.py.",
)
def x24_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    n_bits, k = 8, 3
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < (1 << n_bits))
    coords = [
        (
            F.lit(float(2 ** (3 - j)))
            * (F.shiftright(F.col("vec_id").cast("int"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).cast("double")
        for j in range(n_bits)
    ]
    pl = emb.select("vec_id", array_to_vector(F.array(*coords)).alias("_v"))
    model = PCA(k=k, inputCol="_v", outputCol="_pc").fit(pl)
    proj = model.transform(pl).select("vec_id", vector_to_array("_pc").alias("pc"))
    # sign convention: component j points so that the vec_id=0 row
    # (all bits zero -> every planted coordinate negative) projects
    # negative; reading that one row collects k doubles of metadata
    ref = proj.filter(F.col("vec_id") == 0).select("pc").head()[0]
    signs = [-1.0 if v > 0 else 1.0 for v in ref]
    return proj.select(
        "vec_id",
        *[
            (F.element_at("pc", j + 1) * F.lit(signs[j])).alias(f"pc{j + 1}")
            for j in range(k)
        ],
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# X25 — sliding-window document chunking (pre-training max-len windows)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "x25_doc_chunking",
    oracle=f"""
    -- one row per (doc, window): starts at 1, 1+S, 1+2S, ... while <= len
    -- (empty docs emit one empty chunk); chunk identity via md5 so the
    -- compare doesn't ship full chunk text
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents
    )
    SELECT doc_id,
           CAST((start_tok - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           start_tok,
           CAST(len(ts[start_tok : start_tok + {CHUNK_TOKENS} - 1]) AS BIGINT) AS n_tokens,
           md5(array_to_string(ts[start_tok : start_tok + {CHUNK_TOKENS} - 1], ' ')) AS chunk_hash
    FROM (
      SELECT doc_id, ts,
             unnest(range(1, greatest(len(ts), 1) + 1, {CHUNK_STRIDE})) AS start_tok
      FROM toks
    )
    ORDER BY doc_id, chunk_idx
    """,
    doc="X25 sliding-window chunking: split every doc into max-len token "
    "windows with stride overlap (the LLM pre-training chunking step) — "
    "sequence+explode+slice, all codegen'd generators, 1->N fan-out "
    "bounded by ceil(len/stride); chunk identity as md5 so verification "
    "never ships chunk text.",
)
def x25_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks_arr = d.select("doc_id", tokens("text").alias("ts"))
    sz = F.size("ts")
    starts = F.explode(
        F.sequence(F.lit(1), F.greatest(sz, F.lit(1)), F.lit(CHUNK_STRIDE))
    ).alias("start_tok")
    chunk = F.slice("ts", F.col("start_tok"), CHUNK_TOKENS)
    return (
        toks_arr.select("doc_id", "ts", starts)
        .select(
            "doc_id",
            ((F.col("start_tok") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            "start_tok",
            F.size(chunk).cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# X26–X33 — corpus curation reports: the queries a 100 TB training-data
# pipeline runs between ingestion and training (per-domain accounting,
# curriculum bucketing, quantization QA, containment dedup, novelty,
# dedup funnel). All single-digit shuffles on uniform keys.
# ---------------------------------------------------------------------------


@register(
    "x26_domain_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(length(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="X26 per-domain corpus accounting (docs, languages, token mass, "
    "mean length) — the report that drives domain caps/mixtures. One "
    "map-side-combined groupBy on the domain key.",
)
def x26_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum(F.size(tokens("text"))).alias("total_tokens"),
            # bigint sum is exact and fits double; one IEEE division +
            # fixed-scale HALF_UP round in BOTH engines (VERDICT r3
            # hash-surface hardening)
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
        )
        .orderBy("source")
    )


@register(
    "x28_curriculum_buckets",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars, NTILE(4) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
    doc="X28 curriculum bucketing: exact NTILE(4) over a length-ordered "
    "corpus WITHOUT a single-partition window — global position comes "
    "from x18's range-repartitioned row ids (operators/ids.py), the "
    "total count joins in as a broadcast scalar, and the NTILE split "
    "(first n%k buckets take one extra row) is reproduced "
    "arithmetically. Scale: one range shuffle + per-bucket agg; the "
    "naive Window.orderBy formulation would serialize the corpus "
    "through one task.",
)
def x28_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.ids import global_row_ids

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_row_ids(d, order_by=["n_chars", "doc_id"], id_name="_rank")
    total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    k = F.lit(4)
    q, r = (F.col("_n") / 4).cast("long"), F.col("_n") % 4
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    bucket = (
        F.when(F.col("_rank") < big, (F.col("_rank") / (q + 1)).cast("long"))
        .otherwise(r + ((F.col("_rank") - big) / F.greatest(q, F.lit(1))).cast("long"))
        + 1
    )
    return (
        ranked.join(F.broadcast(total))
        .select("doc_id", "n_chars", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bucket")
    )


QUANT_SCALE = 0.04  # ≈ max|x|/127 for the fixture embeddings (~N(0, 0.1) values)


@register(
    "x29_quantize_error",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vecs,
           MAX(list_max(list_transform(embedding::DOUBLE[],
               x -> abs(x - {QUANT_SCALE} * greatest(-127, least(127, round(x / {QUANT_SCALE})))))))
             AS max_abs_err
    FROM embeddings GROUP BY label ORDER BY label
    """,
    doc="X29 int8 quantization QA: per-label worst-case reconstruction "
    "error of symmetric int8 quantization (functions/vector.py) — the "
    "check run before shipping a quantized ANN index. Error bound must "
    "be <= scale/2 unless values clip. Pure codegen'd HOFs, one groupBy.",
)
def x29_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.vector import (
        as_double_array,
        dequantize_int8,
        quantize_int8,
    )

    em = load_table(spark, sf_dir, "embeddings")
    err = F.array_max(
        F.zip_with(
            as_double_array("embedding"),
            dequantize_int8(quantize_int8("embedding", QUANT_SCALE), QUANT_SCALE),
            lambda x, dq: F.abs(x - dq),
        )
    )
    return (
        em.select("label", err.alias("_err"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.max("_err").alias("max_abs_err"))
        .orderBy("label")
    )


CONTAINMENT_THRESHOLD = 0.9


@register(
    "x32_containment_pairs",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_shared AS DOUBLE) / sa.n_sh AS cont_a,
           CAST(n_shared AS DOUBLE) / sb.n_sh AS cont_b
    FROM shared
    JOIN sizes sa ON shared.id_a = sa.doc_id
    JOIN sizes sb ON shared.id_b = sb.doc_id
    WHERE greatest(CAST(n_shared AS DOUBLE) / sa.n_sh,
                   CAST(n_shared AS DOUBLE) / sb.n_sh) >= {CONTAINMENT_THRESHOLD}
    """,
    doc="X32 asymmetric containment dedup: |A∩B|/|A| catches a document "
    "swallowed whole by a larger one (quote inclusion, concatenation), "
    "which symmetric Jaccard misses when sizes differ. Same inverted "
    "shingle index as x2 (the exploded-shingle plan is shared via "
    "cache_once when both run in one session).",
)
def x32_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(d, "doc_id", "text", CONTAINMENT_THRESHOLD, SHINGLE_N)


@register(
    "x31_novelty_curve",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM shingled GROUP BY shingle)
    SELECT s.doc_id,
           COUNT(*) AS n_sh,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           round(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
    FROM shingled s JOIN firsts f ON s.shingle = f.shingle
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    doc="X31 ingestion-order novelty: per document, the fraction of its "
    "distinct shingles first seen in it (min-doc_id over the corpus) — "
    "the marginal-value curve used to decide when a crawl stops paying. "
    "Two uniform-key shuffles (shingle min-agg, doc agg); the "
    "first-occurrence agg reuses the shingle partitioning for the join.",
)
def x31_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import novelty_curve

    d = load_table(spark, sf_dir, "documents")
    return novelty_curve(d, "doc_id", "text", SHINGLE_N)


@register(
    "x33_dedup_funnel",
    oracle=f"""
    WITH RECURSIVE shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON shared.id_a = sa.doc_id
      JOIN sizes sb ON shared.id_b = sb.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
            >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT COUNT(DISTINCT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
            FROM documents) AS n_exact_unique,
           (SELECT COUNT(DISTINCT component) FROM comp) AS n_neardup_clusters,
           (SELECT COUNT(*) - COUNT(DISTINCT component) FROM comp) AS n_neardup_removed
    """,
    doc="X33 corpus-reduction funnel: raw docs -> exact-fingerprint unique "
    "-> near-dup clusters -> docs a keep-one-per-cluster policy removes. "
    "The one-row report every dedup run ships. Reuses exact_dedup and the "
    "exact-Jaccard component closure (connected_components).",
)
def x33_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    comp = connected_components(
        ngram_jaccard_pairs(d, "doc_id", "text", JACCARD_THRESHOLD, SHINGLE_N)
    )
    comp_stats = comp.agg(
        F.count_distinct("component").alias("n_neardup_clusters"),
        (F.count(F.lit(1)) - F.count_distinct("component")).alias("n_neardup_removed"),
    )
    doc_stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(normalized_fingerprint("text")).alias("n_exact_unique"),
    )
    return doc_stats.join(F.broadcast(comp_stats))


# ---------------------------------------------------------------------------
# X34–X37 — event analytics over the behavioral stream (funnel, cohorts,
# attribution, rolling actives): the product-analytics queries every
# event warehouse runs at 100 TB. All shuffles key on user_id or a date
# — uniform, and tiny after the per-user/per-day reductions.
# ---------------------------------------------------------------------------


@register(
    "x34_conversion_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM v) AS conversion
    """,
    doc="X34 ordered conversion funnel (view -> click-after-view -> "
    "purchase-after-click), counted per user. Each stage is one "
    "filtered min-agg on user_id plus a broadcast-sized join to the "
    "prior stage — the stage frontiers shrink monotonically, so at "
    "100 TB only stage 1 touches the full scan.",
)
def x34_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((v, "n_view"), (c, "n_click"), (p, "n_purchase"))
    ]
    out = counts[0].join(F.broadcast(counts[1])).join(F.broadcast(counts[2]))
    return out.select(
        "n_view",
        "n_click",
        "n_purchase",
        (F.col("n_purchase").cast("double") / F.col("n_view")).alias("conversion"),
    )


@register(
    "x35_weekly_cohort_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS active_week
      FROM events e
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           datediff('day', c.cohort_week, a.active_week) // 7 AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM cohort c JOIN activity a ON c.user_id = a.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="X35 weekly cohort retention matrix: users bucketed by "
    "first-activity week, counted distinct per (cohort, week offset). "
    "Two user-keyed shuffles (first-activity min, user-week distinct) "
    "then a per-user join — the distinct reduction means the join "
    "carries user-weeks, not raw events.",
)
def x35_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "x36_last_touch_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type, value,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      FROM events
    )
    SELECT COUNT(*) AS n_purchases,
           COUNT(CASE WHEN last_click IS NOT NULL
                       AND epoch_us(ts) - epoch_us(last_click) <= 3600000000 THEN 1 END)
             AS n_attributed,
           CAST(SUM(CASE WHEN last_click IS NOT NULL
                          AND epoch_us(ts) - epoch_us(last_click) <= 3600000000
                         THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
             AS attributed_value
    FROM seq WHERE event_type = 'purchase'
    """,
    doc="X36 last-touch attribution: each purchase credits the user's "
    "most recent click within 1 hour (running max over the per-user "
    "event sequence — the same single user-keyed window pass an asof "
    "join would need, no self-join). DECIMAL-summed value for oracle "
    "bit-parity.",
)
def x36_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    seq = ev.select("user_id", "ts", "event_type", "value", last_click.alias("last_click"))
    attributed = F.col("last_click").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("last_click") <= 3_600_000_000
    )
    return seq.filter(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count(F.when(attributed, 1)).alias("n_attributed"),
        F.sum(F.when(attributed, F.col("value").cast("decimal(12,2)")))
        .cast("double")
        .alias("attributed_value"),
    )


@register(
    "x37_rolling_7day_active",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    contrib AS (
      SELECT user_id, d + CAST(o AS INTEGER) AS day
      FROM user_days, unnest(range(0, 7)) AS t(o)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, COUNT(DISTINCT user_id) AS rolling_7d_active
    FROM contrib
    WHERE day <= (SELECT max(CAST(ts AS DATE)) FROM events)
    GROUP BY day ORDER BY day
    """,
    doc="X37 trailing-7-day distinct active users per day, computed by "
    "EXPLODING each user-day into the 7 future days it keeps active "
    "(bounded 7x fan-out of the tiny distinct user-day set) instead of "
    "a day-range self-join — the shuffle key is the day, the fan-out "
    "is constant, and no range-join or window-over-days serialization "
    "appears at any scale.",
)
def x37_rolling_7day_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    max_day = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    contrib = user_days.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "d",
    ).select("user_id", F.date_add("d", F.col("o")).alias("day"))
    return (
        contrib.join(F.broadcast(max_day))
        .filter(F.col("day") <= F.col("max_d"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("rolling_7d_active"))
        .orderBy("day")
    )


@register(
    "x38_props_json_stats",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    doc="X38 semi-structured extraction: pull a typed field out of the "
    "JSON props payload (get_json_object — JVM-side Jackson path eval, "
    "no UDF) and aggregate per derived bucket. The everyday shape of "
    "event-property analytics over schemaless columns; one uniform "
    "10-key shuffle after a map-side combine.",
)
def x38_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .orderBy("k_bucket")
    )


@register(
    "x39_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="X39 behavioral transition matrix: per-user event bigrams via one "
    "LEAD over the user-keyed sequence (deterministic (ts, event_id) "
    "order), counted per (from, to). The Markov-chain input of "
    "journey/path analysis; one user shuffle + one 25-key agg.",
)
def x39_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


SHARD_TOKEN_BUDGET = 2048


@register(
    "x40_shard_manifest",
    oracle=f"""
    -- deterministic token-budget sharding: chunks in (doc_id, chunk_idx)
    -- order accumulate tokens; a chunk starts the next shard when the
    -- budget line crosses. shard = floor(tokens-before-this-chunk / B).
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((start_tok - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
             CAST(len(ts[start_tok : start_tok + {CHUNK_TOKENS} - 1]) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id, ts,
               unnest(range(1, greatest(len(ts), 1) + 1, {CHUNK_STRIDE})) AS start_tok
        FROM toks
      )
    ),
    cum AS (
      -- DuckDB widens SUM(BIGINT) (incl. windowed) to HUGEINT; the
      -- driver's typed hash distinguishes int128 from Spark's int64
      -- even when values are equal, so every integer SUM must be CAST
      -- back to BIGINT (VERDICT r4 root cause).
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
      FROM chunks
    )
    SELECT (running - n_tokens) // {SHARD_TOKEN_BUDGET} AS shard_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM cum GROUP BY 1 ORDER BY 1
    """,
    doc="X40 training-shard manifest: chunks (x25) are assigned to fixed "
    "token-budget shards by a GLOBAL RUNNING SUM over the corpus order — "
    "computed with the range-partitioned two-pass scheme "
    "(operators/ids.py::global_running_sum), not a single-reducer "
    "window. The manifest (chunks/tokens per shard) is what a training "
    "job consumes; assignment is bit-deterministic, so shards are "
    "reproducible across runs and cluster layouts.",
)
def x40_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.ids import global_running_sum

    chunks = x25_doc_chunking(spark, sf_dir).select("doc_id", "chunk_idx", "n_tokens")
    cum = global_running_sum(
        chunks, [F.col("doc_id"), F.col("chunk_idx")], "n_tokens", "running"
    )
    return (
        cum.select(
            ((F.col("running") - F.col("n_tokens")) / SHARD_TOKEN_BUDGET)
            .cast("long")
            .alias("shard_id"),
            "n_tokens",
        )
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tokens").alias("n_tokens"))
        .orderBy("shard_id")
    )


@register(
    "x41_snapshot_diff",
    oracle="""
    -- CDC between two corpus snapshots (simulated deterministically from
    -- the fixture: OLD = doc_id < 400, NEW = doc_id >= 100 with every
    -- doc_id % 7 == 0 doc re-crawled with a suffix): full outer join on
    -- the key, fingerprint compare for changed-in-place.
    WITH old AS (
      SELECT doc_id, sha256(text) AS fp FROM documents WHERE doc_id < 400
    ),
    new AS (
      SELECT doc_id,
             sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS fp
      FROM documents WHERE doc_id >= 100
    ),
    diff AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.fp <> n.fp THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT status, COUNT(*) AS n, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM diff GROUP BY status ORDER BY status
    """,
    doc="X41 snapshot diff (CDC between corpus versions): full outer join "
    "on the document key + content-fingerprint compare classifies every "
    "row added/removed/changed/unchanged — the incremental-recrawl "
    "accounting a continuously refreshed corpus runs instead of "
    "reprocessing 100 TB. One co-partitioned join on the key; "
    "fingerprints keep the compare to 32 bytes/row.",
)
def x41_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") < 400).select("doc_id", F.sha2("text", 256).alias("fp"))
    new = d.filter(F.col("doc_id") >= 100).select(
        "doc_id",
        F.sha2(
            F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2"))).otherwise(
                F.col("text")
            ),
            256,
        ).alias("fp"),
    )
    o, n = old.alias("o"), new.alias("n")
    diff = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer").select(
        F.coalesce("o.doc_id", "n.doc_id").alias("doc_id"),
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.fp") != F.col("n.fp"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("status")
    )


# shared by x42 (batch screen) and st14 (the same screen run per
# streaming micro-batch): the flag set is identical, so one oracle
# hash-checks both paths
X42_NEARDUP_ORACLE = f"""
    -- batch (doc_id >= 450) screened against corpus (doc_id < 450):
    -- exact shingle-Jaccard >= threshold; the LSH banding (32 hashes /
    -- 8 bands) has total recall at this threshold on the fixtures
    -- (asserted vs the exact pair set in tests), so the flag set is
    -- exact-threshold here too.
    WITH shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS n_shared
      FROM shingled b JOIN shingled c
        ON b.shingle = c.shingle AND b.doc_id >= 450 AND c.doc_id < 450
      GROUP BY 1, 2
    )
    SELECT batch_id AS doc_id,
           COUNT(*) AS n_near_dups,
           MAX(CAST(n_shared AS DOUBLE) / (sb.n_sh + sc.n_sh - n_shared)) AS max_jaccard
    FROM shared
    JOIN sizes sb ON shared.batch_id = sb.doc_id
    JOIN sizes sc ON shared.corpus_id = sc.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (sb.n_sh + sc.n_sh - n_shared) >= {JACCARD_THRESHOLD}
    GROUP BY batch_id ORDER BY doc_id
    """


@register(
    "x42_incremental_neardup_flags",
    oracle=X42_NEARDUP_ORACLE,
    doc="X42 incremental-ingest dedup: flag each incoming batch document "
    "with >= 1 near-duplicate in the standing corpus — the exact "
    "inverted-index screen (operators/dedup.py::"
    "exact_neardup_flags_vs_corpus) so the oracle's exact-threshold pair "
    "set is matched with total recall; the corpus index joins only "
    "shingles the batch contains, never batch x corpus. The MinHash-LSH "
    "variant (near_dup_flags_vs_corpus, recall/FP-tested) is the scale "
    "path when the batch shingle join runs hot (ADVICE r3: LSH recall at "
    "J=threshold is probabilistic, so it cannot back an exact oracle).",
)
def x42_incremental_neardup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import exact_neardup_flags_vs_corpus

    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") >= 450)
    corpus = d.filter(F.col("doc_id") < 450)
    return exact_neardup_flags_vs_corpus(
        batch, corpus, "doc_id", "text", threshold=JACCARD_THRESHOLD
    ).orderBy("doc_id")


@register(
    "x43_frame_sample_stats",
    oracle="""
    -- frame sampling fan-out is pure arithmetic on payload size:
    -- frames per media = least(floor(n_bytes/64) + 1, 8), offsets
    -- 0, 64, 128, ... — so per-mime totals are SQL-predictable.
    SELECT CASE WHEN n_chars % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
           COUNT(*) AS n_media,
           CAST(SUM(least(octet_length(encode(text)) // 64 + 1, 8)) AS BIGINT) AS n_frames,
           CAST(SUM((least(octet_length(encode(text)) // 64 + 1, 8) - 1)
               * least(octet_length(encode(text)) // 64 + 1, 8) // 2 * 64) AS BIGINT) AS total_offset
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    doc="X43 bounded frame sampling (operators/multimodal.py::frame_sample): "
    "the 1->N explode shape of video frame extraction with constant "
    "max fan-out, validated via arithmetic-predicted per-mime frame and "
    "offset totals.",
)
def x43_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.multimodal import documents_as_media, frame_sample

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = frame_sample(media, every_n_bytes=64, max_frames=8)
    mime = media.select("media_id", F.col("meta.mime").alias("mime"))
    return (
        frames.join(mime, "media_id")
        .groupBy("mime")
        .agg(
            F.count_distinct("media_id").alias("n_media"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("byte_offset").alias("total_offset"),
        )
        .orderBy("mime")
    )


@register(
    "x44_compaction_roundtrip",
    oracle="""
    -- compaction is layout-only: the per-type counts read back from the
    -- compacted table must equal the source table's — a lost or
    -- double-written file flips a count and reds the row. (File sizing
    -- itself is filesystem-side, asserted in tests.)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="X44 small-file compaction (operators/maintenance.py): routed "
    "streaming sink output (one file per route per batch) rewritten to "
    "size-targeted files, partitioning preserved — the OPTIMIZE job of "
    "K4/K6 sinks. Returns per-route row counts read back from the "
    "compacted table, hash-checked against the source counts.",
)
def x44_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.maintenance import compact_parquet

    # deterministic per-process dirs + src cleanup (ADVICE r3): this runs
    # on every pytest/verify/driver pass, so mkdtemp-per-invocation grew
    # orphan parquet piles without bound. Overwrite mode handles reruns;
    # dest must outlive the return (the result reads it lazily), so it is
    # reused, not deleted.
    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x44_{os.getpid()}")
    src, dest = os.path.join(base, "src"), os.path.join(base, "dest")
    ev = load_table(spark, sf_dir, "events")
    # simulate the per-batch small-file pile: 16 files per route
    ev.select("event_id", "event_type", "value").repartition(16).write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(src)
    compact_parquet(spark, src, dest, target_file_bytes=8 << 20,
                    preserve_partitioning=["event_type"])
    shutil.rmtree(src, ignore_errors=True)  # the pile served its purpose
    return (
        spark.read.parquet(dest)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def _zorder_oracle() -> str:
    from nagios_custom_etl_spark.operators.maintenance import zorder_key_sql

    day = "datediff('day', TIMESTAMP '1970-01-01', o_orderdate)"
    zv = zorder_key_sql(["o_custkey", day], bits=8)
    return f"""
    -- Z-order (Morton) interleave is pure bit arithmetic, identical in
    -- both engines: bit b of dim i lands at position b*2 + i. Buckets of
    -- 1024 consecutive Z-values cover small rectangles of the
    -- (custkey-low-bits, day-low-bits) plane — the per-bucket min/max
    -- spans ARE the multi-dimensional pruning bounds a clustered layout
    -- gives every file.
    WITH z AS (
      SELECT (o_custkey & 255) AS a,
             ({day} & 255) AS b,
             {zv} AS zv
      FROM orders
    )
    SELECT zv // 1024 AS zbucket,
           COUNT(*) AS n,
           MIN(a) AS min_a, MAX(a) AS max_a,
           MIN(b) AS min_b, MAX(b) AS max_b
    FROM z GROUP BY 1 ORDER BY 1
    """


@register(
    "x51_zorder_stats",
    oracle=_zorder_oracle(),
    doc="X51 Z-order clustering key (operators/maintenance.py::"
    "zorder_key/zorder_write — the Delta/Iceberg OPTIMIZE ZORDER BY "
    "layout primitive as a static codegen'd bit expression): orders "
    "interleaved on (custkey, order-day); per 1024-wide Z-bucket, the "
    "row count and min/max of BOTH dimensions — exactly the bounding "
    "rectangles that make clustered files prunable on ANY clustered "
    "column, not just a leading sort key. Bit-exact DuckDB oracle of "
    "the full interleave; file-level locality/disjointness asserted in "
    "tests/test_file_formats.py.",
)
def x51_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.maintenance import zorder_key

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).cast("long")
    z = zorder_key([F.col("o_custkey"), day], bits=8)
    return (
        o.select(
            F.col("o_custkey").bitwiseAND(255).alias("a"),
            day.bitwiseAND(255).alias("b"),
            z.alias("zv"),
        )
        .groupBy(F.expr("zv div 1024").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
        .orderBy("zbucket")
    )


@register(
    "x45_arrow_checksum",
    oracle="""
    -- ASCII corpus: the payload byte sum equals the character-code sum
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split_regex(text, ''), c -> ord(c)))
                AS BIGINT) AS byte_sum
    FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id
    """,
    doc="X45 mapInArrow kernel (operators/multimodal.py::checksum_arrow): "
    "RecordBatch-level processing with zero pandas materialization — the "
    "fast lane for binary-heavy columns. Byte sums validated against the "
    "oracle's character-code arithmetic (ASCII corpus).",
)
def x45_arrow_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.multimodal import checksum_arrow, documents_as_media

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    media = documents_as_media(docs)
    return checksum_arrow(media).select(
        F.col("media_id").alias("doc_id"), "byte_sum"
    ).orderBy("doc_id")


@register(
    "x46_neardup_components_stars",
    oracle=f"""
    -- same exact-Jaccard component closure as x13/x33, computed by the
    -- alternating large-star/small-star algorithm engine-side: the
    -- oracle is algorithm-independent (recursive reachability).
    WITH RECURSIVE shingled AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i : i + {SHINGLE_N} - 1], ' ')
                FOR i IN range(1, greatest(length(toks) - {SHINGLE_N} + 1, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents)
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON shared.id_a = sa.doc_id
      JOIN sizes sb ON shared.id_b = sb.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
            >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*) AS n_members
    FROM comp GROUP BY component ORDER BY component
    """,
    doc="X2/X13 alternative closure path: connected components via "
    "alternating large-star/small-star rounds (Kiveris et al. SoCC'14, "
    "operators/dedup.py::connected_components_stars) — O(log² n) rounds "
    "on adversarial diameters where min-label propagation is "
    "O(diameter). Same verified near-dup edge set as x13; the oracle "
    "checks the labeling is algorithm-independent.",
)
def x46_neardup_components_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import connected_components_stars

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", JACCARD_THRESHOLD, SHINGLE_N)
    comp = connected_components_stars(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("component")
    )


@register(
    "ep4_corpus_curation_pipeline",
    oracle=f"""
    -- the full curation chain as one SQL program: exact-dedup keepers
    -- -> decontamination against a held-out eval slice (shared 5-grams)
    -- -> quality gate -> sliding-window chunking -> token-budget shard
    -- manifest (global running sum in (doc_id, chunk_idx) order).
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM (SELECT doc_id,
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents)
      GROUP BY fp
    ),
    eval_sh AS (
      SELECT DISTINCT unnest(shingles) AS shingle
      FROM (
        SELECT [array_to_string(toks[i : i + 4], ' ')
                FOR i IN range(1, greatest(length(toks) - 4, 1) + 1)] AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents WHERE doc_id % 100 = 0)
      )
    ),
    contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM (
        SELECT doc_id, unnest(list_distinct(shingles)) AS shingle
        FROM (
          SELECT doc_id,
                 [array_to_string(toks[i : i + 4], ' ')
                  FOR i IN range(1, greatest(length(toks) - 4, 1) + 1)] AS shingles
          FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                FROM documents)
        )
      ) s JOIN eval_sh e ON s.shingle = e.shingle
    ),
    clean AS (
      SELECT d.doc_id, list_filter(string_split(d.text, ' '), t -> t <> '') AS ts
      FROM documents d
      JOIN keepers k ON d.doc_id = k.doc_id
      WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND d.doc_id % 100 <> 0
        AND d.n_chars BETWEEN 100 AND 5000
    ),
    chunks AS (
      SELECT doc_id,
             CAST((start_tok - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
             CAST(len(ts[start_tok : start_tok + {CHUNK_TOKENS} - 1]) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id, ts,
               unnest(range(1, greatest(len(ts), 1) + 1, {CHUNK_STRIDE})) AS start_tok
        FROM clean
      )
    ),
    cum AS (
      -- CAST: DuckDB windowed SUM(BIGINT) -> HUGEINT (VERDICT r4)
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
      FROM chunks
    )
    SELECT (running - n_tokens) // {SHARD_TOKEN_BUDGET} AS shard_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM cum GROUP BY 1 ORDER BY 1
    """,
    doc="EP4 capstone composite: the complete corpus-curation pass a "
    "pre-training run ships — exact dedup (X1 keepers) -> benchmark "
    "decontamination against a held-out eval slice (X14, broadcastable "
    "eval shingles) -> length gate (X4) -> sliding-window chunking "
    "(X25) -> deterministic token-budget shard manifest (X40, "
    "range-partitioned running sum). One lazy plan end to end; every "
    "stage's shuffle key is uniform (fingerprint, shingle, doc, range "
    "partition). The eval slice is doc_id % 100 == 0 and eval docs are "
    "excluded from the output corpus.",
)
def ep4_corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import decontaminate, exact_dedup
    from nagios_custom_etl_spark.operators.ids import global_running_sum

    d = load_table(spark, sf_dir, "documents")
    keepers = exact_dedup(d, "doc_id", "text").select("doc_id")
    evalset = d.filter(F.col("doc_id") % 100 == 0)
    contaminated = decontaminate(d, evalset, "doc_id", "text", shingle_n=5).select("doc_id")
    clean = (
        d.join(keepers, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .filter((F.col("doc_id") % 100 != 0) & F.col("n_chars").between(100, 5000))
    )
    toks_arr = clean.select("doc_id", tokens("text").alias("ts"))
    sz = F.size("ts")
    starts = F.explode(
        F.sequence(F.lit(1), F.greatest(sz, F.lit(1)), F.lit(CHUNK_STRIDE))
    ).alias("start_tok")
    chunk = F.slice("ts", F.col("start_tok"), CHUNK_TOKENS)
    chunks = toks_arr.select("doc_id", "ts", starts).select(
        "doc_id",
        ((F.col("start_tok") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )
    cum = global_running_sum(
        chunks, [F.col("doc_id"), F.col("chunk_idx")], "n_tokens", "running"
    )
    return (
        cum.select(
            ((F.col("running") - F.col("n_tokens")) / SHARD_TOKEN_BUDGET)
            .cast("long")
            .alias("shard_id"),
            "doc_id",
            "n_tokens",
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy("shard_id")
    )


CMS_DEPTH, CMS_WIDTH = 4, 256


@register(
    "x47_countmin_frequencies",
    oracle=f"""
    -- count-min sketch with md5 bucketing is engine-independent, so the
    -- ESTIMATES themselves are exactly checkable: estimate(token) =
    -- min over {CMS_DEPTH} seeds of the count in bucket
    -- ('0x' || substr(md5(seed:token), 1, 8)) % {CMS_WIDTH}.
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    exact AS (
      SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok
    ),
    top AS (
      SELECT tok, exact_n FROM exact ORDER BY exact_n DESC, tok LIMIT 10
    ),
    seeded AS (
      SELECT tok, s.seed,
             ('0x' || substr(md5(CAST(s.seed AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
               % {CMS_WIDTH} AS bucket
      FROM toks, (SELECT unnest(range(0, {CMS_DEPTH})) AS seed) s
    ),
    buckets AS (
      SELECT seed, bucket, COUNT(*) AS n FROM seeded GROUP BY seed, bucket
    ),
    qbuckets AS (
      SELECT t.tok, s.seed,
             ('0x' || substr(md5(CAST(s.seed AS VARCHAR) || ':' || t.tok), 1, 8))::BIGINT
               % {CMS_WIDTH} AS bucket
      FROM top t, (SELECT unnest(range(0, {CMS_DEPTH})) AS seed) s
    )
    SELECT q.tok AS token, t.exact_n,
           MIN(COALESCE(b.n, 0)) AS cms_n
    FROM qbuckets q
    JOIN top t ON q.tok = t.tok
    LEFT JOIN buckets b ON q.seed = b.seed AND q.bucket = b.bucket
    GROUP BY q.tok, t.exact_n
    ORDER BY token
    """,
    doc="X20 family completion: count-min sketch frequency estimation "
    "(operators/sketches.py) — constant depth×width state, mergeable, "
    "never underestimates. md5 bucketing makes the ESTIMATES exactly "
    "oracle-checkable cross-engine (xxhash64 is the production swap-in). "
    "Output: top-10 tokens with exact vs sketch counts.",
)
def x47_countmin_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import (
        count_min_buckets,
        count_min_estimates,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "token").limit(10)
    buckets = count_min_buckets(toks, "token", CMS_DEPTH, CMS_WIDTH)
    est = count_min_estimates(buckets, top, "token", CMS_DEPTH, CMS_WIDTH)
    return top.join(est, "token").select("token", "exact_n", "cms_n").orderBy("token")


# ---------------------------------------------------------------------------
# X59/X60 — warehouse mutation primitives: SCD Type 2 and MERGE upsert
# ---------------------------------------------------------------------------


@register(
    "x59_scd2_dimension_merge",
    oracle="""
    -- SCD Type 2 over the customer dimension. Initial load: every
    -- customer one open version from 1995-01-01. Update batch at
    -- 1996-06-01 (all derived from the fixture, so deterministic):
    --   custkey % 10 = 0  -> segment changes to segment || '-R2'
    --                        (close old version, open new one)
    --   custkey % 10 = 5  -> same segment re-delivered (idempotent:
    --                        NO new version)
    --   custkey % 97 = 0  -> a brand-new key at custkey + 100000
    --                        (one open version from the batch ts)
    WITH cur AS (
      SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
      FROM customer
    ),
    upd AS (
      SELECT c_custkey AS custkey, c_name AS name,
             c_mktsegment || '-R2' AS segment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 10 = 5
      UNION ALL
      SELECT c_custkey + 100000, 'new-' || CAST(c_custkey + 100000 AS VARCHAR),
             'NEWSEG'
      FROM customer WHERE c_custkey % 97 = 0
    ),
    j AS (SELECT cur.custkey AS tk, cur.name AS tname, cur.segment AS tseg,
                 upd.custkey AS sk, upd.name AS sname, upd.segment AS sseg
          FROM cur FULL OUTER JOIN upd ON cur.custkey = upd.custkey)
    SELECT custkey, name, segment, valid_from, valid_to, is_current FROM (
      -- changed keys: the closed old version
      SELECT tk AS custkey, tname AS name, tseg AS segment,
             '1995-01-01 00:00:00' AS valid_from,
             '1996-06-01 00:00:00' AS valid_to, FALSE AS is_current
      FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND tseg <> sseg
      UNION ALL
      -- changed keys: the new open version
      SELECT tk, sname, sseg, '1996-06-01 00:00:00', CAST(NULL AS VARCHAR), TRUE
      FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND tseg <> sseg
      UNION ALL
      -- unchanged / untouched keys: the open row passes through
      SELECT tk, tname, tseg, '1995-01-01 00:00:00', CAST(NULL AS VARCHAR), TRUE
      FROM j WHERE tk IS NOT NULL AND (sk IS NULL OR tseg = sseg)
      UNION ALL
      -- brand-new keys: one open version at the batch timestamp
      SELECT sk, sname, sseg, '1996-06-01 00:00:00', CAST(NULL AS VARCHAR), TRUE
      FROM j WHERE tk IS NULL
    ) ORDER BY custkey, valid_from
    """,
    doc="X59 SCD Type 2 dimension maintenance "
    "(operators/merge.py::scd2_apply): one full-outer join of the OPEN "
    "generation against the update batch, change detection on the "
    "tracked attribute, close+open rows for changed keys emitted via a "
    "single explode — no self-join, no full-dimension window, history "
    "unioned back untouched. The attribute-history shape a consumer of "
    "the reference feed (load_to_db.py:33-56 is append-only) runs when "
    "hosts change hostgroup. Idempotency (re-delivered identical "
    "attributes open no new version) is exercised by the %10=5 leg.",
)
def x59_scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.merge import scd2_apply

    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01 00:00:00").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.concat(F.col("c_mktsegment"), F.lit("-R2")).alias("segment"),
    )
    redelivered = c.filter(F.col("c_custkey") % 10 == 5).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    new_keys = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 100000).alias("custkey"),
        F.concat(F.lit("new-"), (F.col("c_custkey") + 100000).cast("string")).alias("name"),
        F.lit("NEWSEG").alias("segment"),
    )
    updates = changed.unionByName(redelivered).unionByName(new_keys)
    out = scd2_apply(
        dim, updates, key="custkey", tracked=["segment"], effective_ts="1996-06-01 00:00:00"
    )
    return out.orderBy("custkey", "valid_from")


@register(
    "x60_merge_upsert",
    oracle="""
    -- Delta-style MERGE INTO over the orders table (target: orderkey
    -- < 10000), change batch derived from the fixture:
    --   source op='U' (orderkey % 5 = 0, not % 35): matched -> update
    --     price to decimal-exact 1.1x, status to 'U'
    --   source op='D' (orderkey % 35 = 0): matched -> delete
    --   source op='I' (orderkey % 11 = 0, key shifted +500000): not
    --     matched -> insert with status 'N'
    -- target rows without a source row pass through unchanged.
    WITH t AS (
      SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price_d
      FROM orders WHERE o_orderkey < 10000
    ),
    s AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 35 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,2)) AS DOUBLE)
               AS price_d
      FROM orders WHERE o_orderkey < 10000 AND o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey + 500000, 'I',
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
      FROM orders WHERE o_orderkey < 10000 AND o_orderkey % 11 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NULL THEN t.status
                WHEN t.o_orderkey IS NOT NULL THEN 'U'
                ELSE 'N' END AS status,
           CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NULL THEN t.price_d
                ELSE s.price_d END AS price_d
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL AND s.op = 'D')
    ORDER BY o_orderkey
    """,
    doc="X60 general MERGE upsert (operators/merge.py::merge_upsert): "
    "matched+condition delete, matched update, not-matched insert, "
    "untouched passthrough — all four routes in ONE co-partitioned "
    "full-outer join + column routing (single shuffle; AQE broadcasts a "
    "small change batch). Updated prices go through exact DECIMAL "
    "arithmetic so both engines agree bit-for-bit. Write-back at scale "
    "is the x55 pattern: bucket-partitioned table, dynamic partition "
    "overwrite of only the touched buckets.",
)
def x60_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") < 10000).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price_d"),
    )
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    updates = (
        o.filter((F.col("o_orderkey") < 10000) & (F.col("o_orderkey") % 5 == 0))
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 35 == 0, "D").otherwise("U").alias("op"),
            (dec * F.lit("1.1").cast("decimal(3,2)")).cast("double").alias("price_d"),
        )
    )
    inserts = (
        o.filter((F.col("o_orderkey") < 10000) & (F.col("o_orderkey") % 11 == 0))
        .select(
            (F.col("o_orderkey") + 500000).alias("o_orderkey"),
            F.lit("I").alias("op"),
            dec.cast("double").alias("price_d"),
        )
    )
    source = updates.unionByName(inserts)
    merged = merge_upsert(
        target,
        source,
        keys=["o_orderkey"],
        when_matched_update={
            "status": F.lit("U"),
            "price_d": F.col("s.price_d"),
        },
        when_matched_delete=F.col("s.op") == "D",
        insert_values={
            "status": F.lit("N"),
            "price_d": F.col("s.price_d"),
        },
    )
    return merged.orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# X61 — fuzzy entity resolution (blocked approximate string join)
# ---------------------------------------------------------------------------

# deterministic "second source" corruptions of customer names, derived
# from the fixture so both engines regenerate them exactly:
#   %3=0 -> one char dropped inside the shared 'Customer#' boilerplate
#   %3=1 -> two chars substituted ('x','q') inside the boilerplate
#   %3=2 -> reversed name (negative control: far from everything)
# Corruptions live in HIGH-DF grams, so rare-gram blocking recall is
# total by construction (the tail-digit grams survive every edit).
X61_DIRTY_SQL = """
      SELECT c_custkey + 500000 AS id,
        CASE
          WHEN c_custkey % 3 = 0 THEN
            substr(c_name, 1, (c_custkey % 8) + 1) || substr(c_name, (c_custkey % 8) + 3)
          WHEN c_custkey % 3 = 1 THEN
            substr(c_name, 1, (c_custkey % 6) + 1) || 'x' ||
            substr(c_name, (c_custkey % 6) + 3, 4) || 'q' ||
            substr(c_name, (c_custkey % 6) + 8)
          ELSE reverse(c_name)
        END AS name
      FROM customer
"""


@register(
    "x61_fuzzy_entity_join",
    oracle=f"""
    -- blocked approximate join: corpus-DF-ranked rare trigrams (k=4,
    -- ties broken by the gram — a total order) -> inverted-index
    -- candidates -> exact levenshtein <= 2 verify. The oracle replicates
    -- the IDENTICAL blocking, so the pair set hash-checks.
    WITH clean AS (SELECT c_custkey AS id, c_name AS name FROM customer),
    dirty AS ({X61_DIRTY_SQL}),
    allstr AS (
      SELECT id, name, 'L' AS side FROM dirty
      UNION ALL SELECT id, name, 'R' FROM clean
    ),
    grams AS (
      SELECT id, side,
             unnest(list_distinct([substr(name, i, 3)
               FOR i IN range(1, greatest(length(name) - 2, 0) + 1)])) AS g
      FROM allstr
    ),
    gdf AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
    ranked AS (
      SELECT id, side, g,
             ROW_NUMBER() OVER (PARTITION BY side, id ORDER BY gdf.df, g) AS rn
      FROM grams JOIN gdf USING (g)
    ),
    rare AS (SELECT id, side, g FROM ranked WHERE rn <= 4),
    cand AS (
      SELECT DISTINCT l.id AS dirty_id, r.id AS clean_id
      FROM rare l JOIN rare r ON l.g = r.g AND l.side = 'L' AND r.side = 'R'
    )
    SELECT c.dirty_id, c.clean_id,
           CAST(levenshtein(d.name, cl.name) AS BIGINT) AS distance
    FROM cand c
    JOIN dirty d ON c.dirty_id = d.id
    JOIN clean cl ON c.clean_id = cl.id
    WHERE levenshtein(d.name, cl.name) <= 2
    ORDER BY dirty_id, clean_id
    """,
    doc="X61 fuzzy entity resolution (operators/entity.py::fuzzy_join): "
    "approximate string join (edit distance <= 2) between a clean record "
    "set and a deterministically corrupted second source, WITHOUT a "
    "cartesian product — rare-trigram blocking (corpus-DF-ranked, so "
    "shared boilerplate like 'Customer#' never blocks) + inverted-index "
    "candidates + exact levenshtein verify. The linking join a consumer "
    "of the reference's host feed (hosts_to_csv.py's exact-name keys) "
    "needs against any independently-spelled source. Planted-corruption "
    "recall is pinned in tests/test_entity.py.",
)
def x61_fuzzy_entity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.entity import fuzzy_join

    c = load_table(spark, sf_dir, "customer")
    clean = c.select(F.col("c_custkey").alias("clean_id"), F.col("c_name").alias("name"))
    k = F.col("c_custkey")
    # drop position (k%8)+2 / substitution positions (k%6)+2 and +5 —
    # all inside the shared boilerplate, spelled as substr arithmetic
    dirty = c.select(
        (k + 500000).alias("dirty_id"),
        F.when(
            k % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, (c_custkey % 8) + 1)"),
                F.expr("substr(c_name, (c_custkey % 8) + 3)"),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(
                F.expr("substr(c_name, 1, (c_custkey % 6) + 1)"),
                F.lit("x"),
                F.expr("substr(c_name, (c_custkey % 6) + 3, 4)"),
                F.lit("q"),
                F.expr("substr(c_name, (c_custkey % 6) + 8)"),
            ),
        )
        .otherwise(F.reverse(F.col("c_name")))
        .alias("name"),
    )
    out = fuzzy_join(
        dirty, clean, "dirty_id", "clean_id", "name", "name", max_distance=2, k_rare=4
    )
    return out.orderBy("dirty_id", "clean_id")


# ---------------------------------------------------------------------------
# X62 — per-group trend regression from exact integer sufficient stats
# ---------------------------------------------------------------------------


@register(
    "x62_trend_regression",
    oracle="""
    -- per-event-type daily-volume trend: OLS slope/intercept/r2 computed
    -- from INTEGER sufficient statistics (n, Sx, Sy, Sxy, Sxx, Syy as
    -- BIGINTs), with exactly one double division at the end — so both
    -- engines produce bit-identical doubles (a running double sum like
    -- regr_slope's is association-order-dependent and would not).
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    x0 AS (SELECT CAST(MIN(d) AS BIGINT) AS d0 FROM daily),
    pts AS (SELECT event_type, CAST(d - d0 AS BIGINT) AS x, y FROM daily, x0),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
           END AS intercept,
           CASE WHEN n * syy - sy * sy = 0 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
                     / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
           END AS r2
    FROM s ORDER BY event_type
    """,
    doc="X62 per-group trend detection: OLS regression of daily event "
    "volume per event_type, computed from exact BIGINT sufficient "
    "statistics (one map-side-combined aggregate, one scalar broadcast "
    "for the day origin) with a single double division at the end — "
    "numerically equal to Spark's built-in regr_slope/regr_intercept/"
    "regr_r2 (pinned within 1e-9 in tests) but cross-engine "
    "bit-deterministic. The volume-trend audit a corpus operator runs "
    "per source/domain at 100 TB: sufficient stats are mergeable, so "
    "the whole thing is one partial-aggregated shuffle of 6 longs per "
    "group.",
)
def x62_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    x0 = daily.agg(F.min("d").cast("long").alias("d0"))
    pts = daily.crossJoin(F.broadcast(x0)).select(
        "event_type", (F.col("d") - F.col("d0")).cast("long").alias("x"), "y"
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # dx == 0 (a group with one distinct day) would divide by zero under
    # ANSI — slope/intercept/r2 are all NULL there, matching the oracle
    slope = F.when(dx == 0, F.lit(None).cast("double")).otherwise(
        num.cast("double") / dx.cast("double")
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        slope.alias("slope"),
        F.when(dx == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        )
        .alias("intercept"),
        F.when((dy == 0) | (dx == 0), F.lit(None).cast("double"))
        .otherwise((num.cast("double") * num.cast("double")) / (dx.cast("double") * dy.cast("double")))
        .alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# X65 — token-budget apportionment (largest-remainder mixture allocation)
# ---------------------------------------------------------------------------


@register(
    "x65_token_budget_apportionment",
    oracle="""
    -- allocate a 100k-char training budget across sources proportionally
    -- to corpus mass, by the largest-remainder (Hamilton) method — ALL
    -- integer arithmetic, so quotas sum to the budget exactly and both
    -- engines agree bit-for-bit. Then fill each source's quota by
    -- deterministic doc order via a running sum.
    WITH w AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS weight
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS wsum FROM w),
    base AS (
      SELECT source, weight,
             CAST((100000 * weight) // wsum AS BIGINT) AS base,
             CAST((100000 * weight) % wsum AS BIGINT) AS rem
      FROM w, tot
    ),
    lo AS (SELECT CAST(100000 - SUM(base) AS BIGINT) AS leftover FROM base),
    quota AS (
      SELECT source, weight,
             CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                              <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM base, lo
    ),
    sel AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS csum_before
      FROM documents
    )
    SELECT q.source, q.weight, q.quota,
           CAST(COUNT(CASE WHEN COALESCE(s.csum_before, 0) < q.quota THEN 1 END)
                AS BIGINT) AS n_docs_selected,
           CAST(COALESCE(SUM(CASE WHEN COALESCE(s.csum_before, 0) < q.quota
                                  THEN s.n_chars END), 0) AS BIGINT) AS chars_selected
    FROM quota q JOIN sel s ON q.source = s.source
    GROUP BY q.source, q.weight, q.quota
    ORDER BY q.source
    """,
    doc="X65 mixture-budget apportionment: the largest-remainder method "
    "allocates an integer token budget across sources exactly "
    "proportionally (quotas sum to the budget by construction — no "
    "float drift, unlike naive rounding), then each source fills its "
    "quota in deterministic doc order via a per-source running sum. "
    "Complements x10d (rows-only proportional rebalance) with a fully "
    "oracle-checked allocation. The remainder ranking is a window over "
    "one row per SOURCE (bounded — domains number in the thousands at "
    "100 TB, not rows), and the fill is a partitioned cumulative sum.",
)
def x65_token_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = d.groupBy("source").agg(F.sum("n_chars").cast("long").alias("weight"))
    tot = w.agg(F.sum("weight").cast("long").alias("wsum"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "weight",
        F.expr("CAST((100000 * weight) div wsum AS BIGINT)").alias("base"),
        F.expr("CAST((100000 * weight) % wsum AS BIGINT)").alias("rem"),
    )
    lo = base.agg((F.lit(100000) - F.sum("base")).cast("long").alias("leftover"))
    # one row per source: the single-partition window is bounded by the
    # domain count, never by corpus size
    rank_w = Window.orderBy(F.desc("rem"), "source")
    quota = base.crossJoin(F.broadcast(lo)).select(
        "source",
        "weight",
        (
            F.col("base")
            + F.when(F.row_number().over(rank_w) <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
    fill_w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sel = d.select(
        "source", "doc_id", "n_chars", F.sum("n_chars").over(fill_w).alias("csum_before")
    )
    picked = F.coalesce(F.col("csum_before"), F.lit(0)) < F.col("quota")
    return (
        quota.join(sel, "source")
        .groupBy("source", "weight", "quota")
        .agg(
            F.count(F.when(picked, 1)).cast("long").alias("n_docs_selected"),
            F.coalesce(F.sum(F.when(picked, F.col("n_chars"))), F.lit(0))
            .cast("long")
            .alias("chars_selected"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X64 — file-level min/max data skipping (manifest pruning)
# ---------------------------------------------------------------------------


@register(
    "x64_file_stats_skipping",
    oracle="""
    -- layout-only operator chain: lineitem is rewritten range-clustered
    -- on l_shipdate, a one-pass per-file min/max manifest is built, and
    -- the 1996 read prunes non-intersecting files BEFORE scheduling
    -- tasks. The residual filter makes the answer layout-invariant, so
    -- the oracle is the plain predicate over the logical table (the
    -- x44/x51 pattern); pruning effectiveness is test-pinned, not
    -- hashed.
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <= TIMESTAMP '1996-12-31 23:59:59'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="X64 file-level data skipping "
    "(operators/maintenance.py::file_stats_manifest/stats_pruned_read): "
    "the Delta/Iceberg manifest primitive — per-file min/max stats from "
    "ONE distributed pass, file pruning before task scheduling (parquet "
    "row-group stats only act after a task opens a footer), residual "
    "filter for layout-invariant answers. Composes with zorder_write "
    "(x51) which is what makes per-file ranges tight; at 100 TB this is "
    "why a day-predicate query schedules hundreds of tasks instead of "
    "hundreds of thousands. Pruned-file-count < total is pinned in "
    "tests/test_file_formats.py.",
)
def x64_file_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.functions.scalar import dsum
    from nagios_custom_etl_spark.operators.maintenance import stats_pruned_read

    li = load_table(spark, sf_dir, "lineitem")
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x64_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    # range-clustered rewrite: each file covers a tight l_shipdate span
    li.repartitionByRange(8, "l_shipdate").sortWithinPartitions("l_shipdate").write.mode(
        "overwrite"
    ).parquet(path)
    pruned, n_read, n_total = stats_pruned_read(
        spark,
        path,
        "l_shipdate",
        datetime.datetime(1996, 1, 1, 0, 0, 0),
        datetime.datetime(1996, 12, 31, 23, 59, 59),
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    )
    return (
        pruned.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            dsum("l_quantity", 12, 2).alias("sum_qty"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# X63 — semantic decontamination (embedding-level eval-vs-train screen)
# ---------------------------------------------------------------------------


@register(
    "x63_semantic_decontamination",
    oracle="""
    -- embedding-level decontamination: every EVAL item (the organic
    -- vec_id >= 450 half plus planted exact copies of train vectors at
    -- +2000000) is screened against the TRAIN corpus (vec_id < 450) for
    -- max cosine >= 0.8. The Spark side routes through the IVF
    -- cell-join with probe-all, which equals this brute-force scan
    -- (parity test-pinned), so the whole approximate serving chain
    -- hash-checks: planted copies flag at cosine 1.0, organic evals
    -- stay far below threshold.
    WITH train AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 450
    ),
    evals AS (
      SELECT vec_id AS eval_id, embedding::DOUBLE[] AS q
      FROM embeddings WHERE vec_id >= 450
      UNION ALL
      SELECT vec_id + 2000000, embedding::DOUBLE[]
      FROM embeddings WHERE vec_id < 450 AND vec_id % 45 = 0
    ),
    scored AS (
      SELECT e.eval_id, t.vec_id AS nbr_id,
             list_cosine_similarity(e.q, t.v) AS cs,
             ROW_NUMBER() OVER (PARTITION BY e.eval_id
                                ORDER BY list_cosine_similarity(e.q, t.v) DESC,
                                         t.vec_id) AS rn
      FROM evals e, train t
    )
    SELECT eval_id, nbr_id, round(cs, 6) AS max_cos_r,
           round(cs, 6) >= 0.8 AS contaminated
    FROM scored WHERE rn = 1 ORDER BY eval_id
    """,
    doc="X63 semantic decontamination: X14's benchmark screen lifted to "
    "embedding space (SemDeDup/eval-leakage style) — every eval item's "
    "nearest train neighbor by cosine, flagged at >= 0.8. The Spark "
    "plan is the IVF cell-routed join (operators/similarity.py::"
    "cosine_topk_join_ivf, k=1) run probe-all so the answer is exactly "
    "brute force and DuckDB-hashable; at 100 TB the same code runs with "
    "n_probe << n_cells (recall gated at x3d) and the eval side is the "
    "small one — never train x eval all-pairs. Complements the "
    "shingle-overlap screen (x14): catches paraphrased leakage that "
    "exact n-grams miss.",
)
def x63_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import cosine_topk_join_ivf

    em = cache_once(load_table(spark, sf_dir, "embeddings"))
    train = em.filter(F.col("vec_id") < 450)
    evals = (
        em.filter(F.col("vec_id") >= 450)
        .select(F.col("vec_id").alias("eval_id"), "embedding")
        .unionByName(
            em.filter((F.col("vec_id") < 450) & (F.col("vec_id") % 45 == 0)).select(
                (F.col("vec_id") + 2000000).alias("eval_id"), "embedding"
            )
        )
    )
    res = cosine_topk_join_ivf(
        train, evals, "embedding", "vec_id", "embedding", "eval_id",
        k=1, n_cells=8, n_probe=8, seed=7,
    )
    return (
        res.filter(F.col("rank") == 1)
        .select(
            F.col("query_id").alias("eval_id"),
            "nbr_id",
            F.round("cos_sim", 6).alias("max_cos_r"),
            (F.round("cos_sim", 6) >= 0.8).alias("contaminated"),
        )
        .orderBy("eval_id")
    )


# ---------------------------------------------------------------------------
# X66 — perceptual-hash image near-duplicate detection (dHash)
# ---------------------------------------------------------------------------


@register(
    "x66_phash_image_neardup",
    oracle="""
    -- image near-dup via dHash: planted gradient BMPs are CONSTRUCTED
    -- so each image's 64-bit dHash equals a closed form of its id
    -- (operators/multimodal.py::planted_hash) — ids < 400 hash to
    -- id * 2654435761; ids 400-499 are byte-level variants of source
    -- id-400 at Hamming distance 0 / 1 / 3 by id % 3. The Spark side
    -- computes hashes from REAL pixel decoding + 9x8 nearest-neighbor
    -- sampling, so a decoder bug flips this row; the banded Hamming
    -- pipeline (4 bands x 11 bits over the varying low bits,
    -- pigeonhole-complete for <= 2 flips) is replicated identically
    -- here.
    WITH h AS (
      SELECT doc_id AS id,
        CASE WHEN doc_id < 400 THEN doc_id * 2654435761
             WHEN doc_id % 3 = 0 THEN (doc_id - 400) * 2654435761
             WHEN doc_id % 3 = 1 THEN
               xor((doc_id - 400) * 2654435761, 1::BIGINT << (doc_id % 40))
             ELSE
               xor(xor(xor((doc_id - 400) * 2654435761,
                           1::BIGINT << (doc_id % 40)),
                       1::BIGINT << ((doc_id % 40 + 13) % 40)),
                   1::BIGINT << ((doc_id % 40 + 27) % 40))
        END AS hv
      FROM documents
    ),
    banded AS (
      SELECT id, hv, unnest([0, 1, 2, 3]) AS band FROM h
    ),
    bval AS (
      SELECT id, hv, band, (hv >> (band * 11)) & 2047 AS val FROM banded
    ),
    cand AS (
      SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.hv AS h_a, r.hv AS h_b
      FROM bval l JOIN bval r ON l.band = r.band AND l.val = r.val AND l.id < r.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(h_a, h_b)) <= 2
    ORDER BY id_a, id_b
    """,
    doc="X66 perceptual-hash image near-dup: REAL stdlib pixel decode -> "
    "9x8 nearest-neighbor gray sampling -> 64-bit dHash "
    "(operators/multimodal.py::dhash_images, per-row mapInPandas, no "
    "shuffle) -> banded Hamming join (phash_near_dup_pairs: 4x11-bit "
    "bands, pigeonhole-complete at Hamming <= 2, exact bit_count(xor) "
    "verify — the X2 SimHash shape applied to images). Near-copies are "
    "planted at the BYTE level (odd-coordinate pixels differ; the "
    "sampled grid doesn't), so this catches what exact payload dedup "
    "cannot. The image-dedup gate of a multimodal training corpus; "
    "hashes are 8 bytes/image at 10^11 scale.",
)
def x66_phash_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.multimodal import (
        dhash_images,
        phash_near_dup_pairs,
        planted_gradient_media,
    )

    ids = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))
    media = planted_gradient_media(ids)
    hashes = dhash_images(media)
    return phash_near_dup_pairs(hashes, max_hamming=2).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# X67 — partition-digest corpus diff (Merkle-style drift detection)
# ---------------------------------------------------------------------------


@register(
    "x67_partition_digest_diff",
    oracle="""
    -- two corpus snapshots (x41's construction) are fingerprinted at
    -- the BUCKET level: per bucket, an order-independent digest =
    -- SUM of per-row md5-derived 40-bit integers (commutative integer
    -- arithmetic — no float drift, no overflow at any row count that
    -- fits a BIGINT budget of 2^23 rows/bucket... at 100 TB widen the
    -- modulus or digest per sub-bucket). Buckets whose digests agree
    -- need NO row-level comparison — the cheap first pass that lets
    -- x41's row-level CDC run only on drifted buckets.
    WITH old AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id >= 100
    ),
    od AS (
      SELECT doc_id % 16 AS bucket,
             CAST(SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 10))::BIGINT) AS BIGINT) AS digest,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM old GROUP BY 1
    ),
    nd AS (
      SELECT doc_id % 16 AS bucket,
             CAST(SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 10))::BIGINT) AS BIGINT) AS digest,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM new GROUP BY 1
    )
    SELECT COALESCE(od.bucket, nd.bucket) AS bucket,
           od.n_rows AS old_rows, nd.n_rows AS new_rows,
           CASE WHEN od.bucket IS NULL THEN 'added'
                WHEN nd.bucket IS NULL THEN 'removed'
                WHEN od.digest <> nd.digest OR od.n_rows <> nd.n_rows THEN 'drifted'
                ELSE 'clean' END AS status
    FROM od FULL OUTER JOIN nd ON od.bucket = nd.bucket
    ORDER BY bucket
    """,
    doc="X67 partition-digest diff: Merkle-style drift detection between "
    "corpus snapshots — per-bucket order-independent digests (SUM of "
    "md5-derived 40-bit row integers; commutative BIGINT arithmetic, "
    "identical in both engines) compared with one bucket-keyed join of "
    "16 rows. Buckets reporting 'clean' skip x41's row-level CDC "
    "entirely: at 100 TB the digest pass reads each snapshot once and "
    "shuffles 16 longs, and only drifted buckets pay the row-level "
    "full-outer join. The snapshot construction is x41's, so 'drifted' "
    "buckets here are exactly the buckets x41 finds changed rows in.",
)
def x67_partition_digest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") < 400).select("doc_id", "text")
    new = d.filter(F.col("doc_id") >= 100).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def digests(df: DataFrame) -> DataFrame:
        row_int = F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), "text")), 1, 10),
            16,
            10,
        ).cast("long")
        return df.groupBy((F.col("doc_id") % 16).alias("bucket")).agg(
            F.sum(row_int).cast("long").alias("digest"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    od, nd = digests(old).alias("od"), digests(new).alias("nd")
    j = od.join(nd, F.col("od.bucket") == F.col("nd.bucket"), "full_outer")
    return j.select(
        F.coalesce("od.bucket", "nd.bucket").alias("bucket"),
        F.col("od.n_rows").alias("old_rows"),
        F.col("nd.n_rows").alias("new_rows"),
        F.when(F.col("od.bucket").isNull(), "added")
        .when(F.col("nd.bucket").isNull(), "removed")
        .when(
            (F.col("od.digest") != F.col("nd.digest"))
            | (F.col("od.n_rows") != F.col("nd.n_rows")),
            "drifted",
        )
        .otherwise("clean")
        .alias("status"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# X68 — temporal join to a versioned (SCD2) dimension
# ---------------------------------------------------------------------------


@register(
    "x68_temporal_dim_join",
    oracle="""
    -- every order joins the customer-dimension VERSION valid at its
    -- order date (x59's SCD2 construction: %10=0 customers change
    -- segment to segment||'-R2' at 1996-06-01). Pre-change orders of
    -- changed keys aggregate under the old segment, post-change under
    -- the new one — the as-of-time attribution mistake a plain
    -- current-state join makes is exactly what this prevents.
    WITH dim AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment,
             TIMESTAMP '1995-01-01 00:00:00' AS vf,
             CASE WHEN c_custkey % 10 = 0
                  THEN TIMESTAMP '1996-06-01 00:00:00' END AS vt
      FROM customer
      UNION ALL
      SELECT c_custkey, c_mktsegment || '-R2',
             TIMESTAMP '1996-06-01 00:00:00', NULL
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT d.segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN dim d ON o.o_custkey = d.custkey
      AND o.o_orderdate >= d.vf AND (d.vt IS NULL OR o.o_orderdate < d.vt)
    GROUP BY d.segment ORDER BY d.segment
    """,
    doc="X68 temporal dimension join (operators/merge.py::temporal_join): "
    "facts resolve against the SCD2 version valid at event time "
    "(half-open [valid_from, valid_to)) — the dimension is built by the "
    "SAME scd2_apply call as x59, so this row proves the versioned "
    "table is consumable, not just constructible. Equi-join on the key "
    "with the interval as residual: per-key version counts are bounded "
    "by attribute-change cardinality, so no range-join blowup at "
    "100 TB; AQE splits hot keys.",
)
def x68_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.merge import scd2_apply, temporal_join

    c = load_table(spark, sf_dir, "customer")
    dim0 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01 00:00:00").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.col("c_mktsegment"), F.lit("-R2")).alias("segment"),
    )
    dim = scd2_apply(
        dim0, updates, key="custkey", tracked=["segment"], effective_ts="1996-06-01 00:00:00"
    ).select(
        "custkey",
        "segment",
        F.to_timestamp("valid_from").alias("vf"),
        F.to_timestamp("valid_to").alias("vt"),
    )
    o = load_table(spark, sf_dir, "orders")
    joined = temporal_join(o, dim, "o_custkey", "custkey", "o_orderdate", "vf", "vt")
    return (
        joined.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# X69 — snapshot-versioned table: time travel across an overwrite
# ---------------------------------------------------------------------------


@register(
    "x69_snapshot_time_travel",
    oracle="""
    -- a snapshot table is committed twice (v1 = the OLD corpus slice,
    -- v2 = an OVERWRITE with the recrawled slice — x41's construction),
    -- then BOTH versions are read back through their manifests: the
    -- overwrite must not disturb v1's time-travel read. Per-version
    -- content stats over the union prove each read returns exactly its
    -- snapshot.
    WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id >= 100
    ),
    allv AS (
      SELECT 1 AS version, * FROM v1
      UNION ALL
      SELECT 2, * FROM v2
    )
    SELECT version, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_unique,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM allv GROUP BY version ORDER BY version
    """,
    doc="X69 snapshot time travel (operators/snapshots.py): versioned "
    "manifests over immutable parquet — commit v1, OVERWRITE as v2, "
    "read BOTH back through their manifests in one result. Commits are "
    "O(files) metadata with an O_EXCL atomic commit point (optimistic "
    "concurrency — the Delta/Iceberg protocol's local-FS instance); "
    "reads plan from explicit file lists, never directory listings; "
    "old versions stay reachable until vacuum. This is the substrate "
    "x41's CDC and x67's digests assume when they compare 'as of run "
    "N' with 'as of run N+1'. Conflict detection, rollback-as-commit, "
    "and vacuum reachability are pinned in tests/test_snapshots.py.",
)
def x69_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.snapshots import (
        overwrite,
        read_snapshot,
    )

    d = load_table(spark, sf_dir, "documents")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x69_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    v1 = overwrite(d.filter(F.col("doc_id") < 400).select("doc_id", "text"), root)
    v2 = overwrite(
        d.filter(F.col("doc_id") >= 100).select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        ),
        root,
    )
    out = None
    for v in (v1, v2):
        snap = read_snapshot(spark, root, v).select(F.lit(v).alias("version"), "doc_id", "text")
        out = snap if out is None else out.unionByName(snap)
    return (
        out.groupBy("version")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct(F.sha2("text", 256)).cast("long").alias("n_unique"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("version")
    )


# ---------------------------------------------------------------------------
# X70 — snapshot-isolated MERGE publish (mutation family x60/st17 routed
# through the manifest-commit layer)
# ---------------------------------------------------------------------------


@register(
    "x70_upsert_snapshot_isolation",
    oracle="""
    -- MERGE publish through manifest commits: v1 = latest-per-key over
    -- the even-event_id half of events; v2 = the odd half newer-wins-
    -- merged onto v1, which equals latest-per-key over ALL events. The
    -- Spark query re-reads the PINNED v1 manifest AFTER the v2 publish;
    -- snapshot isolation means those rows are byte-identical to the
    -- pre-publish v1 state — i.e. exactly this SQL, or the hash breaks.
    WITH latest AS (
      SELECT user_id, event_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id IS NOT NULL AND event_id % 2 = 0
    ),
    latest_all AS (
      SELECT user_id, event_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT version, user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, value
    FROM (
      SELECT 1 AS version, user_id, event_id, event_type, ts, value
      FROM latest WHERE rn = 1
      UNION ALL
      SELECT 2, user_id, event_id, event_type, ts, value
      FROM latest_all WHERE rn = 1
    )
    ORDER BY version, user_id
    """,
    doc="X70 snapshot-isolated MERGE publish (operators/snapshots.py::"
    "merge_commit + operators/merge.py::merge_upsert): the keyed-upsert "
    "mutation (x60/st17's shape) routed through the manifest-commit "
    "layer — data files are written first, the atomic manifest commit "
    "publishes them, and a version-pinned reader re-reading ITS "
    "snapshot AFTER the upsert sees it byte-identical (readers plan "
    "from explicit manifest file lists, never from directories a "
    "writer could be rewriting). Closes the torn-read window dynamic "
    "partition overwrite leaves open: at 100 TB the upsert rewrites "
    "only merged state + a kilobyte manifest, and concurrent writers "
    "serialize via optimistic ConcurrentCommitError retry. The query "
    "publishes v1 (even-event_id latest-per-key), pins a v1 reader, "
    "publishes v2 (odd half, newer-wins), then returns the post-"
    "publish re-read of v1 alongside v2 — both hash-checked.",
)
def x70_upsert_snapshot_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nagios_custom_etl_spark.operators.snapshots import merge_commit, read_snapshot

    cols = ["user_id", "event_id", "event_type", "ts", "value"]
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def latest_per_key(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*cols)
        )

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x70_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    v1 = merge_commit(root, latest_per_key(ev.filter(F.col("event_id") % 2 == 0)), keys=["user_id"])
    newer = (F.col("s.ts") > F.col("t.ts")) | (
        (F.col("s.ts") == F.col("t.ts")) & (F.col("s.event_id") > F.col("t.event_id"))
    )
    v2 = merge_commit(
        root,
        latest_per_key(ev.filter(F.col("event_id") % 2 == 1)),
        keys=["user_id"],
        when_matched_update={
            c: F.when(newer, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")) for c in cols
        },
    )
    # the isolation proof: re-read the PINNED v1 manifest AFTER v2 published
    out = None
    for v in (v1, v2):
        snap = read_snapshot(spark, root, v).select(F.lit(v).alias("version"), *cols)
        out = snap if out is None else out.unionByName(snap)
    return out.select(
        "version",
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "value",
    ).orderBy("version", "user_id")


# ---------------------------------------------------------------------------
# X71 — incremental materialized-view maintenance (signed CDC deltas)
# ---------------------------------------------------------------------------


@register(
    "x71_incremental_mv",
    oracle="""
    -- the MV is built over the base slice (event_id % 3 != 0), then a
    -- CDC batch INSERTS the % 3 == 0 rows and DELETES the % 5 == 0 base
    -- rows; the view is maintained from signed per-group deltas only —
    -- the base is never rescanned. Exact-decimal carriers make the
    -- incremental sum bit-equal to this full recompute over the final
    -- row set: base \\ deletes UNION inserts = (3|id) OR (5 does not
    -- divide id).
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id % 3 = 0 OR event_id % 5 <> 0
    GROUP BY user_id, event_type
    ORDER BY user_id NULLS FIRST, event_type
    """,
    doc="X71 incremental materialized-view maintenance (operators/"
    "merge.py::mv_build/mv_apply_delta): the classic signed-delta view-"
    "maintenance algorithm — inserts +1 / deletes -1, ONE aggregation "
    "over the change batch, a null-safe full-outer merge into the view, "
    "groups whose count reaches zero dropped. The base table is never "
    "rescanned: per-batch cost is O(|delta|) + a join against the view "
    "(|groups|, not |rows|). This is st7's rollup loop generalized to "
    "DELETES — the reason a 100 TB warehouse can keep summary tables "
    "current without recomputing them. Exact DECIMAL carriers make the "
    "maintained sums bit-identical to a recompute (double sums cannot "
    "re-associate exactly), which is precisely what the oracle checks.",
)
def x71_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.merge import mv_apply_delta, mv_build

    keys = ["user_id", "event_type"]
    sums = {"sum_value": ("value", 18, 6)}
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 3 != 0)
    mv = mv_build(base, keys, "n_events", sums)
    inserts = ev.filter(F.col("event_id") % 3 == 0)
    deletes = base.filter(F.col("event_id") % 5 == 0)
    out = mv_apply_delta(mv, inserts, deletes, keys, "n_events", sums)
    return out.select(
        "user_id",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy(F.asc_nulls_first("user_id"), "event_type")


# ---------------------------------------------------------------------------
# X74 — edit-distance<=1 self-join (FastSS deletion-neighborhood blocking)
# ---------------------------------------------------------------------------


@register(
    "x74_editdist_join",
    oracle="""
    -- exact edit-distance<=1 self-join over constructed short codes
    -- ('d' || decade || letter — dense distance-1 neighborhoods within
    -- a decade, substitution pairs across decades, insertion pairs
    -- across code lengths). The Spark side blocks on FastSS deletion
    -- neighborhoods (provably complete at k=1) and verifies with exact
    -- levenshtein; the oracle is the brute-force quadratic join the
    -- blocking must reproduce pair-for-pair.
    WITH c AS (
      SELECT doc_id AS id,
             'd' || CAST(doc_id // 10 AS VARCHAR)
                 || substr('abcdefghij', CAST(doc_id % 10 AS INT) + 1, 1) AS s
      FROM documents
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS distance
    FROM c a JOIN c b ON a.id < b.id AND levenshtein(a.s, b.s) <= 1
    ORDER BY id_a, id_b
    """,
    doc="X74 edit-distance<=1 similarity self-join (operators/entity.py::"
    "editdist1_self_join): FastSS/SymSpell deletion-neighborhood "
    "blocking — explode each string's single-deletion variants, "
    "inverted-index equi-join on the variant, exact levenshtein verify. "
    "The neighborhood intersection is COMPLETE for distance<=1 "
    "(substitution: delete the differing position from both; indel: the "
    "longer side's deletion IS the shorter string), so unlike x61's "
    "rare-trigram blocking this one needs no recall gate — the oracle "
    "brute force must match exactly. Complements x61 (k>=2 typo-"
    "tolerant linking): k=1 is the high-volume case (single-keystroke "
    "variants, OCR slips) and O(n*len) blocking keys beat O(n^2) "
    "distance calls at any corpus size.",
)
def x74_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.entity import editdist1_self_join

    codes = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.concat(
            F.lit("d"),
            F.expr("CAST(doc_id DIV 10 AS STRING)"),
            F.substring(F.lit("abcdefghij"), (F.col("doc_id") % 10).cast("int") + 1, 1),
        ).alias("s"),
    )
    return editdist1_self_join(codes, "id", "s").orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# X75 — one-pass column profiling
# ---------------------------------------------------------------------------


@register(
    "x75_column_profile",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(epoch_us(MIN(o_orderdate)) AS DOUBLE),
           CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey',
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    ORDER BY col_name
    """,
    doc="X75 one-pass column profiling: per-column null count, exact "
    "distinct count, typed min/max (numeric as DOUBLE, timestamps as "
    "epoch-us, strings lexicographic) over orders, computed in ONE "
    "aggregation (multiple COUNT(DISTINCT)s plan as a single Expand — "
    "one scan multiplied by ncols, one shuffle) and unpivoted via "
    "inline(). The schema-drift / data-quality audit every ingest "
    "pipeline runs before accepting a drop. At 100 TB swap the exact "
    "distincts for approx_count_distinct (a3/a8's contract) — the exact "
    "form is kept here because the oracle can hash it.",
)
def x75_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    num_cols = ["o_custkey", "o_orderkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    ts_cols = ["o_orderdate"]
    df = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in num_cols + str_cols + ts_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def entry(c: str, min_num, max_num, min_str, max_str):
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            min_num.alias("min_num"),
            max_num.alias("max_num"),
            min_str.alias("min_str"),
            max_str.alias("max_str"),
        )

    structs = (
        [
            entry(c, F.col(f"{c}__min").cast("double"), F.col(f"{c}__max").cast("double"),
                  null_s, null_s)
            for c in num_cols
        ]
        + [
            entry(c, null_d, null_d, F.col(f"{c}__min"), F.col(f"{c}__max"))
            for c in str_cols
        ]
        + [
            # fixture parquet drifts between TIMESTAMP and TIMESTAMP_NTZ
            # across regenerations; the cast normalizes (UTC session)
            entry(c, F.unix_micros(F.col(f"{c}__min").cast("timestamp")).cast("double"),
                  F.unix_micros(F.col(f"{c}__max").cast("timestamp")).cast("double"),
                  null_s, null_s)
            for c in ts_cols
        ]
    )
    return row.select(F.inline(F.array(*structs))).orderBy("col_name")


# ---------------------------------------------------------------------------
# X76 — stats-pruned snapshot reads (data skipping resolved from manifests)
# ---------------------------------------------------------------------------


@register(
    "x76_stats_pruned_snapshot",
    oracle="""
    -- documents are committed to a snapshot table range-clustered on
    -- doc_id with per-file min/max recorded IN the manifest at commit
    -- time; the read plans only the files whose range intersects
    -- [100, 399] — zero file opens, the pruning decision is a manifest
    -- read. The residual filter makes the answer layout-invariant
    -- (x64's convention), so the oracle is the plain predicate;
    -- planned-files < total is pinned in tests/test_snapshots.py.
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id BETWEEN 100 AND 399
    GROUP BY source ORDER BY source
    """,
    doc="X76 stats-pruned snapshot reads (operators/snapshots.py::"
    "read_snapshot_pruned): x64's file-skipping manifest folded INTO "
    "the snapshot layer — per-file min/max stats are computed in one "
    "distributed pass at COMMIT time and live in the version manifest, "
    "so every subsequent read prunes at manifest-planning time with "
    "zero file opens and zero extra passes (x64 rebuilds its manifest "
    "per read; a table format pays that cost once per commit). "
    "Files without stats are conservatively kept; the residual "
    "predicate keeps answers layout-invariant. This is the read path "
    "Delta/Iceberg data skipping actually uses, and with x70's "
    "snapshot-isolated MERGE it completes the table-format story: "
    "versioned commits, stats, pruning, time travel on one manifest.",
)
def x76_stats_pruned_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.snapshots import (
        overwrite,
        read_snapshot_pruned,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x76_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    overwrite(d.repartitionByRange(8, "doc_id"), root, stats_cols=["doc_id"])
    pruned, _n_planned, _n_total = read_snapshot_pruned(spark, root, "doc_id", 100, 399)
    return (
        pruned.filter(F.col("doc_id").between(100, 399))  # residual: layout-invariant
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X77 — interval max-concurrency (sweep line as running signed sum)
# ---------------------------------------------------------------------------


@register(
    "x77_interval_concurrency",
    oracle="""
    -- max concurrent intervals per event_type: each event opens an
    -- interval [ts, ts + 60 + event_id % 240 seconds); sweep line =
    -- +1/-1 endpoint rows, running sum ordered by (time, delta) — the
    -- delta tiebreak closes before it opens at the same instant
    -- (half-open intervals), and within equal (t, delta) groups all
    -- deltas share a sign so the prefix max is permutation-invariant.
    -- CAST the windowed SUM: DuckDB widens it to HUGEINT.
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS t0,
             epoch_us(ts) + (60 + event_id % 240) * 1000000 AS te
      FROM events
    ),
    pts AS (
      SELECT event_type, t0 AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, te, -1 FROM iv
    ),
    run AS (
      SELECT event_type, delta,
             CAST(SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS conc
      FROM pts
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type ORDER BY event_type
    """,
    doc="X77 interval max-concurrency: the sweep-line algorithm as pure "
    "relational algebra — explode each interval to signed endpoints, "
    "running SUM over an event-time window per type, MAX. Answers "
    "'what was the peak number of simultaneously-open alerts/sessions/"
    "connections' (the capacity-planning question over the reference's "
    "service events) in two codegen'd passes with ONE shuffle on "
    "(event_type). Scale note: the running sum serializes per "
    "event_type partition — the right unit, since concurrency is "
    "defined per type; a single global hot type would call for the "
    "x18 two-pass range-partitioned prefix sum instead.",
)
def x77_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t0"),
        (F.unix_micros("ts") + (F.lit(60) + F.col("event_id") % 240) * 1000000).alias("te"),
    )
    pts = iv.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("t0").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("te").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select("event_type", "p.t", "p.delta")
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("conc", F.sum("delta").over(w).cast("long"))
    return (
        run.groupBy("event_type")
        .agg(
            F.sum((F.col("delta") == 1).cast("long")).cast("long").alias("n_intervals"),
            F.max("conc").cast("long").alias("max_concurrent"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X78 — deterministic weighted PPS sampling (integer-exact, map-only)
# ---------------------------------------------------------------------------


@register(
    "x78_weighted_pps_sample",
    oracle="""
    -- probability-proportional-to-size Bernoulli sampling with an
    -- expected 100 docs: doc i is kept iff u_i < k * w_i / W, decided
    -- by the INTEGER cross-multiplication h_i * W < k * w_i * 2^32
    -- (h_i = first 8 md5 hex digits of the id) — no floating point
    -- anywhere, so both engines make bit-identical keep decisions.
    -- (The float-keyed Efraimidis-Spirakis order u^(1/w) was measured
    -- to differ between Spark and DuckDB ln() at the ulp level — an
    -- ordering no cross-engine hash can pin.)
    WITH w AS (
      SELECT doc_id, source, GREATEST(n_chars, 1) AS w FROM documents
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
    kept AS (
      SELECT doc_id, source, w FROM w, tot
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT * tw
            < 100 * w * 4294967296
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(w) AS BIGINT) AS w_sum
    FROM kept GROUP BY source ORDER BY source
    """,
    doc="X78 deterministic weighted sampling (PPS Bernoulli): keep each "
    "document with probability min(1, k*w/W) — longer documents "
    "proportionally more likely, expected k kept — decided by an "
    "integer cross-multiplied md5 threshold (x10's determinism "
    "contract, weighted). Map-only over the corpus after one scalar "
    "total-weight broadcast: NO shuffle, no ordering, no state — the "
    "sampling shape that actually runs on 100 TB (fixed-size "
    "Efraimidis-Spirakis top-k costs a global order; its float keys "
    "also aren't cross-engine hashable — measured 6% ulp divergence "
    "Spark-vs-DuckDB ln()). The integer compare needs h*W < 2^63: "
    "exact up to ~2^31 total weight; beyond that, rescale weights or "
    "widen to DECIMAL(38,0) cross-multiplication, protocol unchanged.",
)
def x78_weighted_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 100
    w = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.greatest(F.col("n_chars"), F.lit(1)).alias("w")
    )
    tot = w.agg(F.sum("w").cast("long").alias("tw"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    kept = w.crossJoin(F.broadcast(tot)).filter(
        h * F.col("tw") < F.lit(k) * F.col("w") * F.lit(4294967296)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("w").cast("long").alias("w_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X72 — bucketed co-located join (zero Exchange on either side)
# ---------------------------------------------------------------------------


@register(
    "x72_bucketed_join",
    oracle="""
    -- orders and lineitem are persisted BUCKETED on the orderkey (the
    -- pre-paid shuffle), so the fact-to-fact join plans as a
    -- SortMergeJoin with NO Exchange on either side — the layout, not
    -- the data, changed, so the oracle is the plain logical join.
    -- Exchange-free plan shape is pinned in tests/test_scale_joins.py.
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    doc="X72 bucketed co-located join (operators/maintenance.py::"
    "write_bucketed_table): both fact tables persisted bucketed+sorted "
    "on the orderkey, so the join's distribution requirement is "
    "satisfied BY THE SCAN — SortMergeJoin with zero Exchange (and "
    "sorted-bucket metadata eliminating the Sort), vs. the same "
    "logical join shuffling both sides on every execution. The "
    "broadcast hint is disabled via a merge hint so the co-location "
    "is what the plan exercises. At 100 TB bucketing the two biggest "
    "fact tables on their join key once turns every subsequent "
    "join/groupBy on that key into a shuffle-free stage — the "
    "single largest recurring-cost lever a warehouse layout owns. "
    "Complements x50 (skew salting) and the catalog HASH spread "
    "(which co-distributes only within one session's exchange reuse).",
)
def x72_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from nagios_custom_etl_spark.operators.maintenance import write_bucketed_table

    pid = os.getpid()
    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x72_{pid}")
    t_orders, t_lineitem = f"x72_orders_{pid}", f"x72_lineitem_{pid}"
    write_bucketed_table(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        spark, t_orders, "o_orderkey", f"{base}/orders",
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        spark, t_lineitem, "l_orderkey", f"{base}/lineitem",
    )
    o, li = spark.table(t_orders), spark.table(t_lineitem)
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        o.hint("merge")
        .join(li.hint("merge"), o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# X79 — orphan-file GC (the obverse of vacuum)
# ---------------------------------------------------------------------------


@register(
    "x79_orphan_gc",
    oracle="""
    -- a writer writes data files but never commits (crashed / lost the
    -- optimistic race — merge_commit writes data FIRST, then
    -- arbitrates); gc_orphans deletes exactly those unreferenced files
    -- and nothing else. The committed v1 read through its manifest is
    -- byte-identical after the GC (this query IS the post-GC read),
    -- and the orphaned write's file count (2 — repartition(2)) is the
    -- deleted count. Orphan deletion safety: an unreferenced file can
    -- never become referenced, so GC cannot race a reader.
    SELECT CAST(2 AS BIGINT) AS n_orphans_deleted,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id < 300
    """,
    doc="X79 orphan-file GC (operators/snapshots.py::gc_orphans): "
    "deletes data files referenced by NO manifest — the files a writer "
    "produced before losing a commit race or crashing mid-commit, "
    "which the optimistic protocol (x70) deliberately leaves behind "
    "because data is written before arbitration. Completes the "
    "snapshot layer's storage-reclamation story alongside vacuum "
    "(expired OLD versions): together every byte on disk is reachable "
    "from a retained manifest. Listing is confined to this scheduled "
    "job (orphans are by definition outside all metadata); the read "
    "path still never lists. Non-interference with committed reads "
    "and exactly-the-orphans deletion are what the oracle pins; "
    "manifest-untouched/empty-dir-removal in tests/test_snapshots.py.",
)
def x79_orphan_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x79_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    v1 = S.overwrite(d.filter(F.col("doc_id") < 300), root)
    # a crashed writer: data files on disk, no manifest references them.
    # min_age_sec=0 because this maintenance window provably has no
    # in-flight writer; production runs keep the default retention so GC
    # cannot eat files a concurrent writer wrote but has not committed.
    S._write_data_files(d.filter(F.col("doc_id") % 2 == 0).repartition(2), root)
    deleted = S.gc_orphans(spark, root, min_age_sec=0.0)
    return S.read_snapshot(spark, root, v1).agg(
        F.lit(len(deleted)).cast("long").alias("n_orphans_deleted"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# X80 — declarative constraint audit (dbt-style data tests at scale)
# ---------------------------------------------------------------------------


@register(
    "x80_constraint_audit",
    oracle="""
    SELECT 'accepted_values_o_orderstatus' AS check_name,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'fk_lineitem_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'fk_orders_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'not_null_l_orderkey',
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'pk_orders_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    ORDER BY check_name
    """,
    doc="X80 declarative constraint audit — the dbt-test / Deequ shape: "
    "primary-key uniqueness (COUNT - COUNT DISTINCT), referential "
    "integrity both directions (LEFT ANTI joins — the dimension side "
    "broadcasts, the fact side streams), NOT NULL, and accepted-values "
    "domain checks, one row of violation counts per constraint. The "
    "pre-publish gate a warehouse runs on every batch before promoting "
    "it (t6's row-level conformance gate aggregated to table-level "
    "contracts). Each check is a scan-plus-aggregate or an anti-join; "
    "nothing materializes violating rows unless a check fails — at "
    "100 TB the audit costs one pass per constraint table, not per "
    "constraint (same-table checks share the scan via cache_once).",
)
def x80_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = cache_once(load_table(spark, sf_dir, "orders"))
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"), F.col("n_violations"))

    pk = one(
        "pk_orders_unique",
        orders.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
            .cast("long")
            .alias("n_violations")
        ),
    )
    fk_o = one(
        "fk_orders_customer",
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias("n_violations")),
    )
    fk_l = one(
        "fk_lineitem_orders",
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias("n_violations")),
    )
    nn = one(
        "not_null_l_orderkey",
        li.agg(F.sum(F.col("l_orderkey").isNull().cast("long")).cast("long").alias("n_violations")),
    )
    av = one(
        "accepted_values_o_orderstatus",
        orders.agg(
            F.sum(
                (
                    (~F.col("o_orderstatus").isin("O", "F", "P"))
                    | F.col("o_orderstatus").isNull()
                ).cast("long")
            )
            .cast("long")
            .alias("n_violations")
        ),
    )
    return pk.unionByName(fk_o).unionByName(fk_l).unionByName(nn).unionByName(av).orderBy(
        "check_name"
    )


# ---------------------------------------------------------------------------
# X81 — time-series gap fill (date spine + LOCF + linear interpolation)
# ---------------------------------------------------------------------------


@register(
    "x81_gapfill_interpolate",
    oracle="""
    -- hypertable gap fill (TimescaleDB time_bucket_gapfill / rrdtool
    -- resample semantics): per series, a regular hourly spine over THAT
    -- series' own extent, observations placed on it, gaps filled two
    -- ways — locf (last observation carried forward; NULL before the
    -- first observation) and linear interpolation between the bracketing
    -- observations (boundary gaps take the single available neighbor).
    -- frac is a ratio of epoch differences, so any timezone offset
    -- cancels; the interpolation arithmetic is written in the identical
    -- order on both engines (IEEE ops are deterministic when not
    -- re-associated).
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h, MAX(value) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM obs GROUP BY event_type
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    placed AS (
      SELECT s.event_type, s.h, o.v FROM spine s
      LEFT JOIN obs o ON o.event_type = s.event_type AND o.h = s.h
    ),
    edged AS (
      SELECT event_type, h, v,
        LAST_VALUE(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        FIRST_VALUE(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
      FROM placed
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           (v IS NULL) AS is_gap,
           prev_v AS locf,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * ((CAST(epoch(h) AS BIGINT) - CAST(epoch(prev_h) AS BIGINT))
                     / (CAST(epoch(next_h) AS BIGINT) - CAST(epoch(prev_h) AS BIGINT)))
           END AS interpolated
    FROM edged
    ORDER BY event_type, hour
    """,
    doc="X81 time-series gap fill — the hypertable resampling op "
    "(TimescaleDB time_bucket_gapfill + locf/interpolate; rrdtool's "
    "fixed-step rebinning, the data model behind the reference's RRD "
    "exports, url_service_status_InfluxDB_insert.py:1-170): per series, "
    "an hourly spine generated from THAT series' own extent "
    "(sequence+explode — per-key, fully distributed, no global spine "
    "and no cross join), left join of observations, then LOCF and "
    "linear interpolation from two ignoreNulls window edges. At 100 TB "
    "the spine explode and both windows key on the series — one "
    "shuffle by series id, spine length bounded per key; interpolation "
    "arithmetic is order-pinned so the oracle hash-checks doubles "
    "bit-for-bit. frac is a ratio of epoch deltas (timezone cancels).",
)
def x81_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max("value").alias("v"))
    spine = (
        obs.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    placed = spine.join(obs, ["event_type", "h"], "left")
    back = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.partitionBy("event_type").orderBy("h").rowsBetween(0, W.unboundedFollowing)
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    edged = placed.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("prev_v"),
        F.first("v", ignorenulls=True).over(fwd).alias("next_v"),
        F.last(obs_h, ignorenulls=True).over(back).alias("prev_h"),
        F.first(obs_h, ignorenulls=True).over(fwd).alias("next_h"),
    )
    frac = (F.unix_timestamp("h") - F.unix_timestamp("prev_h")) / (
        F.unix_timestamp("next_h") - F.unix_timestamp("prev_h")
    )
    return edged.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v").isNull().alias("is_gap"),
        F.col("prev_v").alias("locf"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("interpolated"),
    ).orderBy("event_type", "hour")


# ---------------------------------------------------------------------------
# X82 — M4 visualization-aware downsampling (min/max/first/last per pixel)
# ---------------------------------------------------------------------------


@register(
    "x82_m4_downsample",
    oracle="""
    -- M4 downsampling (Jugel et al., VLDB 2014): per series and pixel
    -- bucket keep min, max, first and last — the exact set of points a
    -- w-pixel line chart needs for pixel-perfect rendering, reducing
    -- arbitrarily many points to <= 4w per series. Buckets are computed
    -- in pure BIGINT arithmetic (epoch-us offsets cross-multiplied by
    -- the pixel count, floor-divided by the span) so the binning is
    -- bit-identical across engines; first/last are resolved by the
    -- total order (ts, event_id) to be tie-deterministic.
    WITH b AS (
      SELECT event_type, MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
      FROM events GROUP BY event_type
    ),
    pts AS (
      SELECT e.event_type, e.value, epoch_us(e.ts) AS eu, e.event_id,
             ((epoch_us(e.ts) - b.lo) * 400) // (b.hi - b.lo + 1) AS bucket
      FROM events e JOIN b ON e.event_type = b.event_type
    ),
    ranked AS (
      SELECT event_type, bucket, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY eu, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY eu DESC, event_id DESC) AS rn_d
      FROM pts
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS v_min, MAX(value) AS v_max,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS v_last
    FROM ranked GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    doc="X82 M4 downsampling (Jugel/Markl, 'M4: A Visualization-Oriented "
    "Time Series Data Aggregation', VLDB 2014) — the relational standard "
    "for time-series chart rendering and the scale answer to 'plot a "
    "100 TB metric': min/max/first/last per (series, pixel bucket), "
    "grouping-only — one shuffle on (series, bucket), the two ROW_NUMBER "
    "windows share that exact partitioning so the sort amortizes, and "
    "output is bounded by 4*pixels*series regardless of input rows. "
    "Bucket ids are pure-BIGINT cross-multiplication (no float binning "
    "drift); ties broken by (ts, event_id) so first/last are exact. "
    "This is what the reference's Grafana/InfluxDB consumers do to its "
    "RRD series downstream; here it is a first-class operator.",
)
def x82_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    pts = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        "value",
        F.unix_micros("ts").alias("eu"),
        "event_id",
        F.expr("((unix_micros(ts) - lo) * 400) DIV (hi - lo + 1)").alias("bucket"),
    )
    wa = W.partitionBy("event_type", "bucket").orderBy("eu", "event_id")
    wd = W.partitionBy("event_type", "bucket").orderBy(F.desc("eu"), F.desc("event_id"))
    ranked = pts.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        ranked.groupBy("event_type", F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("v_first"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# X83 — EWMA smoothing (finite-horizon, power-of-two weights, order-pinned)
# ---------------------------------------------------------------------------


def _ewma_fragment() -> str:
    """One arithmetic fragment over columns ``v, l1..l7`` shared VERBATIM
    by the Spark plan and the DuckDB oracle: an 8-term exponentially
    weighted average with alpha = 1/2. Every weight 0.5^(k+1) is a dyadic
    rational, exact in both decimal literals and binary doubles, and each
    ``lk * w`` is an exponent shift (exact); the sum is written as one
    left-associated chain neither engine re-associates, so the smoothed
    doubles hash-check bit-for-bit. Head-of-series rows renormalize over
    the weights actually present (the standard adjusted/bias-corrected
    EWM, pandas ewm(adjust=True))."""
    ws = ["0.5", "0.25", "0.125", "0.0625", "0.03125", "0.015625", "0.0078125", "0.00390625"]
    num = [f"v * CAST({ws[0]} AS DOUBLE)"]
    den = [f"CAST({ws[0]} AS DOUBLE)"]
    for k in range(1, 8):
        num.append(
            f"(CASE WHEN l{k} IS NULL THEN CAST(0 AS DOUBLE)"
            f" ELSE l{k} * CAST({ws[k]} AS DOUBLE) END)"
        )
        den.append(
            f"(CASE WHEN l{k} IS NULL THEN CAST(0 AS DOUBLE)"
            f" ELSE CAST({ws[k]} AS DOUBLE) END)"
        )
    return f"({' + '.join(num)}) / ({' + '.join(den)})"


@register(
    "x83_ewma_smoothing",
    oracle=f"""
    -- finite-horizon EWMA (alpha = 1/2, 8 taps) over each series'
    -- hourly observations — the standard monitoring smoother (Grafana's
    -- exponentialMovingAverage, pandas ewm) made relational: a LAG
    -- chain plus one shared arithmetic fragment. See _ewma_fragment for
    -- why the doubles are bit-identical across engines.
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h, MAX(value) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    lagged AS (
      SELECT event_type, h, v,
             LAG(v, 1) OVER w AS l1, LAG(v, 2) OVER w AS l2,
             LAG(v, 3) OVER w AS l3, LAG(v, 4) OVER w AS l4,
             LAG(v, 5) OVER w AS l5, LAG(v, 6) OVER w AS l6,
             LAG(v, 7) OVER w AS l7
      FROM obs
      WINDOW w AS (PARTITION BY event_type ORDER BY h)
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           v,
           {_ewma_fragment()} AS ewma
    FROM lagged
    ORDER BY event_type, hour
    """,
    doc="X83 EWMA smoothing — exponentially weighted moving average with "
    "a finite 8-tap horizon (alpha=1/2, adjusted weights at the series "
    "head), the monitoring-dashboard smoother over the reference's RRD "
    "series. The infinite-recurrence EWMA is not expressible as a "
    "window aggregate; truncating at 8 taps bounds the error at 2^-8 "
    "of the signal while keeping the operator a pure LAG chain — "
    "codegen'd, one shuffle on the series key, embarrassingly parallel "
    "at 100 TB (contrast the sequential per-row recurrence, which "
    "would force applyInPandas). The weight arithmetic is shared "
    "verbatim with the oracle and exact in doubles (_ewma_fragment), "
    "so this smoothing of arbitrary float data still hash-checks.",
)
def x83_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max("value").alias("v"))
    w = W.partitionBy("event_type").orderBy("h")
    lagged = obs.select(
        "event_type",
        "h",
        "v",
        *[F.lag("v", k).over(w).alias(f"l{k}") for k in range(1, 8)],
    )
    return lagged.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "v",
        F.expr(_ewma_fragment()).alias("ewma"),
    ).orderBy("event_type", "hour")


# ---------------------------------------------------------------------------
# X85 — materialized-view automatic query rewrite (read-side of x71)
# ---------------------------------------------------------------------------


@register(
    "x85_mv_query_rewrite",
    oracle="""
    -- the query is WRITTEN against the base events table; the engine
    -- answers it from a (day, event_type)-grain summary parquet via
    -- aggregate MV substitution (rewrite provenance asserted in the
    -- plan function — a silent fallback fails the query). Distributive
    -- aggregates re-aggregate from partial states; avg derives as
    -- exact-DECIMAL sum / nonnull count, so the rewritten answer is
    -- bit-identical to this direct base-table SQL.
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
             AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="X85 automatic MV query rewrite (operators/mv_rewrite.py) — "
    "Calcite-style aggregate materialized-view substitution, the "
    "read-side complement of x71's incremental maintenance: a GROUP BY "
    "event_type over the base fact is transparently routed to a "
    "(day, event_type) summary parquet because the summary's grain "
    "subsumes the query's and count/sum/min/max re-aggregate from "
    "partial states (avg derived as exact sum / nonnull count, never "
    "stored). At 100 TB this turns the all-day dashboard scan of the "
    "fact (10^11 rows) into a scan of the grain cardinality (10^5) "
    "with zero query changes. Conservative matcher: count_distinct or "
    "an unknown grain falls back to the base table — fallback and "
    "rewrite-equivalence (incl. NULL measures) pinned in "
    "tests/test_mv_rewrite.py; the rewritten scan provably reads the "
    "MV files, asserted there via explain.",
)
def x85_mv_query_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.mv_rewrite import (
        AggSpec,
        SummaryView,
        build_summary,
        rewrite_aggregate,
    )

    measures = {"value": (18, 6)}
    base = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    summary, view_kwargs = build_summary(base, ["day", "event_type"], measures)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x85_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    summary.write.mode("overwrite").parquet(path)
    views = {"daily_events": SummaryView(df=spark.read.parquet(path), **view_kwargs)}

    aggs = [
        AggSpec("count", None, "n_events"),
        AggSpec("sum", "value", "sum_value"),
        AggSpec("avg", "value", "avg_value"),
        AggSpec("min", "value", "min_value"),
        AggSpec("max", "value", "max_value"),
    ]
    plan, provenance = rewrite_aggregate(base, ["event_type"], aggs, views, measures)
    if provenance != "mv:daily_events":  # the rewrite IS the operator under test
        raise AssertionError(f"expected MV rewrite, planned from {provenance}")
    return plan.select(
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "avg_value",
        "min_value",
        "max_value",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# X84 — incremental snapshot read (append-only change feed from manifests)
# ---------------------------------------------------------------------------


@register(
    "x84_snapshot_incremental_read",
    oracle="""
    -- three appends land on a snapshot table (doc_id <200, 200-349,
    -- 350-499); a consumer that last saw v1 reads the delta since v1 —
    -- which the manifest layer resolves as the FILE-SET DIFFERENCE of
    -- two manifests (append-only proven from the op chain), so the scan
    -- reads only the two newer appends' files. The aggregate below is
    -- over exactly those rows; the old files are never opened.
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id >= 200 AND doc_id < 500
    GROUP BY source ORDER BY source
    """,
    doc="X84 incremental snapshot read (operators/snapshots.py::"
    "read_incremental) — the Iceberg incremental-append scan / Delta "
    "change-feed read: the row delta between two versions of an "
    "append-only table is exactly the file-set difference of their "
    "manifests, so a downstream consumer (x71's MV refresh, a "
    "streaming backfill) reads O(new files) per cycle and never "
    "re-scans or row-diffs the table — the read-side completion of the "
    "snapshot family (time travel x69, isolation x70, pruning x76, GC "
    "x79). Soundness is checked, not assumed: any overwrite/rollback "
    "or vacuumed manifest inside the range is refused (tests), because "
    "only an append-only chain proves newer files == newer rows.",
)
def x84_snapshot_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x84_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    v1 = S.append(d.filter(F.col("doc_id") < 200), root)
    S.append(d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)), root)
    S.append(d.filter((F.col("doc_id") >= 350) & (F.col("doc_id") < 500)), root)
    delta = S.read_incremental(spark, root, since_version=v1)
    return (
        delta.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X73 — snapshot schema evolution (enforcement + evolve-on-append)
# ---------------------------------------------------------------------------


@register(
    "x73_snapshot_schema_evolution",
    oracle="""
    -- v1 appends (doc_id, source); v2 appends WITH a new n_chars column
    -- under evolve=True. The table schema evolves (column appended),
    -- old data files are untouched, and the read reconciles
    -- heterogeneous files: v1 rows surface n_chars as NULL. Equivalent
    -- relational statement: union with an explicit typed NULL.
    WITH t AS (
      SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars
      FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id, source, n_chars
      FROM documents WHERE doc_id >= 150 AND doc_id < 300
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM t GROUP BY source ORDER BY source
    """,
    doc="X73 snapshot schema evolution (operators/snapshots.py): the "
    "table's schema is part of the committed manifest; an append whose "
    "batch drifts from it is REFUSED (SchemaMismatchError) unless "
    "evolve=True, which records the merged schema — added columns "
    "append, omitted columns persist, type changes are never allowed "
    "(Delta mergeSchema/Iceberg add-column semantics). Old data files "
    "are immutable and untouched: reads mergeSchema the heterogeneous "
    "footers, materialize columns missing from every planned file as "
    "typed NULLs, and pin the manifest's column order, so readers of "
    "any version see one coherent schema. At 100 TB this is what makes "
    "adding a column O(1) metadata instead of a table rewrite. "
    "Enforcement/refusal/type-change/pruned-read interplay pinned in "
    "tests/test_snapshots.py.",
)
def x73_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x73_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.append(d.filter(F.col("doc_id") < 150).select("doc_id", "source"), root)
    S.append(
        d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)).select(
            "doc_id", "source", "n_chars"
        ),
        root,
        evolve=True,
    )
    return (
        S.read_snapshot(spark, root)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("n_chars").cast("long").alias("n_with_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X86 — co-purchase graph triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------


@register(
    "x86_copurchase_triangles",
    oracle="""
    -- per-part triangle participation in the co-purchase graph: nodes
    -- are parts, an edge links two parts that ever share an order, a
    -- triangle is three mutually co-purchased parts. The oracle uses
    -- the NAIVE id-ordering construction (a < b < c); the engine runs
    -- the degree-ordered forward algorithm -- the triangle SET is
    -- orientation-invariant, so the hashes must agree, which pins the
    -- orientation logic itself.
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY node ORDER BY node
    """,
    doc="X86 distributed triangle counting (operators/graph.py) over "
    "the co-purchase graph (parts sharing an order, the graph reading "
    "of the reference's group->member fan-out, extract.py:56-78). "
    "Edges: one self-join on the order key (<= C(7,2) pairs/order). "
    "Triangles: Suri-Vassilvitskii degree-ordered orientation -- "
    "wedges enumerated only at each edge's (degree,id)-minimal "
    "endpoint, sum_v C(outdeg(v),2) work with outdeg O(sqrt(m)) on "
    "hubs, closed by an equi-join back to the oriented edge set; no "
    "cartesian step, no broadcast of anything unbounded. The oracle "
    "deliberately uses the naive id-ordering: identical triangle set, "
    "so the hash pins orientation-invariance. K4/planted fixtures in "
    "tests/test_graph.py.",
)
def x86_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.graph import (
        cooccurrence_edges,
        triangle_participation,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=1)
    return (
        triangle_participation(edges)
        .select("node", F.col("n_triangles").cast("long").alias("n_triangles"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# X87 — runtime Bloom-filter-pruned shuffle join
# ---------------------------------------------------------------------------


@register(
    "x87_bloom_pruned_join",
    oracle="""
    -- revenue per EUROPE supplier. The ENGINE side must answer this
    -- with a runtime Bloom filter injected on the fact scan (asserted
    -- in-plan: the query function fails if might_contain is absent) --
    -- the filter is pruning-only, so the answer equals this plain join.
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY s_name ORDER BY s_name
    """,
    doc="X87 runtime Bloom-filter semi-join pruning: when the dim side "
    "is too big to broadcast (forced here with "
    "autoBroadcastJoinThreshold=-1 -- the 100 TB regime where the "
    "filtered dim is GBs), Spark's InjectRuntimeFilter plants a "
    "bloom_filter_agg subquery over the dim keys and a might_contain "
    "guard on the fact scan, so the shuffle ships only probably-"
    "matching fact rows -- at a 1/5 region selectivity that is ~80% "
    "less fact shuffle for one compact bitset broadcast. The query fn "
    "ASSERTS might_contain is in the optimized plan (a silent "
    "fallback to an unfiltered shuffle is a perf cliff, so provenance "
    "is a checked value, as with x85) and materializes under the "
    "forced-shuffle confs before restoring them. False-positive "
    "semantics: bloom passes extra rows, the join drops them -- "
    "result-identical to the plain join, which is what the oracle "
    "hash-pins. Plan shape also pinned in tests/test_relational.py.",
)
def x87_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    bloom_confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old: dict[str, str | None] = {}
    for k, v in bloom_confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            old[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        sup = load_table(spark, sf_dir, "supplier")
        nat = load_table(spark, sf_dir, "nation")
        reg = load_table(spark, sf_dir, "region")
        dim = (
            sup.join(nat, sup.s_nationkey == nat.n_nationkey)
            .join(reg, nat.n_regionkey == reg.r_regionkey)
            .where(F.col("r_name") == "EUROPE")
            .select("s_suppkey", "s_name")
        )
        res = (
            li.join(dim, li.l_suppkey == dim.s_suppkey)
            .groupBy("s_name")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                )
                .cast("double")
                .alias("revenue"),
            )
        )
        optimized = res._jdf.queryExecution().optimizedPlan().toString()
        if "might_contain" not in optimized:  # the injection IS the operator
            raise AssertionError("runtime bloom filter was not injected")
        # execute under the forced-shuffle confs, then restore them
        return res.orderBy("s_name").localCheckpoint()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# X88 — file-pruned copy-on-write MERGE (r7 verdict task 1: the flagged
# scale defect — merge_commit used to rewrite the whole table per batch)
# ---------------------------------------------------------------------------


@register(
    "x88_merge_file_pruned",
    oracle="""
    -- the table is three single-file appends with disjoint doc_id
    -- ranges ([0,100) [100,200) [200,300)) and per-file min/max stats;
    -- the merge batch updates keys in [120,180) and inserts keys >= 1e6,
    -- so its key range [120, 1000009] can intersect files 2 and 3 but
    -- NOT file 1 — copy-on-write rewrites only those, carrying file 1's
    -- reference into the child manifest unchanged (n_files_carried = 1,
    -- computed from the two manifests' intersection). The merged CONTENT
    -- is layout-invariant — exactly this plain merge:
    WITH base AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id < 300
    )
    SELECT CAST(1 AS BIGINT) AS n_files_carried, doc_id, source, n_chars
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id >= 120 AND doc_id < 180 THEN 'UPD'
                  ELSE source END AS source,
             n_chars
      FROM base
      UNION ALL
      SELECT doc_id + 1000000, 'NEW', n_chars FROM base WHERE doc_id < 10
    )
    ORDER BY doc_id
    """,
    doc="X88 file-pruned copy-on-write MERGE (operators/snapshots.py::"
    "merge_commit prune_on=): the Delta/Iceberg COW shape — anti-join "
    "the source key range against the per-file min/max stats already in "
    "the manifest (the x76 machinery), read+merge+rewrite ONLY files "
    "that can contain matched keys, union every other file reference "
    "(and its stats) into the child manifest untouched. Sound because a "
    "matched key lies inside both the source range and its file's "
    "recorded range; NULL-key source rows never match and insert. At "
    "100 TB a 1 GB keyed batch rewrites the files holding its keys plus "
    "one manifest — not the table (the r7-flagged scale defect). The "
    "oracle pins the layout-invariant merged content AND the carried "
    "count (files(v_child) ∩ files(v_parent), read from the manifests); "
    "byte-identical carried refs/stats are pinned in "
    "tests/test_snapshots.py. Replaces reference extract.py:115-132's "
    "whole-file rewrite with transactional, pruned semantics.",
)
def x88_merge_file_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x88_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for lo in (0, 100, 200):  # three files with disjoint key ranges + stats
        S.append(
            d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)).coalesce(1),
            root,
            stats_cols=["doc_id"],
        )
    v_parent = S.latest_version(spark, root)
    parent_files = set(S._read_manifest(spark, root, v_parent)["files"])
    updates = d.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 180)).withColumn(
        "source", F.lit("UPD")
    )
    inserts = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("NEW").alias("source"),
        "n_chars",
    )
    v_child = S.merge_commit(
        root,
        updates.unionByName(inserts),
        keys=["doc_id"],
        when_matched_update={
            c: F.col(f"s.{c}") for c in ("doc_id", "source", "n_chars")
        },
        prune_on="doc_id",
    )
    child_files = set(S._read_manifest(spark, root, v_child)["files"])
    n_carried = len(parent_files & child_files)
    return (
        S.read_snapshot(spark, root, v_child)
        .select(
            F.lit(n_carried).cast("long").alias("n_files_carried"),
            "doc_id",
            "source",
            "n_chars",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X89 — lexicon sentiment (the last SURVEY §2.12 X4 named sub-feature)
# ---------------------------------------------------------------------------


@register(
    "x89_lexicon_sentiment",
    oracle="""
    -- ±1-weighted lexicon join over regexp tokens with LAG-based
    -- negation flip ("not good" scores negative); a deterministic
    -- planted suffix per doc_id%4 guarantees every polarity class and
    -- the negated-phrase path are exercised on top of the fixture
    -- text's own hits (fast/slow are lexicon members on purpose).
    WITH d2 AS (
      SELECT doc_id,
             text || CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN ' good good'
                       WHEN 1 THEN ' not good'
                       WHEN 2 THEN ' bad'
                       ELSE '' END AS text2
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(arr) AS tok,
             unnest(range(1, len(arr) + 1)) AS pos
      FROM (SELECT doc_id, regexp_extract_all(lower(text2), '[a-z]+') AS arr
            FROM d2)
    ),
    lex(word, weight) AS (VALUES
      ('good', 1), ('great', 1), ('excellent', 1), ('love', 1),
      ('happy', 1), ('best', 1), ('wonderful', 1), ('amazing', 1),
      ('fast', 1), ('reliable', 1),
      ('bad', -1), ('terrible', -1), ('awful', -1), ('hate', -1),
      ('sad', -1), ('worst', -1), ('horrible', -1), ('slow', -1),
      ('broken', -1), ('unreliable', -1)
    ),
    scored AS (
      SELECT t.doc_id,
             COALESCE(l.weight, 0)
               * CASE WHEN LAG(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos)
                        IN ('not', 'no', 'never', 'without', 'hardly')
                      THEN -1 ELSE 1 END AS signed
      FROM tok t LEFT JOIN lex l ON t.tok = l.word
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN signed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN signed < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           CAST(SUM(signed) AS BIGINT) AS score,
           CASE WHEN SUM(signed) > 0 THEN 'positive'
                WHEN SUM(signed) < 0 THEN 'negative'
                ELSE 'neutral' END AS label
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc="X89 lexicon sentiment (functions/text.py::lexicon_sentiment): "
    "SURVEY §2.12's 'simple lexicon sentiment via map-literal join' "
    "(PAPERS.md:5, EDBT in-database text analytics) — the last named "
    "X4 sub-feature. Tokens broadcast-hash-join a driver-literal "
    "±1-weighted lexicon (same plan shape up to real 100k-word "
    "lexicons: dim broadcasts, tokens stream); negation is one LAG "
    "window at per-document width flipping a hit whose preceding token "
    "is a negator; per-doc aggregate emits counts, signed score, and a "
    "3-way label. All built-in expressions — regexp tokenize, "
    "broadcast join, window, aggregate — zero Python per token. The "
    "planted per-doc_id%4 suffix makes every branch (positive, "
    "negated-positive, negative, neutral) oracle-checked; planted "
    "phrase tests in tests/test_text.py.",
)
def x89_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.functions.text import lexicon_sentiment

    d = load_table(spark, sf_dir, "documents")
    suffix = F.element_at(
        F.array(F.lit(" good good"), F.lit(" not good"), F.lit(" bad"), F.lit("")),
        F.pmod("doc_id", F.lit(4)).cast("int") + 1,
    )
    d2 = d.select("doc_id", F.concat("text", suffix).alias("text"))
    return lexicon_sentiment(d2, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# X90 — TIMESTAMP AS OF time travel (r7 verdict task 3)
# ---------------------------------------------------------------------------


@register(
    "x90_snapshot_as_of_ts",
    oracle="""
    -- v1 = docs < 100 (overwrite), v2 = [100,200) appended. The query
    -- reads back each manifest's committed_at and resolves three
    -- TIMESTAMP AS OF reads: exactly ca1 -> v1 (<= boundary), exactly
    -- ca2 -> v2, and the midpoint between commits -> still v1 (newest
    -- version committed at-or-before the timestamp). Content per
    -- resolved version is exactly:
    SELECT read_tag, doc_id, source, n_chars FROM (
      SELECT 'at_ca1' AS read_tag, doc_id, source, n_chars
      FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT 'mid', doc_id, source, n_chars
      FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT 'at_ca2', doc_id, source, n_chars
      FROM documents WHERE doc_id < 200
    )
    ORDER BY read_tag, doc_id
    """,
    doc="X90 TIMESTAMP AS OF time travel (operators/snapshots.py::"
    "version_as_of + read_snapshot(as_of_ts=)): resolves a timestamp to "
    "the newest RETAINED version with committed_at <= ts — the half of "
    "the time-travel contract VERSION AS OF (x69) lacked. Refuses "
    "timestamps that predate the table or whose governing version was "
    "vacuumed (a silent nearest-newer answer would be wrong; Delta "
    "raises identically). The query derives its probe timestamps from "
    "the manifests themselves (exact-boundary, and mid-gap), so the "
    "oracle is clock-free and deterministic; refusal boundaries and "
    "ts-bounded change feeds (read_incremental since_ts/to_ts) are "
    "pinned in tests/test_snapshots.py.",
)
def x90_snapshot_as_of_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x90_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    v1 = S.overwrite(d.filter(F.col("doc_id") < 100), root)
    v2 = S.append(
        d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)), root
    )
    ca1 = S._read_manifest(spark, root, v1)["committed_at"]
    ca2 = S._read_manifest(spark, root, v2)["committed_at"]
    out = None
    for tag, ts in (("at_ca1", ca1), ("mid", (ca1 + ca2) / 2), ("at_ca2", ca2)):
        snap = S.read_snapshot(spark, root, as_of_ts=ts).select(
            F.lit(tag).alias("read_tag"), "doc_id", "source", "n_chars"
        )
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("read_tag", "doc_id")


# ---------------------------------------------------------------------------
# X91 — transactional snapshot compaction (r7 verdict task 5)
# ---------------------------------------------------------------------------


@register(
    "x91_snapshot_compaction",
    oracle="""
    -- three single-file sliver appends (the shape st22/st23 streaming
    -- sinks produce) compacted into ONE file as a layout-only 'replace'
    -- version: same rows (this SELECT — layout-invariant), file count
    -- 3 -> 1 (manifest-counted literals), prior version still readable
    -- (n_rows_pre, counted through the PRE-compact manifest after the
    -- compact committed).
    SELECT CAST(3 AS BIGINT) AS pre_file_count,
           CAST(1 AS BIGINT) AS post_file_count,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id < 300) AS BIGINT)
             AS n_rows_pre,
           doc_id, source, n_chars
    FROM documents WHERE doc_id < 300
    ORDER BY doc_id
    """,
    doc="X91 transactional compaction (operators/snapshots.py::compact): "
    "OPTIMIZE through the manifest — rewrite the latest version's "
    "sliver files into target_file_count files and publish as a "
    "layout-only 'replace' commit: same rows, same schema, per-file "
    "min/max stats recomputed for every tracked column, old versions "
    "still readable, slivers reclaimable by the next vacuum. The "
    "maintenance job that keeps a streaming-fed table (st22/st23: one "
    "small-file version per micro-batch) scannable at 100 TB, where "
    "per-file open/schedule overhead otherwise dominates. Incremental "
    "readers refuse ranges crossing the replace (a file-diff consumer "
    "would double-count rewritten rows) — pinned with idempotence "
    "(second compact is a no-op, not churn) and vacuum-after-compact "
    "reachability in tests/test_snapshots.py.",
)
def x91_snapshot_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x91_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for lo in (0, 100, 200):
        S.append(
            d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)).coalesce(1),
            root,
            stats_cols=["doc_id"],
        )
    v_pre = S.latest_version(spark, root)
    pre_files = len(S._read_manifest(spark, root, v_pre)["files"])
    v_post = S.compact(spark, root)
    post_files = len(S._read_manifest(spark, root, v_post)["files"])
    n_rows_pre = S.read_snapshot(spark, root, v_pre).count()  # still readable
    return (
        S.read_snapshot(spark, root, v_post)
        .select(
            F.lit(pre_files).cast("long").alias("pre_file_count"),
            F.lit(post_files).cast("long").alias("post_file_count"),
            F.lit(n_rows_pre).cast("long").alias("n_rows_pre"),
            "doc_id",
            "source",
            "n_chars",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X92 — partition-valued snapshot tables (r7 verdict task 7)
# ---------------------------------------------------------------------------


@register(
    "x92_partitioned_snapshot",
    oracle="""
    -- events written as a snapshot table declared partitioned on
    -- event_type (Hive col=val layout, spec in the manifest; one task
    -- -> one file per partition value). A pruned read for the
    -- alphabetically-first type plans exactly 1 of count(distinct
    -- event_type) files from PATH VALUES alone — no stats, no file
    -- opens — and its residual-filtered rows equal this plain filter:
    WITH t AS (SELECT MIN(event_type) AS pt FROM events
               WHERE event_type IS NOT NULL)
    SELECT CAST(1 AS BIGINT) AS files_planned,
           CAST((SELECT COUNT(DISTINCT event_type) FROM events
                 WHERE event_type IS NOT NULL) AS BIGINT) AS files_total,
           event_id, event_type, value
    FROM events, t WHERE event_type = t.pt
    ORDER BY event_id
    """,
    doc="X92 partition-valued snapshot tables (operators/snapshots.py "
    "partition_by= / partition_spec): the declared-partition-column "
    "contract Delta/Iceberg tables carry — appends must match the "
    "spec, file paths embed col=val, readers reconstruct the column "
    "per data dir via basePath, and read_snapshot_pruned drops whole "
    "partitions from PATH values with zero stats consultation (the "
    "cheapest pruning there is: a predicate on the partition column "
    "never opens a footer). Gives streaming snapshot sinks a natural "
    "bucketing and makes time/tenant-partitioned 100 TB layouts "
    "first-class. Spec enforcement, merge-through-partitioning, and "
    "unpartitioned-table invariance are pinned in "
    "tests/test_snapshots.py.",
)
def x92_partitioned_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_id", "event_type", "value")
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x92_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.overwrite(ev.repartition(1), root, partition_by="event_type")
    pt = ev.agg(F.min("event_type")).first()[0]
    sub, planned, total = S.read_snapshot_pruned(spark, root, "event_type", pt, pt)
    return (
        sub.filter(F.col("event_type") == pt)  # residual: pruning is a superset
        .select(
            F.lit(planned).cast("long").alias("files_planned"),
            F.lit(total).cast("long").alias("files_total"),
            "event_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# X93 — merge-on-read with equality deletion vectors (the write-cheap
# complement to x88's copy-on-write MERGE)
# ---------------------------------------------------------------------------


@register(
    "x93_mor_upsert_delete",
    oracle="""
    -- merge-on-read over a 3-file base ([0,100) [100,200) [200,300)):
    --   v4 mor_upsert  keys [50,150) -> 'MOR', + inserts doc_id+2e6
    --   v5 mor_delete  doc_id % 10 = 0 (doc_id < 300 keys only)
    --   v6 mor_upsert  doc_id = 60 -> 'BACK' (re-inserts a deleted key)
    -- No base data file is ever rewritten (n_base_files_kept = 3, from
    -- the manifests' file-set intersection): each commit adds only new
    -- row files and/or an equality-delete key file with a sequence
    -- number; the read anti-joins deletes against strictly-older files,
    -- so v5's delete erases the v4 'MOR' rows it postdates while v6's
    -- 'BACK' row (newer than the delete) survives. Content equals this
    -- plain evaluation of the same three steps:
    WITH base AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id < 300
    ),
    v4 AS (
      SELECT doc_id,
             CASE WHEN doc_id >= 50 AND doc_id < 150 THEN 'MOR'
                  ELSE source END AS source,
             n_chars
      FROM base
      UNION ALL
      SELECT doc_id + 2000000, 'NEW2', n_chars FROM base WHERE doc_id < 5
    ),
    v5 AS (SELECT * FROM v4 WHERE NOT (doc_id % 10 = 0 AND doc_id < 300)),
    v6 AS (
      SELECT * FROM v5
      UNION ALL
      SELECT doc_id, 'BACK', n_chars FROM base WHERE doc_id = 60
    )
    SELECT CAST(3 AS BIGINT) AS n_base_files_kept, doc_id, source, n_chars
    FROM v6 ORDER BY doc_id
    """,
    doc="X93 merge-on-read mutations (operators/snapshots.py::mor_upsert/"
    "mor_delete/_live_view): Iceberg v2 equality deletes / Delta deletion "
    "vectors — a keyed DELETE or UPSERT commits O(batch) new files (row "
    "files and/or a small delete-key file) with a sequence number, never "
    "reading or rewriting existing data; reads apply the pending deletes "
    "as ONE key-equality anti-join with a `dseq > seq` residual, so a "
    "delete erases matching keys only from strictly-older files and a "
    "same-commit upsert never eats its own inserts. compact() is the "
    "delete materializer (folds survivors into plain files and clears "
    "the list). At 100 TB this turns 'delete 1k users from a million-"
    "file table' from a multi-hour copy-on-write rewrite into one "
    "metadata commit, with read cost bounded by compaction cadence. The "
    "oracle pins the seq-ordering semantics through an upsert->delete->"
    "re-upsert chain AND the zero-rewrite invariant (base file refs "
    "survive every commit, counted from manifest intersection); "
    "concurrency/vacuum/rollback edges in tests/test_snapshots.py. "
    "Replaces reference extract.py:115-132's whole-file rewrite with "
    "O(changed-keys) writes.",
)
def x93_mor_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    base = d.filter(F.col("doc_id") < 300)
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x93_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for lo in (0, 100, 200):  # three immutable base files
        S.append(
            base.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)).coalesce(1),
            root,
            stats_cols=["doc_id"],
        )
    base_files = set(S._read_manifest(spark, root, S.latest_version(spark, root))["files"])
    updates = base.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 150)).withColumn(
        "source", F.lit("MOR")
    )
    inserts = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.lit("NEW2").alias("source"),
        "n_chars",
    )
    S.mor_upsert(updates.unionByName(inserts), root, keys=["doc_id"])
    S.mor_delete(
        base.filter(F.col("doc_id") % 10 == 0).select("doc_id"), root, keys=["doc_id"]
    )
    v6 = S.mor_upsert(
        base.filter(F.col("doc_id") == 60).select(
            "doc_id", F.lit("BACK").alias("source"), "n_chars"
        ),
        root,
        keys=["doc_id"],
    )
    kept = len(base_files & set(S._read_manifest(spark, root, v6)["files"]))
    return (
        S.read_snapshot(spark, root, v6)
        .select(
            F.lit(kept).cast("long").alias("n_base_files_kept"),
            "doc_id",
            "source",
            "n_chars",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X94 — Z-order clustered compaction (OPTIMIZE ZORDER BY through the
# snapshot manifest: x51's layout primitive wired into x91's compactor)
# ---------------------------------------------------------------------------


@register(
    "x94_zorder_compaction",
    oracle="""
    -- orders written as 8 files split on o_orderkey % 8 — every file
    -- spans the FULL (custkey, order-day) space, so a custkey-range
    -- pruned read must plan all 8 (pre_planned = 8). compact(cluster_by=
    -- [o_custkey, day_i]) rewrites them Morton-ordered; afterwards each
    -- file covers a small rectangle, so narrow range reads on EITHER
    -- clustered column plan strictly fewer than 8 files (the booleans)
    -- while pruning stays a superset: the residual-filtered counts out
    -- of the pruned reads equal these plain filters, and the rewritten
    -- table's content is unchanged (n_rows / sum_price).
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             datediff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day_i,
             o_totalprice
      FROM orders
    ),
    b AS (
      SELECT MIN(o_custkey) AS clo, MAX(o_custkey) AS chi,
             MIN(day_i) AS dlo, MAX(day_i) AS dhi
      FROM o
    )
    SELECT CAST(8 AS BIGINT) AS files_total,
           CAST(8 AS BIGINT) AS pre_planned,
           TRUE AS cust_pruned,
           TRUE AS day_pruned,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CASE WHEN o_custkey <= (SELECT clo + (chi - clo) // 10 FROM b)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_cust,
           CAST(SUM(CASE WHEN day_i <= (SELECT dlo + (dhi - dlo) // 10 FROM b)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_day
    FROM o
    """,
    doc="X94 Z-order clustered compaction (operators/snapshots.py::"
    "compact cluster_by= — x51's Morton-key layout primitive driving "
    "x91's transactional OPTIMIZE): rows are equal-width-bucketized per "
    "clustered column (one bounded 2-value aggregate for the bounds), "
    "range-partitioned and sorted on the static codegen'd bit "
    "interleave, and republished as a layout-only replace version whose "
    "per-file min/max stats now prune MULTI-column predicates — the "
    "Delta/Iceberg OPTIMIZE ZORDER BY. The one exchange is the range "
    "partition the rewrite needs anyway to control file count; no UDF, "
    "no extra pass. The oracle pins content invariance, pre-compact "
    "non-prunability (8/8 planned), post-compact prunability on BOTH "
    "columns, and pruning's superset guarantee (residual-filtered "
    "counts equal plain filters). Old versions stay readable "
    "(tests/test_snapshots.py).",
)
def x94_zorder_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_i"),
        "o_totalprice",
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x94_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for k in range(8):  # 8 files, each spanning the full clustered space
        S.append(
            o.filter(F.col("o_orderkey") % 8 == k).coalesce(1),
            root,
            stats_cols=["o_custkey", "day_i"],
        )
    clo, chi, dlo, dhi = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("day_i"), F.max("day_i")
    ).first()
    cust_hi = clo + (chi - clo) // 10
    day_hi = dlo + (dhi - dlo) // 10
    _, pre_planned, total = S.read_snapshot_pruned(spark, root, "o_custkey", clo, cust_hi)
    S.compact(spark, root, target_file_count=8, cluster_by=["o_custkey", "day_i"])
    full = S.read_snapshot(spark, root)
    cdf, c_planned, c_total = S.read_snapshot_pruned(spark, root, "o_custkey", clo, cust_hi)
    ddf, d_planned, d_total = S.read_snapshot_pruned(spark, root, "day_i", dlo, day_hi)
    n_cust = cdf.filter(F.col("o_custkey") <= cust_hi).count()  # residual
    n_day = ddf.filter(F.col("day_i") <= day_hi).count()
    return full.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    ).select(
        F.lit(total).cast("long").alias("files_total"),
        F.lit(pre_planned).cast("long").alias("pre_planned"),
        F.lit(bool(c_planned < c_total)).alias("cust_pruned"),
        F.lit(bool(d_planned < d_total)).alias("day_pruned"),
        "n_rows",
        "sum_price",
        F.lit(n_cust).cast("long").alias("n_rows_cust"),
        F.lit(n_day).cast("long").alias("n_rows_day"),
    )


# ---------------------------------------------------------------------------
# X95 — fixed-iteration PageRank (iterative graph fixpoint as K chained
# join+aggregate rounds; oracle = the recurrence unrolled in SQL)
# ---------------------------------------------------------------------------


def _pagerank_oracle(iterations: int = 5) -> str:
    step = """
r{k} AS (
  SELECT n.node,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM p)
         + CAST(0.85 AS DOUBLE) * COALESCE(SUM(r.pr / od.deg), 0) AS pr
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN od ON od.src = e.src
  LEFT JOIN r{km1} r ON r.node = e.src
  GROUP BY n.node
)"""
    return (
        """
    -- PageRank recurrence unrolled: r_k(v) = 0.15/N + 0.85 * sum of
    -- r_{k-1}(u)/outdeg(u) over in-edges (u,v); 5 rounds over the
    -- customer->order co-occurrence graph (keys folded mod 512).
    WITH e AS (SELECT DISTINCT o_custkey % 512 AS src,
                               o_orderkey % 512 AS dst FROM orders),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    p AS (SELECT COUNT(*) AS n FROM nodes),
    od AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM p) AS pr FROM nodes),"""
        + ",".join(step.format(k=k, km1=k - 1) for k in range(1, iterations + 1))
        + f"""
    SELECT node, ROUND(pr, 6) AS pr_r FROM r{iterations} ORDER BY node
    """
    )


@register(
    "x95_pagerank",
    oracle=_pagerank_oracle(),
    doc="X95 fixed-iteration PageRank (operators/graph.py::pagerank): "
    "the canonical iterative graph fixpoint, expressed as K=5 chained "
    "rounds of ONE edge-join on src + ONE aggregate on dst — the "
    "Python loop builds the plan, Spark executes bounded-depth chained "
    "stages; edges+outdeg computed once and cached; at 100 TB the edge "
    "relation is bucketed on src so each round moves only the O(nodes) "
    "rank vector. Dangling mass is ignored (the SQL-expressible "
    "variant), which is what makes every round — and therefore the "
    "whole fixpoint — DuckDB-checkable: the oracle unrolls the exact "
    "recurrence 5 times over the same customer->order graph (keys "
    "folded mod 512) and both engines round to 6 dp. Generalizes the "
    "reference's group->member fan-out walk (extract.py:56-78) to a "
    "whole-graph fixpoint.",
)
def x95_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_custkey") % 512).alias("src"),
        (F.col("o_orderkey") % 512).alias("dst"),
    )
    pr = pagerank(edges, iterations=5, damping=0.85)
    return pr.select("node", F.round("pr", 6).alias("pr_r")).orderBy("node")


# ---------------------------------------------------------------------------
# X96 — Pareto skyline data selection (multi-objective curation: keep the
# documents nothing else beats on BOTH axes)
# ---------------------------------------------------------------------------


@register(
    "x96_pareto_skyline",
    oracle="""
    -- skyline (maximize length AND lexical diversity): a doc survives
    -- iff no other doc is >= on both axes and > on at least one.
    WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
                      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS b
               FROM documents)
    SELECT t.doc_id, t.a AS n_chars_obj, t.b AS n_distinct_obj FROM m t
    WHERE NOT EXISTS (SELECT 1 FROM m o
                      WHERE o.a >= t.a AND o.b >= t.b
                        AND (o.a > t.a OR o.b > t.b))
    ORDER BY t.doc_id
    """,
    doc="X96 Pareto skyline selection (operators/selection.py::"
    "pareto_skyline): multi-objective curation — keep the documents no "
    "other document beats on BOTH (length, lexical diversity); the "
    "skyline query of the BNL/SFS literature, generalizing the "
    "reference's single-column threshold filters (extract.py:53-61). "
    "Fully distributed, no O(n^2) pass and no single-partition scan "
    "over data: same-x domination collapses via groupBy-max (one "
    "shuffle), equal-width buckets of the x-axis prune via a B-row "
    "suffix-max summary (window over a CONSTANT-size frame, broadcast "
    "back), and the SFS running-max scan runs as a window partitioned "
    "PER BUCKET. The oracle is the quadratic NOT EXISTS dominance "
    "definition — algorithm-independent ground truth.",
)
def x96_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.selection import pareto_skyline

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars_obj"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_distinct_obj"),
    )
    return pareto_skyline(d, "n_chars_obj", "n_distinct_obj").select(
        "doc_id", "n_chars_obj", "n_distinct_obj"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X97 — exact duplicated n-gram SPAN coverage (sub-document exact-substring
# dedup: which token spans are repeated corpus-wide, per document)
# ---------------------------------------------------------------------------


@register(
    "x97_dup_span_coverage",
    oracle="""
    -- positions covered by an 8-gram occurring >= 2 times corpus-wide;
    -- the oracle unions positions the dumb way (DISTINCT over an
    -- exploded range) — algorithm-independent of the engine's
    -- interval-merge implementation.
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    t AS (SELECT doc_id, len(toks) AS n, toks FROM d),
    sh AS (SELECT doc_id, n, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS sh
           FROM t, UNNEST(range(0, n - 7)) AS u(i) WHERE n >= 8),
    dup AS (SELECT doc_id, pos FROM
            (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY sh) AS c FROM sh)
            WHERE c >= 2),
    cov AS (SELECT doc_id, COUNT(DISTINCT p) AS covered
            FROM dup, UNNEST(range(pos, pos + 8)) AS v(p) GROUP BY doc_id)
    SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
           CAST(COALESCE(cov.covered, 0) AS BIGINT) AS dup_covered,
           ROUND(CAST(COALESCE(cov.covered, 0) AS DOUBLE) / t.n, 6) AS dup_ratio_r
    FROM t LEFT JOIN cov USING(doc_id) ORDER BY t.doc_id
    """,
    doc="X97 duplicated n-gram span coverage (operators/dedup.py::"
    "dup_span_coverage): the span-level half of exact-substring "
    "training-data dedup — per document, how many token positions sit "
    "inside an 8-gram repeated anywhere in the corpus. Positional "
    "shingles from one static transform(sequence(...)) expression "
    "(codegen'd, zero UDF), occurrence counts via ONE shuffle on the "
    "shingle (xxhash64 it at 100 TB to cut shuffle bytes), and "
    "coverage by gaps-and-islands interval merge — O(duplicated "
    "shingles) window rows, not the O(tokens) position explode the "
    "oracle deliberately uses as its independent ground truth. "
    "Sub-document refinement of the reference's whole-row dedup "
    "(extract.py:115-132).",
)
def x97_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.dedup import dup_span_coverage

    d = load_table(spark, sf_dir, "documents")
    return dup_span_coverage(d, "doc_id", "text", n=8, min_count=2).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X98 — time-weighted average over irregular samples (TWAP). x83's EWMA
# weights by sample COUNT; a sensor/price stream sampled at irregular
# intervals needs weighting by HOLDING TIME: each observation holds until
# the next one arrives.
# ---------------------------------------------------------------------------


@register(
    "x98_time_weighted_avg",
    oracle="""
    -- duration-weighted mean per user: each value holds from its ts to
    -- the next event's ts (LEAD over the (ts, event_id) total order);
    -- the last observation has no holding interval and carries zero
    -- weight. All arithmetic exact until the final division: durations
    -- are epoch-MICROSECOND bigints, values quantize to DECIMAL(18,6)
    -- (the repo-wide convention), and the weighted sum accumulates in
    -- DECIMAL — double SUMs re-associate differently across engines and
    -- are NOT hash-safe.
    WITH o AS (
      SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
             epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us,
           ROUND(CAST(SUM(v * (t_next - t)) AS DOUBLE)
                 / CAST(MAX(t) - MIN(t) AS DOUBLE), 6) AS twap_r
    FROM o
    GROUP BY user_id
    HAVING MAX(t) > MIN(t)
    ORDER BY user_id
    """,
    doc="X98 time-weighted average (TWAP) over irregularly-sampled "
    "per-user event streams: LEAD over the (ts, event_id) total order "
    "gives each observation its holding duration; the weighted mean is "
    "sum(v*dur)/span. One shuffle on user_id shared by the window AND "
    "the aggregate (the sort-based window's hash partitioning satisfies "
    "the groupBy's distribution — no second exchange), all codegen'd "
    "built-ins. Exactness: durations are epoch-us BIGINTs, values "
    "quantized to DECIMAL(18,6), the weighted sum accumulated in exact "
    "DECIMAL, one double division at the end — bit-identical across "
    "engines (double-SUM re-association is the trap this avoids). "
    "Extends the reference's rrdexport averaging (url_service_status_"
    "InfluxDB_insert.py:110-127), which assumes regular sampling.",
)
def x98_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    )
    return (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            (F.max("t") - F.min("t")).cast("long").alias("span_us"),
            F.round(
                F.sum(F.col("v") * (F.col("t_next") - F.col("t"))).cast("double")
                / (F.max("t") - F.min("t")).cast("double"),
                6,
            ).alias("twap_r"),
        )
        .filter(F.col("span_us") > 0)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X99 — write-audit-publish (WAP): stage -> audit -> abort/publish over the
# snapshot table layer (Iceberg's stage-only commit + cherry-pick workflow)
# ---------------------------------------------------------------------------


@register(
    "x99_wap_staged_publish",
    oracle="""
    -- WAP round: base = orders < 1000. A BAD batch ([1000,2000) with
    -- prices negated on o_orderkey % 7 = 0) is staged, audited
    -- (positive-price constraint), and ABORTED; a clean batch of the
    -- same keys is staged, audits clean, and publishes. Deterministic
    -- aftermath: the audit counted exactly the planted violations, the
    -- bad batch was never visible (visible-row count at audit time ==
    -- base count), and the final table is base + clean batch with the
    -- ORIGINAL prices (the negated ones died with the abort).
    SELECT
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_orderkey >= 1000 AND o_orderkey < 2000
              AND o_orderkey % 7 = 0) AS BIGINT) AS n_bad_violations,
      CAST(0 AS BIGINT) AS n_clean_violations,
      CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey < 1000) AS BIGINT)
        AS n_visible_during_stage,
      o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
    doc="X99 write-audit-publish (operators/snapshots.py::stage_append/"
    "read_staged/publish_staged/abort_staged): a batch lands as a "
    "STAGED manifest outside the version chain — invisible to every "
    "reader, time-travel, change-feed and tailing stream — while the "
    "audit (here an x80-style accepted-range constraint over the "
    "would-be table) runs against read_staged; a failing audit aborts "
    "(files deleted, history never shows the batch), a passing one "
    "publishes atomically via the same create-if-absent commit, "
    "re-parented onto the current latest (appends commute), with the "
    "stage_id recorded for idempotent retry. gc_orphans treats staged "
    "files as pending work, not orphans. The quality gate the "
    "reference applies row-by-row inside its ETL (extract.py:53-61) "
    "lifted to TRANSACTIONAL batch promotion. Race/rebase/idempotence/"
    "GC contracts pinned in tests/test_snapshots.py.",
)
def x99_wap_staged_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") < 1000)
    batch = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000))
    bad = batch.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, -F.col("o_totalprice")).otherwise(
            F.col("o_totalprice")
        ),
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x99_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.overwrite(base, root)  # v1

    def audit_violations(stage_id: str) -> int:
        return (
            S.read_staged(spark, root, stage_id)
            .filter(F.col("o_totalprice") <= 0)
            .count()
        )

    S.stage_append(bad, root, "bad-batch")
    n_bad = audit_violations("bad-batch")
    n_visible = S.read_snapshot(spark, root).count()  # batch must NOT show
    S.abort_staged(spark, root, "bad-batch")

    S.stage_append(batch, root, "clean-batch")
    n_clean = audit_violations("clean-batch")
    assert n_clean == 0, "clean batch must audit clean"
    S.publish_staged(spark, root, "clean-batch")

    return (
        S.read_snapshot(spark, root)
        .select(
            F.lit(n_bad).cast("long").alias("n_bad_violations"),
            F.lit(n_clean).cast("long").alias("n_clean_violations"),
            F.lit(n_visible).cast("long").alias("n_visible_during_stage"),
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# X100 — portable register-level HLL (the sketch as a relation). x20's
# DataSketches blobs can only be bounds-checked (DuckDB has no DataSketches);
# these md5-built registers are bit-identical in ANY engine with md5, so the
# whole sketch — every register — hash-checks exactly.
# ---------------------------------------------------------------------------


_HLL_ORACLE = """
    -- md5-register HLL, p=8 (m=256), replicated end-to-end: register
    -- index = first 2 hex chars, rho = 1 + leading zero BITS of the
    -- next 16 hex chars (4 per leading '0' char + a 4-way CASE on the
    -- first non-zero char — no 128-bit arithmetic). The register sum
    -- accumulates as integer DECIMAL(38,0) (each 2^(70-rho) is exact),
    -- so it is association-free; the estimator is one double division
    -- (raw branch) or one ln (linear-counting branch) per group. Both
    -- branches run: 'cust' sketches ~thousands of custkeys (raw),
    -- 'status' sketches 3 values (linear counting).
    WITH src AS (
      SELECT 'cust' AS level, o_orderpriority, CAST(o_custkey AS VARCHAR) AS key
      FROM orders
      UNION ALL
      SELECT 'status', o_orderpriority, o_orderstatus FROM orders
    ),
    h AS (SELECT level, o_orderpriority, md5(key || ':hll') AS h FROM src),
    r AS (SELECT level, o_orderpriority,
            16*(strpos('0123456789abcdef', substr(h,1,1))-1)
              + (strpos('0123456789abcdef', substr(h,2,1))-1) AS reg,
            4*length(regexp_extract(substr(h,3,16), '^0*'))
              + CASE substr(substr(h,3,16),
                            length(regexp_extract(substr(h,3,16), '^0*'))+1, 1)
                  WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                  WHEN '7' THEN 1 ELSE 0 END + 1 AS rho
          FROM h),
    m AS (SELECT level, o_orderpriority, reg, MAX(rho) AS rho
          FROM r GROUP BY level, o_orderpriority, reg),
    g AS (SELECT level, o_orderpriority,
                 256 - COUNT(*) AS v_zero,
                 CAST(SUM(CAST(power(2, 70 - rho) AS DECIMAL(38,0)))
                      + (256 - COUNT(*)) * CAST(power(2, 70) AS DECIMAL(38,0))
                      AS DOUBLE) AS total
          FROM m GROUP BY level, o_orderpriority),
    e AS (SELECT level, o_orderpriority, v_zero,
                 ((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))
                  * 256) * 256 * power(2, 70) / total AS raw
          FROM g),
    x AS (SELECT level, o_orderpriority, v_zero,
                 CASE WHEN raw <= 2.5 * 256 AND v_zero > 0
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / v_zero)
                      ELSE raw END AS est
          FROM e),
    exact AS (
      SELECT 'cust' AS level, o_orderpriority,
             COUNT(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 2
      UNION ALL
      SELECT 'status', o_orderpriority,
             COUNT(DISTINCT o_orderstatus) FROM orders GROUP BY 2
    )
    SELECT x.level, x.o_orderpriority,
           CAST(x.v_zero AS BIGINT) AS v_zero,
           ROUND(x.est, 4) AS est_r,
           CAST(exact.n_exact AS BIGINT) AS n_exact
    FROM x JOIN exact USING (level, o_orderpriority)
    ORDER BY level, o_orderpriority
"""


@register(
    "x100_hll_registers_exact",
    oracle=_HLL_ORACLE,
    doc="X100 portable register-level HLL (operators/sketches.py::"
    "hll_register_rows/hll_estimate): HyperLogLog as a RELATION (group, "
    "register, rho) built from md5 — bit-identical in every engine with "
    "md5, so unlike x20's DataSketches blobs the ENTIRE sketch "
    "hash-checks against DuckDB, register by register, and the estimate "
    "matches to the rounded digit. The relational form is the merge "
    "algebra: rollups, shard unions and micro-batch maintenance are all "
    "groupBy-max — idempotent/commutative/associative, so re-delivery "
    "is free (st24 builds exactly-once distinct-count maintenance on "
    "it). One shuffle bounded at |groups| * 256 rows regardless of data "
    "size, map-side combined. The Spark side deliberately builds "
    "per-(priority, status) PARTIAL sketches and max-merges them to the "
    "priority grain — the oracle computes single-level, pinning merge "
    "losslessness, and both estimator branches (raw harmonic mean, "
    "linear counting) are exercised and checked.",
)
def x100_hll_registers_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import (
        hll_estimate,
        hll_register_rows,
    )

    o = cache_once(load_table(spark, sf_dir, "orders"))

    def sketch(level: str, key: str) -> DataFrame:
        # partial sketches at a FINER grain, then max-merged up: the
        # mergeability the estimate's correctness rests on.
        partial = hll_register_rows(
            o, ["o_orderpriority", "o_orderstatus"], key, p=8
        ).withColumn("level", F.lit(level))
        return partial.groupBy("level", "o_orderpriority", "reg").agg(
            F.max("rho").alias("rho")
        )

    regs = sketch("cust", "o_custkey").unionByName(sketch("status", "o_orderstatus"))
    est = hll_estimate(regs, ["level", "o_orderpriority"], p=8)
    exact = (
        o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").cast("long").alias("n_exact"))
        .withColumn("level", F.lit("cust"))
        .unionByName(
            o.groupBy("o_orderpriority")
            .agg(F.count_distinct("o_orderstatus").cast("long").alias("n_exact"))
            .withColumn("level", F.lit("status"))
        )
    )
    return (
        est.join(exact, ["level", "o_orderpriority"])
        .select(
            "level",
            "o_orderpriority",
            "v_zero",
            F.round("est_distinct", 4).alias("est_r"),
            "n_exact",
        )
        .orderBy("level", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# X101 — integer-lattice k-means (iterative clustering fixpoint; oracle =
# the Lloyd rounds unrolled in SQL, exact because every step is integer)
# ---------------------------------------------------------------------------


def _kmeans_oracle(iterations: int = 3) -> str:
    step = """
a{k} AS (
  SELECT id, x, y, cid FROM (
    SELECT p.id, p.x, p.y, c.cid,
           ROW_NUMBER() OVER (PARTITION BY p.id
             ORDER BY (p.x-c.cx)*(p.x-c.cx)+(p.y-c.cy)*(p.y-c.cy), c.cid) AS rn
    FROM pts p CROSS JOIN c{km1} c) WHERE rn = 1),
c{k} AS (SELECT cid, CAST(SUM(x) // COUNT(*) AS BIGINT) AS cx,
                CAST(SUM(y) // COUNT(*) AS BIGINT) AS cy
         FROM a{k} GROUP BY cid),"""
    rounds = "".join(step.format(k=k, km1=k - 1) for k in range(1, iterations + 1))
    return (
        """
    -- Lloyd's rounds unrolled: assign = lowest-cid integer-distance
    -- argmin (ROW_NUMBER over (dist, cid) — ties identical to the
    -- engine's CASE chain), update = floor-divided lattice centroid.
    -- Exact end-to-end: integer coords, integer distances, integer
    -- division — no float argmin anywhere, which is what makes an
    -- iterative CLUSTERING fixpoint hash-checkable at all.
    WITH pts AS (SELECT o_orderkey AS id, o_orderkey % 97 AS x,
                        o_custkey % 89 AS y FROM orders),
    c0(cid, cx, cy) AS (VALUES (0, 10, 10), (1, 50, 50), (2, 90, 90)),"""
        + rounds
        + f"""
    fin AS (
      SELECT id, x, y, cid FROM (
        SELECT p.id, p.x, p.y, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.id
                 ORDER BY (p.x-c.cx)*(p.x-c.cx)+(p.y-c.cy)*(p.y-c.cy), c.cid) AS rn
        FROM pts p CROSS JOIN c{iterations} c) WHERE rn = 1)
    SELECT f.cid, CAST(COUNT(*) AS BIGINT) AS n_points,
           c.cx, c.cy,
           CAST(SUM((f.x-c.cx)*(f.x-c.cx)+(f.y-c.cy)*(f.y-c.cy)) AS BIGINT)
             AS wcss
    FROM fin f JOIN c{iterations} c USING (cid)
    GROUP BY f.cid, c.cx, c.cy ORDER BY f.cid
    """
    )


@register(
    "x101_kmeans_lattice",
    oracle=_kmeans_oracle(),
    doc="X101 integer-lattice k-means (operators/ml.py::kmeans_lattice): "
    "Lloyd's algorithm as an iterative DataFrame fixpoint — per round "
    "ONE codegen'd CASE assignment against K broadcast centroid "
    "literals and ONE K-row aggregate; only K rows reach the driver "
    "per round (MLlib's own loop shape; the points never shuffle). "
    "The lattice variant (integer coords, integer squared distances, "
    "floor-divided centroids, lowest-id tie-break) is chosen — like "
    "x95's ignore-dangling PageRank — because every step is exact "
    "integer arithmetic, so a DuckDB oracle replays all three rounds "
    "bit-identically; float argmin would ulp-flip assignments. "
    "Empty clusters drop (restart-free standard handling). Closed-form "
    "convergence tests in tests/test_ml.py.",
)
def x101_kmeans_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.ml import kmeans_lattice

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 97).alias("x"),
        (F.col("o_custkey") % 89).alias("y"),
    )
    assigned, cents = kmeans_lattice(o, "x", "y", [(10, 10), (50, 50), (90, 90)], 3)
    cdf = assigned.sparkSession.createDataFrame(cents, "cid int, cx long, cy long")
    return (
        assigned.join(F.broadcast(cdf), "cid")
        .groupBy("cid", "cx", "cy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
            )
            .cast("long")
            .alias("wcss"),
        )
        .select("cid", "n_points", "cx", "cy", "wcss")
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# X102 — mergeable equi-width histogram quantiles (the quantile analog of
# x100: additive bin counts, cross-engine-exact, MV-maintainable)
# ---------------------------------------------------------------------------


@register(
    "x102_hist_quantiles",
    oracle="""
    -- equi-width histogram over o_totalprice in [0, 600000), 128 bins
    -- (out-of-range clamps to the edge bins — no mass dropped), built
    -- per (priority, status) and SUM-merged to priority — additivity is
    -- the point: percentile MVs maintain these counts like any sum.
    -- Quantile = linear interpolation inside the crossing bin; every
    -- double op is replicated in the same order, so the estimate is
    -- bit-identical before the final ROUND.
    WITH b AS (
      SELECT o_orderpriority AS pr,
             CAST(least(greatest(floor((o_totalprice - 0.0) * 128
                                       / (600000.0 - 0.0)), 0), 127) AS INT)
               AS bin
      FROM orders),
    h AS (SELECT pr, bin, COUNT(*) AS n FROM b GROUP BY pr, bin),
    c AS (SELECT pr, bin, n,
                 SUM(n) OVER (PARTITION BY pr ORDER BY bin) AS cum,
                 SUM(n) OVER (PARTITION BY pr) AS tot
          FROM h),
    qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
    hit AS (SELECT pr, q, bin, n, cum, tot,
                   ROW_NUMBER() OVER (PARTITION BY pr, q ORDER BY bin) AS rn
            FROM c CROSS JOIN qs WHERE cum >= q * tot),
    est AS (SELECT pr, q, tot,
                   0.0 + (bin + (q * tot - (cum - n)) / n)
                       * ((600000.0 - 0.0) / 128) AS e
            FROM hit WHERE rn = 1)
    SELECT pr AS o_orderpriority,
           CAST(MAX(tot) AS BIGINT) AS n_total,
           ROUND(MAX(CASE WHEN q = 0.5 THEN e END), 6) AS p50_est_r,
           ROUND(MAX(CASE WHEN q = 0.95 THEN e END), 6) AS p95_est_r
    FROM est GROUP BY pr ORDER BY pr
    """,
    doc="X102 mergeable equi-width histogram quantiles (operators/"
    "sketches.py::hist_bin_counts/hist_quantile): the quantile analog "
    "of x100's relational HLL — bin counts are ADDITIVE rows, so "
    "shard/micro-batch partials re-aggregate by plain SUM (a 'sum' "
    "measure for st23's sink: percentile MVs with no sketch binary), "
    "and every binning/interpolation double op replays in the same "
    "IEEE order cross-engine, so unlike x20's KLL blobs the estimate "
    "hash-checks exactly. The Spark side builds per-(priority, status) "
    "partials and SUM-merges to priority — the oracle bins single-"
    "level, pinning merge losslessness. One shuffle bounded at "
    "|groups| * 128 rows; replaces the global sort exact per-group "
    "percentiles (a7) cost at 100 TB, with error <= one bin width "
    "(bounds-tested in tests/test_sketches.py).",
)
def x102_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import (
        hist_bin_counts,
        hist_quantile,
    )

    o = load_table(spark, sf_dir, "orders")
    lo, hi, bins = 0.0, 600000.0, 128
    partial = hist_bin_counts(
        o, ["o_orderpriority", "o_orderstatus"], "o_totalprice", lo, hi, bins
    )
    merged = partial.groupBy("o_orderpriority", "bin").agg(F.sum("n").alias("n"))
    tot = merged.groupBy("o_orderpriority").agg(
        F.sum("n").cast("long").alias("n_total")
    )
    p50 = hist_quantile(merged, ["o_orderpriority"], 0.5, lo, hi, bins).select(
        "o_orderpriority", F.round("quantile_est", 6).alias("p50_est_r")
    )
    p95 = hist_quantile(merged, ["o_orderpriority"], 0.95, lo, hi, bins).select(
        "o_orderpriority", F.round("quantile_est", 6).alias("p95_est_r")
    )
    return (
        tot.join(p50, "o_orderpriority")
        .join(p95, "o_orderpriority")
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# X103 — zero-copy branches (Iceberg branches / Delta shallow clone):
# divergent version chains over shared data files
# ---------------------------------------------------------------------------


@register(
    "x103_snapshot_branch",
    oracle="""
    -- main = orders < 1000, branched, then the two chains diverge:
    -- [1000,1500) appended to the BRANCH, [2000,2500) to MAIN. Each
    -- side must see exactly its own history; branch creation copied
    -- ZERO data files (n_copied_files, counted from the branch-point
    -- manifest's local refs, is a hash-pinned literal).
    SELECT read_tag, n_copied_files, o_orderkey, o_orderstatus FROM (
      SELECT 'main' AS read_tag, CAST(0 AS BIGINT) AS n_copied_files,
             o_orderkey, o_orderstatus
      FROM orders WHERE o_orderkey < 1000
                     OR (o_orderkey >= 2000 AND o_orderkey < 2500)
      UNION ALL
      SELECT 'branch', CAST(0 AS BIGINT), o_orderkey, o_orderstatus
      FROM orders WHERE o_orderkey < 1500
    )
    ORDER BY read_tag, o_orderkey
    """,
    doc="X103 zero-copy branches (operators/snapshots.py::create_branch/"
    "list_branches): a branch is a full snapshot table whose v1 "
    "manifest references the source's files by relative parent paths — "
    "one manifest write, zero data bytes, however large the table "
    "(Iceberg branches / Delta SHALLOW CLONE). The branch then evolves "
    "with EVERY table operator (append/merge/MoR/compact/time travel) "
    "against its own log; ownership is explicit — branch vacuum/GC "
    "never delete parent-owned refs, compact detaches the branch "
    "entirely, and the documented caveat (source vacuum past the "
    "branch point can break an undetached branch — Delta's own "
    "shallow-clone contract) is pinned in tests/test_snapshots.py "
    "along with divergence, MoR-carry and refusal contracts. The "
    "what-if staging surface (x99 WAP is the one-commit special case; "
    "branches hold arbitrary divergent work).",
)
def x103_snapshot_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x103_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.overwrite(o.filter(F.col("o_orderkey") < 1000), root)  # main v1
    broot = S.create_branch(spark, root, "exp")
    S.append(
        o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 1500)), broot
    )
    S.append(
        o.filter((F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 2500)), root
    )
    n_copied = sum(
        not f.startswith("..") for f in S._read_manifest(spark, broot, 1)["files"]
    )

    def tagged(tag: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(tag).alias("read_tag"),
            F.lit(n_copied).cast("long").alias("n_copied_files"),
            "o_orderkey",
            "o_orderstatus",
        )

    return (
        tagged("main", S.read_snapshot(spark, root))
        .unionByName(tagged("branch", S.read_snapshot(spark, broot)))
        .orderBy("read_tag", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# X104 — inverted file index: token-level data skipping (the text-search
# analog of x64/x76 min-max stats pruning)
# ---------------------------------------------------------------------------


@register(
    "x104_token_file_index",
    oracle="""
    -- docs < 800 laid out as 8 files by doc_id % 8, with the needle
    -- token planted on doc_id % 320 = 0 (docs 0/320/640 — all in group
    -- 0, so a working index plans exactly ONE of the 8 files; the
    -- fixture's natural vocabulary is corpus-wide and cannot prune).
    -- n_files_planned is derived independently from the layout, so a
    -- regression that silently plans every file fails the hash.
    WITH hits AS (SELECT doc_id FROM documents
                  WHERE doc_id < 800 AND doc_id % 320 = 0)
    SELECT 'zzneedle' AS probe_token,
           CAST((SELECT COUNT(DISTINCT doc_id % 8) FROM hits) AS BIGINT)
             AS n_files_planned,
           CAST(8 AS BIGINT) AS n_files_total,
           doc_id
    FROM hits ORDER BY doc_id
    """,
    doc="X104 inverted file index (operators/maintenance.py::"
    "token_file_index/token_pruned_search): token-level data skipping — "
    "the text-search analog of min/max stats pruning (x64/x76): one "
    "tokenize->distinct pass builds (token, file) posting rows (bounded "
    "by |vocab| x |files|, not corpus rows), a needle search collects "
    "the posting list (metadata, like a manifest read), plans ONLY "
    "those files, and re-checks the token inside them so the index "
    "prunes but never decides. The planned-file count is itself "
    "hash-pinned: the oracle derives it from the deterministic "
    "doc_id%8 layout, so a regression that silently plans every file "
    "fails the hash, not just a perf eyeball. Lucene's file-level idea "
    "expressed relationally; at 100 TB a rare-term search reads "
    "megabytes, not the corpus.",
)
def x104_token_file_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.maintenance import (
        token_file_index,
        token_pruned_search,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
    # plant the needle on doc_id % 320 == 0: docs 0/320/640 all land in
    # group 0, so the posting list names exactly one of the 8 files —
    # the fixture's natural vocabulary is corpus-wide and cannot prune
    d = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 320 == 0, F.concat(F.col("text"), F.lit(" zzneedle"))
        ).otherwise(F.col("text")),
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x104_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    # exactly ONE file per doc_id%8 group: repartition ON g routes each
    # group to a single task, partitionBy(g) splits that task's output
    # per directory — so n_files_planned == distinct groups hit, which
    # the oracle derives independently
    d.withColumn("g", F.col("doc_id") % 8).repartition(8, "g").write.partitionBy(
        "g"
    ).parquet(root)
    idx = token_file_index(spark, root, "text")
    hit, n_planned = token_pruned_search(spark, idx, "zzneedle", "text")
    return hit.select(
        F.lit("zzneedle").alias("probe_token"),
        F.lit(n_planned).cast("long").alias("n_files_planned"),
        F.lit(8).cast("long").alias("n_files_total"),
        "doc_id",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X105 — rolling 7-day distinct users from HLL registers (the sketch-path
# twin of x37's exact rolling actives: same question, shuffle bounded at
# days x 256 instead of days x users)
# ---------------------------------------------------------------------------


@register(
    "x105_rolling_distinct_hll",
    oracle="""
    -- per-day md5-HLL registers (x100 encoding), fanned out to the 7
    -- trailing windows each day contributes to (explode 0..6 — exact
    -- densification: a register seen on d-3 but absent on d still
    -- reaches d's window sketch), max-merged at (window_day, register),
    -- then estimated; exact COUNT(DISTINCT) over the same window join
    -- rides along as the accuracy reference. Window days outside the
    -- observed range are dropped so every output window is fully real.
    WITH e AS (SELECT CAST(ts AS DATE) AS d, CAST(user_id AS VARCHAR) AS key
               FROM events),
    bounds AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM e),
    h AS (SELECT d, md5(key || ':hll') AS h FROM e),
    r AS (SELECT d,
            16*(strpos('0123456789abcdef', substr(h,1,1))-1)
              + (strpos('0123456789abcdef', substr(h,2,1))-1) AS reg,
            4*length(regexp_extract(substr(h,3,16), '^0*'))
              + CASE substr(substr(h,3,16),
                            length(regexp_extract(substr(h,3,16), '^0*'))+1, 1)
                  WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                  WHEN '7' THEN 1 ELSE 0 END + 1 AS rho
          FROM h),
    daily AS (SELECT d, reg, MAX(rho) AS rho FROM r GROUP BY d, reg),
    fan AS (SELECT d + CAST(off AS INT) AS wd, reg, rho
            FROM daily, UNNEST(range(0, 7)) AS u(off)),
    wreg AS (SELECT wd, reg, MAX(rho) AS rho FROM fan
             WHERE wd <= (SELECT dmax FROM bounds) GROUP BY wd, reg),
    g AS (SELECT wd,
                 256 - COUNT(*) AS v_zero,
                 CAST(SUM(CAST(power(2, 70 - rho) AS DECIMAL(38,0)))
                      + (256 - COUNT(*)) * CAST(power(2, 70) AS DECIMAL(38,0))
                      AS DOUBLE) AS total
          FROM wreg GROUP BY wd),
    e2 AS (SELECT wd, v_zero,
                  ((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))
                   * 256) * 256 * power(2, 70) / total AS raw
           FROM g),
    x AS (SELECT wd, v_zero,
                 CASE WHEN raw <= 2.5 * 256 AND v_zero > 0
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / v_zero)
                      ELSE raw END AS est
          FROM e2),
    exact AS (SELECT w.wd, COUNT(DISTINCT e.key) AS n_exact
              FROM (SELECT DISTINCT wd FROM wreg) w
              JOIN e ON e.d BETWEEN w.wd - 6 AND w.wd
              GROUP BY w.wd)
    SELECT strftime(x.wd, '%Y-%m-%d') AS window_day,
           CAST(x.v_zero AS BIGINT) AS v_zero,
           ROUND(x.est, 4) AS est_users_r,
           CAST(exact.n_exact AS BIGINT) AS n_exact
    FROM x JOIN exact ON exact.wd = x.wd
    ORDER BY window_day
    """,
    doc="X105 rolling 7-day distinct users from HLL registers "
    "(operators/sketches.py::hll_reg_rho/hll_estimate): the sketch-path "
    "twin of x37's exact rolling actives — per-day registers fan out "
    "to the 7 trailing windows they contribute to (explode 0..6, the "
    "exact densification a naive per-day window-max would miss: a "
    "register seen on d-3 but absent on d must still reach d's "
    "sketch), max-merge at (window_day, register), estimate per "
    "window. Shuffle bounded at days x 256 x 7 rows however many "
    "users exist — x37's exact self-join shuffles days x USERS, which "
    "at 10^9 DAU is the difference between kilobytes and terabytes "
    "per refresh. Register-exact cross-engine (x100 encoding); the "
    "exact distinct count rides along so the bench and the oracle "
    "both witness the accuracy, not just the consistency.",
)
def x105_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import hll_estimate, hll_reg_rho

    ev = cache_once(
        load_table(spark, sf_dir, "events").select(
            F.to_date("ts").alias("d"), "user_id"
        )
    )
    dmax = ev.agg(F.max("d")).first()[0]  # scalar bound: drop phantom tail windows
    reg, rho = hll_reg_rho("user_id", p=8)
    daily = (
        ev.select("d", reg.alias("reg"), rho.alias("rho"))
        .groupBy("d", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    fan = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "d", "reg", "rho"
    ).select(F.date_add("d", F.col("off")).alias("wd"), "reg", "rho")
    wreg = (
        fan.filter(F.col("wd") <= F.lit(dmax))
        .groupBy("wd", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    est = hll_estimate(wreg, ["wd"], p=8)
    wdays = wreg.select("wd").distinct()
    exact = (
        wdays.join(ev, (ev.d >= F.date_sub(wdays.wd, 6)) & (ev.d <= wdays.wd))
        .groupBy("wd")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    return (
        est.join(exact, "wd")
        .select(
            F.date_format("wd", "yyyy-MM-dd").alias("window_day"),
            "v_zero",
            F.round("est_distinct", 4).alias("est_users_r"),
            "n_exact",
        )
        .orderBy("window_day")
    )


# ---------------------------------------------------------------------------
# X106 — transactional dynamic partition overwrite (Delta replaceWhere /
# Spark dynamic mode, through the manifest)
# ---------------------------------------------------------------------------


@register(
    "x106_replace_partitions",
    oracle="""
    -- events < 900 partitioned by event_type; the alphabetically-first
    -- type is RESTATED (its even-id half republished), every other
    -- partition carried untouched (byte-identical file names — pinned
    -- in tests); n_untouched_carried counts the other types' partitions
    -- from the data, independent of the engine's file bookkeeping.
    WITH e AS (SELECT event_id, event_type, user_id FROM events
               WHERE event_id < 900),
    first_t AS (SELECT MIN(event_type) AS t FROM e)
    SELECT CAST((SELECT COUNT(DISTINCT event_type) FROM e
                 WHERE event_type <> (SELECT t FROM first_t)) AS BIGINT)
             AS n_untouched_carried,
           event_id, event_type, user_id
    FROM e
    WHERE event_type <> (SELECT t FROM first_t)
       OR (event_type = (SELECT t FROM first_t) AND event_id % 2 = 0)
    ORDER BY event_id
    """,
    doc="X106 transactional dynamic partition overwrite (operators/"
    "snapshots.py::replace_partitions): Delta replaceWhere / Spark "
    "dynamic-mode semantics through the manifest — replace exactly the "
    "partitions present in the batch; every other partition's files "
    "carry into the child manifest untouched (names + stats, pinned "
    "byte-identical in tests/test_snapshots.py), replaced files stay "
    "on disk for time travel. The daily-restate shape: recomputing one "
    "day of a 100 TB date-partitioned table costs O(files-touched) + "
    "one manifest, with none of in-place dynamic overwrite's "
    "read-your-own-output hazards (the manifest flip is the only "
    "mutation). NULL partition values and MoR-pending tables refused; "
    "txn-token idempotent. The restated partition is derived (MIN "
    "event_type) so the oracle replays it without engine file "
    "bookkeeping.",
)
def x106_replace_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    ).filter(F.col("event_id") < 900)
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x106_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.overwrite(ev, root, partition_by="event_type")  # v1
    first_t = ev.agg(F.min("event_type")).first()[0]
    restated = ev.filter(
        (F.col("event_type") == first_t) & (F.col("event_id") % 2 == 0)
    )
    v = S.replace_partitions(restated, root, txn="restate-1")
    n_untouched = sum(
        1
        for f in {
            f.split("/", 2)[1]
            for f in S._read_manifest(spark, root, v)["files"]
        }
        if f != f"event_type={first_t}"
    )
    return (
        S.read_snapshot(spark, root)
        .select(
            F.lit(n_untouched).cast("long").alias("n_untouched_carried"),
            "event_id",
            "event_type",
            "user_id",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# X107 — distinct-count MV rewrite (x85's matcher extended to
# approx_count_distinct via stored HLL register maps; provably lossless)
# ---------------------------------------------------------------------------


@register(
    "x107_distinct_mv_rewrite",
    oracle="""
    -- the dashboard question "orders, revenue and distinct customers
    -- per priority" answered FROM the (priority, status) summary:
    -- count/sum re-aggregate from stored partials, distinct customers
    -- from the stored md5-HLL register map (x100 encoding) — register
    -- max-merge is lossless, so the rewritten estimate is BIT-IDENTICAL
    -- to sketching the base rows (this oracle computes it from the raw
    -- rows; the engine computes it from the summary — equality IS the
    -- soundness proof). The exact distinct rides along from the
    -- fallback path the planner is forced onto for count_distinct.
    WITH h AS (SELECT o_orderpriority,
                      md5(CAST(o_custkey AS VARCHAR) || ':hll') AS h
               FROM orders),
    r AS (SELECT o_orderpriority,
            16*(strpos('0123456789abcdef', substr(h,1,1))-1)
              + (strpos('0123456789abcdef', substr(h,2,1))-1) AS reg,
            4*length(regexp_extract(substr(h,3,16), '^0*'))
              + CASE substr(substr(h,3,16),
                            length(regexp_extract(substr(h,3,16), '^0*'))+1, 1)
                  WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                  WHEN '7' THEN 1 ELSE 0 END + 1 AS rho
          FROM h),
    m AS (SELECT o_orderpriority, reg, MAX(rho) AS rho
          FROM r GROUP BY o_orderpriority, reg),
    g AS (SELECT o_orderpriority,
                 256 - COUNT(*) AS v_zero,
                 CAST(SUM(CAST(power(2, 70 - rho) AS DECIMAL(38,0)))
                      + (256 - COUNT(*)) * CAST(power(2, 70) AS DECIMAL(38,0))
                      AS DOUBLE) AS total
          FROM m GROUP BY o_orderpriority),
    e AS (SELECT o_orderpriority, v_zero,
                 ((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))
                  * 256) * 256 * power(2, 70) / total AS raw
          FROM g),
    x AS (SELECT o_orderpriority,
                 CASE WHEN raw <= 2.5 * 256 AND v_zero > 0
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / v_zero)
                      ELSE raw END AS est
          FROM e),
    agg AS (SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_price,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS du_exact
            FROM orders GROUP BY o_orderpriority)
    SELECT agg.o_orderpriority, agg.n_orders, agg.total_price,
           ROUND(x.est, 4) AS du_est_r, agg.du_exact,
           'mv:ps' AS prov_approx, 'base' AS prov_exact
    FROM agg JOIN x USING (o_orderpriority)
    ORDER BY agg.o_orderpriority
    """,
    doc="X107 distinct-count MV rewrite (operators/mv_rewrite.py, "
    "approx_count_distinct rule + build_summary(hll_cols=)): x85's "
    "automatic aggregate substitution extended to the one aggregate "
    "warehouses most want from an MV and can least have — distinct "
    "counts. The summary stores an md5-HLL register MAP per group "
    "(<= 256 entries, kilobytes); a coarser query explodes + "
    "max-merges it, and because register merge is lossless the "
    "rewritten estimate is BIT-IDENTICAL to sketching the base rows — "
    "the oracle computes from raw rows, the engine from the summary, "
    "and the hash equality IS the soundness proof (opaque sketch blobs "
    "could never be checked this way). Exact count_distinct still "
    "always falls back (provenance 'base', asserted in-result); at "
    "100 TB the approx path scans grain x 256 rows instead of "
    "re-shuffling every distinct value per dashboard refresh.",
)
def x107_distinct_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.mv_rewrite import (
        AggSpec,
        SummaryView,
        build_summary,
        rewrite_aggregate,
    )

    o = cache_once(load_table(spark, sf_dir, "orders"))
    measures = {"o_totalprice": (18, 2)}
    sdf, kw = build_summary(
        o, ["o_orderpriority", "o_orderstatus"], measures, hll_cols=["o_custkey"]
    )
    views = {"ps": SummaryView(df=sdf, **kw)}
    approx_aggs = [
        AggSpec("count", None, "n_orders"),
        AggSpec("sum", "o_totalprice", "total_price_dec"),
        AggSpec("approx_count_distinct", "o_custkey", "du_est"),
    ]
    p1, prov1 = rewrite_aggregate(o, ["o_orderpriority"], approx_aggs, views, measures)
    assert prov1 == "mv:ps", prov1  # the rewrite must fire, not fall back
    p2, prov2 = rewrite_aggregate(
        o,
        ["o_orderpriority"],
        [AggSpec("count_distinct", "o_custkey", "du_exact")],
        views,
        measures,
    )
    assert prov2 == "base", prov2  # exact distinct is never derivable
    return (
        p1.join(p2, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("total_price_dec").cast("double").alias("total_price"),
            F.round("du_est", 4).alias("du_est_r"),
            "du_exact",
            F.lit(prov1).alias("prov_approx"),
            F.lit(prov2).alias("prov_exact"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# X95b — PageRank with dangling-mass redistribution (the stochastic-matrix
# fix; oracle = the recurrence with the dangling term unrolled in CTEs)
# ---------------------------------------------------------------------------


def _pagerank_dangling_oracle(iterations: int = 5) -> str:
    step = """
d{km1} AS (SELECT COALESCE(SUM(pr), 0) AS dm FROM r{km1}
           WHERE node NOT IN (SELECT src FROM e)),
r{k} AS (
  SELECT n.node,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM p)
         + CAST(0.85 AS DOUBLE)
           * (COALESCE(SUM(r.pr / od.deg), 0)
              + (SELECT dm FROM d{km1}) / (SELECT n FROM p)) AS pr
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN od ON od.src = e.src
  LEFT JOIN r{km1} r ON r.node = e.src
  GROUP BY n.node
)"""
    return (
        """
    -- PageRank WITH dangling-mass redistribution, unrolled:
    -- r_k(v) = 0.15/N + 0.85*(sum r_{k-1}(u)/deg(u) + D_{k-1}/N),
    -- D_{k-1} = total rank parked on nodes with no out-edges. The
    -- src side is folded mod 64 vs dst mod 512, so ~7/8 of the nodes
    -- dangle — the term carries real mass, not epsilon.
    WITH e AS (SELECT DISTINCT o_custkey % 64 AS src,
                               o_orderkey % 512 AS dst FROM orders),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    p AS (SELECT COUNT(*) AS n FROM nodes),
    od AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM p) AS pr FROM nodes),"""
        + ",".join(step.format(k=k, km1=k - 1) for k in range(1, iterations + 1))
        + f"""
    SELECT node, ROUND(pr, 6) AS pr_r FROM r{iterations} ORDER BY node
    """
    )


@register(
    "x95b_pagerank_dangling",
    oracle=_pagerank_dangling_oracle(),
    doc="X95b PageRank with dangling-mass redistribution "
    "(operators/graph.py::pagerank dangling=True): the stochastic-"
    "matrix fix x95's docstring deferred — each round, the rank parked "
    "on no-out-edge nodes is summed (ONE O(nodes) semi-join aggregate "
    "into a 1-row DataFrame, broadcast-cross-joined into the update; "
    "no per-round driver collect) and folded back uniformly, so total "
    "mass stays 1 (pinned in tests/test_graph.py). The graph folds src "
    "mod 64 vs dst mod 512, so ~7/8 of nodes dangle and the term "
    "carries real mass. Still exactly oracle-checkable: D_k is one "
    "more SUM in the unrolled recurrence. Same scale shape as x95 "
    "(edges cached pre-partitioned+pre-sorted on src; only the rank "
    "vector and one scalar move per round); convergence early-stop "
    "(tol=) and lineage checkpointing exist for long runs, exercised "
    "in tests (a data-dependent round count cannot be a fixed oracle).",
)
def x95b_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_custkey") % 64).alias("src"),
        (F.col("o_orderkey") % 512).alias("dst"),
    )
    pr = pagerank(edges, iterations=5, damping=0.85, dangling=True)
    return pr.select("node", F.round("pr", 6).alias("pr_r")).orderBy("node")


# ---------------------------------------------------------------------------
# X96b — d>2 Pareto skyline via grid-cell dominance pruning (the d-objective
# generalization of x96's bucketed SFS; oracle = quadratic NOT EXISTS)
# ---------------------------------------------------------------------------


@register(
    "x96b_skyline_3d",
    oracle="""
    -- 3-objective skyline (maximize length, lexical diversity, and a
    -- deterministic priority axis): survive iff no other doc is >= on
    -- all three and > on at least one. Quadratic dominance definition
    -- — algorithm-independent ground truth.
    WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
                      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS b,
                      CAST(doc_id % 97 AS BIGINT) AS c
               FROM documents)
    SELECT t.doc_id, t.a AS n_chars_obj, t.b AS n_distinct_obj, t.c AS prio_obj
    FROM m t
    WHERE NOT EXISTS (SELECT 1 FROM m o
                      WHERE o.a >= t.a AND o.b >= t.b AND o.c >= t.c
                        AND (o.a > t.a OR o.b > t.b OR o.c > t.c))
    ORDER BY t.doc_id
    """,
    doc="X96b d>2 Pareto skyline (operators/selection.py::"
    "pareto_skyline_points_nd): grid-cell dominance pruning — x96's "
    "one-axis suffix-max argument does not generalize past 2-D, so "
    "each objective is equal-width-bucketized (bounds from one "
    "2d-value aggregate) and a nonempty cell strictly above another "
    "on EVERY axis kills it wholesale (bucket intervals are [lo,hi), "
    "so all-axes bucket+1 implies pointwise strict dominance); "
    "row-level verification then runs only inside compatible "
    "(cell, dominator-cell) pairs — hash equi-joins routed through a "
    "broadcast pair relation of at most buckets^2d rows, with the "
    "dominator side restricted to SURVIVING cells (sound by "
    "transitivity of dominance). No all-pairs pass anywhere; the "
    "residual quadratic work is confined to the grid's upper "
    "staircase shell. Third objective is doc_id mod 97 — independent "
    "of the text axes, so the frontier is genuinely 3-D. Equal "
    "triples never dominate each other (both engines keep them).",
)
def x96b_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.selection import pareto_skyline_points_nd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars_obj"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_distinct_obj"),
        (F.col("doc_id") % 97).cast("long").alias("prio_obj"),
    )
    sky = pareto_skyline_points_nd(d, ["n_chars_obj", "n_distinct_obj", "prio_obj"])
    return (
        d.join(F.broadcast(sky), ["n_chars_obj", "n_distinct_obj", "prio_obj"])
        .select("doc_id", "n_chars_obj", "n_distinct_obj", "prio_obj")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X108 — register-level HLL at non-default precision p=10 (the r8-ADVICE
# fix made non-hex-boundary precisions index the FULL register space; this
# pins the portability claim off the p=8 default, register by register)
# ---------------------------------------------------------------------------


@register(
    "x108_hll_p10_registers",
    oracle="""
    -- md5-register HLL at p=10 (m=1024): register index = top 10 bits
    -- of the first 3 hex chars (integer-divide by 4 drops the 2
    -- leftover bits — the writer's floor-divide replicated), rho from
    -- the 16 hex chars after that boundary. Same estimator as x100
    -- with m=1024; custkey cardinality per priority (~1400) sits in
    -- the linear-counting regime at this m, so that branch runs, and
    -- the status level (3 values) pins it deeper.
    WITH src AS (
      SELECT 'cust' AS level, o_orderpriority, CAST(o_custkey AS VARCHAR) AS key
      FROM orders
      UNION ALL
      SELECT 'status', o_orderpriority, o_orderstatus FROM orders
    ),
    h AS (SELECT level, o_orderpriority, md5(key || ':hll') AS h FROM src),
    r AS (SELECT level, o_orderpriority,
            (256*(strpos('0123456789abcdef', substr(h,1,1))-1)
             + 16*(strpos('0123456789abcdef', substr(h,2,1))-1)
             + (strpos('0123456789abcdef', substr(h,3,1))-1)) // 4 AS reg,
            4*length(regexp_extract(substr(h,4,16), '^0*'))
              + CASE substr(substr(h,4,16),
                            length(regexp_extract(substr(h,4,16), '^0*'))+1, 1)
                  WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                  WHEN '7' THEN 1 ELSE 0 END + 1 AS rho
          FROM h),
    m AS (SELECT level, o_orderpriority, reg, MAX(rho) AS rho
          FROM r GROUP BY level, o_orderpriority, reg),
    g AS (SELECT level, o_orderpriority,
                 1024 - COUNT(*) AS v_zero,
                 CAST(SUM(CAST(power(2, 70 - rho) AS DECIMAL(38,0)))
                      + (1024 - COUNT(*)) * CAST(power(2, 70) AS DECIMAL(38,0))
                      AS DOUBLE) AS total
          FROM m GROUP BY level, o_orderpriority),
    e AS (SELECT level, o_orderpriority, v_zero,
                 ((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 1024))
                  * 1024) * 1024 * power(2, 70) / total AS raw
          FROM g),
    x AS (SELECT level, o_orderpriority, v_zero,
                 CASE WHEN raw <= 2.5 * 1024 AND v_zero > 0
                      THEN CAST(1024 AS DOUBLE) * ln(CAST(1024 AS DOUBLE) / v_zero)
                      ELSE raw END AS est
          FROM e),
    exact AS (
      SELECT 'cust' AS level, o_orderpriority,
             COUNT(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 2
      UNION ALL
      SELECT 'status', o_orderpriority,
             COUNT(DISTINCT o_orderstatus) FROM orders GROUP BY 2
    )
    SELECT x.level, x.o_orderpriority,
           CAST(x.v_zero AS BIGINT) AS v_zero,
           ROUND(x.est, 4) AS est_r,
           CAST(exact.n_exact AS BIGINT) AS n_exact
    FROM x JOIN exact USING (level, o_orderpriority)
    ORDER BY level, o_orderpriority
    """,
    doc="X108 register-level HLL at p=10 (operators/sketches.py::"
    "hll_reg_rho): pins the r9 precision generalization — p is any "
    "integer in [4,14], with non-hex-boundary precisions taking the "
    "top p bits of ceil(p/4) hex chars via floor-divide (the r8 "
    "ADVICE bug let p=10 silently index only 256 of the 1024 "
    "registers while the estimator assumed m=1024). The DuckDB oracle "
    "replicates the divide bit-for-bit ((3-char value) // 4), so "
    "EVERY register hash-checks at the off-default precision, and "
    "the estimate — both branches — matches to the rounded digit. "
    "Shuffle bound rises to |groups| * 2^p rows (the documented "
    "precision/size trade).",
)
def x108_hll_p10_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import (
        hll_estimate,
        hll_register_rows,
    )

    o = cache_once(load_table(spark, sf_dir, "orders"))

    def sketch(level: str, key: str) -> DataFrame:
        return hll_register_rows(o, ["o_orderpriority"], key, p=10).withColumn(
            "level", F.lit(level)
        )

    regs = sketch("cust", "o_custkey").unionByName(sketch("status", "o_orderstatus"))
    est = hll_estimate(regs, ["level", "o_orderpriority"], p=10)
    exact = (
        o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").cast("long").alias("n_exact"))
        .withColumn("level", F.lit("cust"))
        .unionByName(
            o.groupBy("o_orderpriority")
            .agg(F.count_distinct("o_orderstatus").cast("long").alias("n_exact"))
            .withColumn("level", F.lit("status"))
        )
    )
    return (
        est.join(exact, ["level", "o_orderpriority"])
        .select(
            "level",
            "o_orderpriority",
            "v_zero",
            F.round("est_distinct", 4).alias("est_r"),
            "n_exact",
        )
        .orderBy("level", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# X109 — incremental maintenance of a materialized JOIN view (the join twin
# of x71's aggregate IVM: delta joins + row-id anti-joins, base x base never
# re-joined; oracle = full recompute over the final sides)
# ---------------------------------------------------------------------------


@register(
    "x109_ivm_join",
    oracle="""
    -- ground truth = the inner join RECOMPUTED over the final side
    -- states. Final A = base (o%3<>0) minus deletes (base with o%7=0)
    -- plus inserts (o%3=0)  ==  o%3=0 OR o%7<>0; final B likewise
    -- c%4=0 OR c%6<>0. The engine must reach this row set purely from
    -- the stored view + deltas (delta joins + anti-joins), never
    -- re-joining the old bases — equality to this recompute is the
    -- correctness of the delta rule itself.
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price_d,
           c_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal_d
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey % 10 = 1
      AND (o_orderkey % 3 = 0 OR o_orderkey % 7 <> 0)
      AND (c_custkey % 4 = 0 OR c_custkey % 6 <> 0)
    ORDER BY o_orderkey
    """,
    doc="X109 incremental JOIN-view maintenance (operators/merge.py::"
    "ivm_join_build/ivm_join_apply): x71 maintains AGGREGATE views; "
    "this maintains a materialized equi-JOIN under inserts and deletes "
    "to BOTH sides with the classic delta rule — dA joins B_new, dB "
    "joins (A_new anti dA) so new-new pairs count once, deletions are "
    "row-id ANTI-joins against the view's carried provenance columns "
    "(which row of each side produced a view row), and the old "
    "base-x-base join is NEVER re-evaluated. Per batch: O(|delta| "
    "joined with the opposite side) + a map-side view filter (AQE "
    "broadcasts the tiny id sets at runtime). At 100 TB: bucket sides "
    "and view on the join key (x72) for co-located delta joins; "
    "persist the view via merge_commit(prune_on=) so deletes rewrite "
    "only touched files (x88). The oracle recomputes the join over the "
    "final side states — the delta rule must land on exactly that row "
    "set.",
)
def x109_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.merge import (
        ivm_join_apply,
        ivm_join_build,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("price_d")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("acctbal_d")
    )
    a_base = o.filter(F.col("o_orderkey") % 3 != 0)
    a_ins = o.filter(F.col("o_orderkey") % 3 == 0)
    a_del = a_base.filter(F.col("o_orderkey") % 7 == 0)
    b_base = c.filter(F.col("c_custkey") % 4 != 0)
    b_ins = c.filter(F.col("c_custkey") % 4 == 0)
    b_del = b_base.filter(F.col("c_custkey") % 6 == 0)
    a_new = a_base.unionByName(a_ins).join(
        a_del.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    b_new = b_base.unionByName(b_ins).join(
        b_del.select("c_custkey"), "c_custkey", "left_anti"
    )
    view = ivm_join_build(
        a_base.withColumnRenamed("o_custkey", "c_custkey"), b_base, ["c_custkey"]
    )
    maintained = ivm_join_apply(
        view,
        a_new.withColumnRenamed("o_custkey", "c_custkey"),
        b_new,
        a_ins.withColumnRenamed("o_custkey", "c_custkey"),
        a_del,
        b_ins,
        b_del,
        on=["c_custkey"],
        a_id="o_orderkey",
        b_id="c_custkey",
    )
    return maintained.select(
        "o_orderkey",
        F.col("c_custkey").alias("o_custkey"),
        "price_d",
        "c_name",
        "acctbal_d",
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# X110 — portable per-file Bloom sidecar (point-lookup file skipping whose
# ENTIRE filter hash-checks cross-engine, false positives included)
# ---------------------------------------------------------------------------


def _bf_sql(expr: str, salt: str, bits: int) -> str:
    """The md5 8-hex-char fold of operators/maintenance.py::
    bloom_bit_expr, spelled in DuckDB SQL."""
    h = f"md5({expr} || '{salt}')"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({h},{i + 1},1))-1)*{16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({digits}) % {bits})"


_X110_BITS, _X110_K, _X110_PROBE = 4096, 3, 71


def _x110_oracle() -> str:
    hashes = " UNION ALL ".join(
        f"SELECT f, {_bf_sql('CAST(o_custkey AS VARCHAR)', f':bf{j}', _X110_BITS)} AS b FROM rows"
        for j in range(_X110_K)
    )
    probes = " UNION ALL ".join(
        f"SELECT {_bf_sql(repr(str(_X110_PROBE)), f':bf{j}', _X110_BITS)} AS b"
        for j in range(_X110_K)
    )
    return f"""
    -- the per-file bloom REPLICATED end-to-end: same md5 8-hex-char
    -- fold, same 32-bit words via bit_or, same layout rule (file =
    -- o_orderkey % 8 — the engine writes Hive partitions on that
    -- value), so every word matches bit-for-bit INCLUDING any false
    -- positives, and the planned-file count is derived independently
    -- from the replicated filter. n_hits comes from a plain filter
    -- (the residual check keeps the lookup exact).
    WITH rows AS (
      SELECT o_orderkey % 8 AS f, o_custkey FROM orders WHERE o_orderkey % 10 = 1
    ),
    hb AS ({hashes}),
    bits AS (
      SELECT f, b // 32 AS w,
             CAST(bit_or(CAST(1 AS BIGINT) << (b % 32)) AS BIGINT) AS word
      FROM hb GROUP BY f, b // 32
    ),
    need AS (SELECT DISTINCT b // 32 AS w, b % 32 AS s FROM ({probes})),
    planned AS (
      SELECT x.f FROM bits x JOIN need n ON x.w = n.w
        AND ((x.word >> n.s) & 1) = 1
      GROUP BY x.f HAVING COUNT(*) = (SELECT COUNT(*) FROM need)
    )
    SELECT CAST(f AS BIGINT) AS f, CAST(w AS BIGINT) AS w, word,
           CAST((SELECT COUNT(*) FROM planned) AS BIGINT) AS planned_files,
           CAST((SELECT COUNT(*) FROM rows WHERE o_custkey = {_X110_PROBE})
                AS BIGINT) AS n_hits,
           CAST(8 AS BIGINT) AS files_total
    FROM bits ORDER BY f, w
    """


@register(
    "x110_bloom_file_index",
    oracle=_x110_oracle(),
    doc="X110 portable per-file Bloom sidecar (operators/maintenance.py::"
    "bloom_file_index/bloom_pruned_lookup): point-lookup file skipping "
    "for high-cardinality keys — where min/max stats (x76) are useless "
    "(uniform keys span every file) and token postings (x104) cost "
    "|vocab| x |files|, a bloom is CONSTANT bytes per file at a chosen "
    "FP rate, and false positives only cost extra planned files (the "
    "residual equality filter keeps answers exact). Built in ONE pass "
    "as (file, word, 32-bit word) rows via bit_or — map-side "
    "combinable, shuffle bounded at |files| x bits/32 — and every hash "
    "is the md5 8-hex-char fold, so hashlib plans, Spark builds, and "
    "DuckDB replicates the SAME bits: the oracle rebuilds the ENTIRE "
    "filter and derives the planned-file count from it independently — "
    "the x100-style 'sketch hash-checks whole' bar applied to file "
    "skipping (x87's engine-internal runtime bloom can only be "
    "behavior-checked). Index rows are a DataFrame: snapshot it and it "
    "rides incremental maintenance like any table.",
)
def x110_bloom_file_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.maintenance import (
        bloom_file_index,
        bloom_pruned_lookup,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1)
    sliced = o.select(
        "o_orderkey", "o_custkey", (F.col("o_orderkey") % 8).alias("f")
    )
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x110_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    # Hive layout on f: class f never splits across tasks, so exactly one
    # file per f dir — the deterministic layout the oracle's mod rule
    # mirrors (the x104 planted-layout convention)
    sliced.repartition(8, "f").write.partitionBy("f").parquet(path)
    index = bloom_file_index(spark, path, "o_custkey", bits=_X110_BITS, k=_X110_K)
    hit, planned = bloom_pruned_lookup(
        spark, index, _X110_PROBE, "o_custkey", bits=_X110_BITS, k=_X110_K
    )
    n_hits = hit.count()
    return (
        index.select(
            F.regexp_extract("file", r"f=(\d+)", 1).cast("long").alias("f"),
            "w",
            "word",
        )
        .withColumn("planned_files", F.lit(planned).cast("long"))
        .withColumn("n_hits", F.lit(n_hits).cast("long"))
        .withColumn("files_total", F.lit(8).cast("long"))
        .orderBy("f", "w")
    )


# ---------------------------------------------------------------------------
# X111 — synchronous label propagation (community detection as an exactly-
# checkable fixpoint; oracle = the rounds unrolled with the same total order)
# ---------------------------------------------------------------------------


def _lpa_oracle(iterations: int = 3) -> str:
    step = """
c{k} AS (
  SELECT e.u AS node, l.label, COUNT(*) AS cnt
  FROM e JOIN l{km1} l ON l.node = e.v
  GROUP BY e.u, l.label
),
l{k} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label) AS rn
    FROM c{k}) WHERE rn = 1
)"""
    rounds = ",".join(step.format(k=k, km1=k - 1) for k in range(1, iterations + 1))
    return (
        """
    -- synchronous LPA unrolled: each round every node adopts its
    -- neighbors' plurality label, ties to the SMALLEST label — the
    -- deterministic total order (cnt DESC, label ASC) that makes the
    -- heuristic hash-checkable. Undirected bipartite graph: customer
    -- side = custkey mod 128, order side = 128 + orderkey mod 128.
    WITH fwd AS (SELECT DISTINCT o_custkey % 128 AS u,
                                 128 + (o_orderkey % 128) AS v FROM orders),
    e AS (SELECT u, v FROM fwd UNION SELECT v, u FROM fwd),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),"""
        + rounds
        + f"""
    SELECT node, label FROM l{iterations} ORDER BY node
    """
    )


@register(
    "x111_label_propagation",
    oracle=_lpa_oracle(),
    doc="X111 synchronous label propagation (operators/graph.py::"
    "label_propagation): community detection as K rounds of 'adopt the "
    "neighbors' plurality label, ties to the smallest' — the "
    "deterministic tie-break turns a notoriously order-sensitive "
    "heuristic into an exactly-checkable fixpoint (the x101/x95 trick), "
    "and the oracle unrolls the identical (cnt DESC, label ASC) total "
    "order. Complements the reachability family: connected components "
    "(x13/x46) merge everything touching; LPA splits dense regions "
    "joined by thin bridges. Per round: one equi-join of the cached "
    "pre-partitioned edge relation with the O(nodes) label vector + one "
    "count + one row_number, all keyed on the node — label-vector-sized "
    "shuffles only, edges never move (the x95 layout argument; at "
    "100 TB bucket edges on the neighbor key).",
)
def x111_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.graph import label_propagation

    o = load_table(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_custkey") % 128).alias("u"),
        (F.lit(128) + F.col("o_orderkey") % 128).alias("v"),
    )
    return label_propagation(edges, iterations=3).orderBy("node")


# ---------------------------------------------------------------------------
# X112/X113 — hidden partitioning via partition transforms (Iceberg's
# days(ts) / bucket(n, key), over the snapshot layer; predicates on the
# SOURCE column prune through the transform, readers never see the
# derived column)
# ---------------------------------------------------------------------------


@register(
    "x112_days_transform_pruning",
    oracle="""
    -- days(ts) hidden partitioning: the writer derives the UTC day,
    -- the reader's ts-range predicate prunes THROUGH the transform to
    -- exactly the days it can touch (one file per day by layout), and
    -- the planned/total counts are derived here independently as
    -- day-distincts. Content = plain filter (residual keeps it exact);
    -- 'hidden' pins that the derived column never reaches the reader.
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS lo FROM events),
    w AS (SELECT lo, lo + 4 AS hi FROM b)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
           CAST((SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events, w
                 WHERE CAST(ts AS DATE) BETWEEN w.lo AND w.hi) AS BIGINT)
             AS planned_files,
           CAST((SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events)
                AS BIGINT) AS files_total,
           CAST(TRUE AS BOOLEAN) AS hidden
    FROM events, w WHERE CAST(ts AS DATE) BETWEEN w.lo AND w.hi
    """,
    doc="X112 hidden partitioning, days(ts) transform (operators/"
    "transforms.py::write_transformed/read_pruned_source_range): "
    "Iceberg's flagship fix for Hive partitioning — the user never "
    "owns a layout column (x92/x106 make them); the writer derives the "
    "UTC day, the recorded schema EXCLUDES it (snapshots.append "
    "hidden_partition=True; readers drop it by schema projection — the "
    "'hidden' flag is checked in-result), a write-once sidecar pins "
    "the transform so a second writer cannot fork the granularity, and "
    "a timestamp-range predicate prunes at manifest-planning time to "
    "the days it can touch (ISO date strings compare in date order, so "
    "the existing path-value pruning carries it untyped). The oracle "
    "derives the planned/total file counts independently as day "
    "distincts and hash-pins the pruned content against the plain "
    "filter. At 100 TB: a daily-restate or range query schedules "
    "exactly the touched day partitions with zero file opens.",
)
def x112_days_transform_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import transforms as T
    from nagios_custom_etl_spark.operators.snapshots import read_snapshot

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x112_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    T.write_transformed(ev, root, T.days("ts"), mode="overwrite")
    lo = ev.agg(F.min(F.to_date("ts"))).first()[0]  # bounded: one scalar
    import datetime

    hi = lo + datetime.timedelta(days=4)
    df, planned, total = T.read_pruned_source_range(spark, root, str(lo), str(hi))
    hidden = "_ts_days" not in read_snapshot(spark, root).columns
    res = df.filter(
        F.to_date("ts").between(F.lit(str(lo)), F.lit(str(hi)))
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_v"),
    )
    return res.select(
        "n_rows",
        "sum_v",
        F.lit(planned).cast("long").alias("planned_files"),
        F.lit(total).cast("long").alias("files_total"),
        F.lit(bool(hidden)).alias("hidden"),
    )


def _x113_oracle() -> str:
    b_expr = _bf_sql("CAST(o_custkey AS VARCHAR)", ":bkt", 8)
    p_expr = _bf_sql("'71'", ":bkt", 8)
    return f"""
    -- bucket(8, o_custkey) hidden partitioning, REPLICATED: the bucket
    -- is the md5 8-hex-char fold mod 8 (the portable hash family), so
    -- the oracle computes every key's bucket — and the probe key's —
    -- itself, and derives planned (1 iff the probe's bucket is
    -- nonempty) and total (distinct nonempty buckets) independently.
    -- n_hits/sum come from the plain filter: residual keeps it exact.
    WITH kb AS (SELECT o_custkey, o_totalprice, {b_expr} AS b FROM orders),
    probe AS (SELECT {p_expr} AS pb)
    SELECT CAST((SELECT COUNT(*) FROM kb WHERE o_custkey = 71) AS BIGINT)
             AS n_hits,
           CAST((SELECT COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                 FROM kb WHERE o_custkey = 71) AS DOUBLE) AS sum_price,
           CAST((SELECT COUNT(DISTINCT b) FROM kb, probe WHERE b = pb)
                AS BIGINT) AS planned_files,
           CAST((SELECT COUNT(DISTINCT b) FROM kb) AS BIGINT) AS files_total,
           CAST(TRUE AS BOOLEAN) AS hidden
    """


@register(
    "x113_bucket_transform_pruning",
    oracle=_x113_oracle(),
    doc="X113 hidden partitioning, bucket(8, key) transform (operators/"
    "transforms.py): point lookups plan exactly ONE bucket partition — "
    "computed driver-side from the same md5 fold hashlib/Spark/DuckDB "
    "all agree on, so the oracle re-derives the probe's bucket and the "
    "planned/total counts from raw keys and the whole layout is "
    "hash-checked (Iceberg's murmur bucket can only be trusted, not "
    "replicated). Bucketing by HASH spreads hot key ranges that "
    "days()/value partitions concentrate, and the declared bucket "
    "count doubles as storage-partitioned join width (x72, declared at "
    "the table). A key RANGE probe is refused — it hashes everywhere, "
    "pruning would be a lie (tests pin the refusal). Residual equality "
    "filter keeps the lookup exact.",
)
def x113_bucket_transform_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import transforms as T
    from nagios_custom_etl_spark.operators.snapshots import read_snapshot

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x113_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    T.write_transformed(o, root, T.bucket("o_custkey", 8), mode="overwrite")
    df, planned, total = T.read_pruned_source_range(spark, root, 71, 71)
    hidden = "_o_custkey_bucket" not in read_snapshot(spark, root).columns
    res = df.filter(F.col("o_custkey") == 71).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.coalesce(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("sum_price"),
    )
    return res.select(
        "n_hits",
        "sum_price",
        F.lit(planned).cast("long").alias("planned_files"),
        F.lit(total).cast("long").alias("files_total"),
        F.lit(bool(hidden)).alias("hidden"),
    )


# ---------------------------------------------------------------------------
# X114 — version tags (Iceberg TAG): named time travel that RETENTION
# respects — vacuum never expires a tagged version
# ---------------------------------------------------------------------------


@register(
    "x114_version_tags",
    oracle="""
    -- three overwrites; v1 tagged 'baseline'; vacuum keep_last=1. The
    -- tag must keep v1 READABLE (rows below = v1's content, its data
    -- files spared) while untagged v2 expires (manifest dropped, its
    -- files reclaimed — pinned as booleans) and latest stays v3.
    SELECT o_orderkey, o_custkey,
           CAST(1 AS BIGINT) AS tag_version,
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderkey % 10 = 1 AND o_orderkey % 3 = 2) AS BIGINT)
             AS n_latest,
           CAST(TRUE AS BOOLEAN) AS v2_expired,
           CAST(TRUE AS BOOLEAN) AS v2_files_reclaimed
    FROM orders
    WHERE o_orderkey % 10 = 1 AND o_orderkey % 3 = 0
    ORDER BY o_orderkey
    """,
    doc="X114 version tags (operators/snapshots.py::create_tag/"
    "read_snapshot_tag/list_tags + vacuum's tag-aware keep set): "
    "Iceberg TAGs — an immutable name for a version ('the snapshot "
    "run X trained on') that is both a time-travel address and a "
    "RETENTION promise: vacuum's keep set is (newest keep_last) UNION "
    "(tagged versions), so expiring history never strands an audit "
    "point, while untagged versions expire normally (manifest dropped, "
    "unshared files reclaimed — both pinned as result booleans). Tags "
    "are create-if-absent atomic like every other metadata commit: a "
    "name maps to one version forever, re-pointing is an explicit "
    "delete+create. The lifecycle tested here: tag v1, overwrite "
    "twice, vacuum keep_last=1 — v1 readable through the tag with its "
    "files intact, v2 gone, latest untouched.",
)
def x114_version_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", "o_custkey"
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x114_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.overwrite(o.filter(F.col("o_orderkey") % 3 == 0), root)  # v1
    tag_v = S.create_tag(spark, root, "baseline")
    S.overwrite(o.filter(F.col("o_orderkey") % 3 == 1), root)  # v2
    S.overwrite(o.filter(F.col("o_orderkey") % 3 == 2), root)  # v3
    v2_files = set(S._read_manifest(spark, root, 2)["files"])
    deleted = set(S.vacuum(spark, root, keep_last=1))
    v2_expired = 2 not in S._manifest_versions(spark, root)
    n_latest = S.read_snapshot(spark, root).count()
    return (
        S.read_snapshot_tag(spark, root, "baseline")
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit(tag_v).cast("long").alias("tag_version"),
            F.lit(n_latest).cast("long").alias("n_latest"),
            F.lit(bool(v2_expired)).alias("v2_expired"),
            F.lit(bool(v2_files <= deleted)).alias("v2_files_reclaimed"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# X115 — HLL set algebra on register-level sketches: union by max-merge,
# intersection by inclusion-exclusion — every register and both estimates
# replicated cross-engine
# ---------------------------------------------------------------------------


_X115_REG_SQL = """
      SELECT s, reg, MAX(rho) AS rho FROM (
        SELECT s,
               16*(strpos('0123456789abcdef', substr(h,1,1))-1)
                 + (strpos('0123456789abcdef', substr(h,2,1))-1) AS reg,
               4*length(regexp_extract(substr(h,3,16), '^0*'))
                 + CASE substr(substr(h,3,16),
                               length(regexp_extract(substr(h,3,16), '^0*'))+1, 1)
                     WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                     WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                     WHEN '7' THEN 1 ELSE 0 END + 1 AS rho
        FROM (SELECT s, md5(CAST(k AS VARCHAR) || ':hll') AS h FROM src)
      ) GROUP BY s, reg
"""

_X115_EST_SQL = """
      SELECT s,
             CASE WHEN raw <= 2.5 * 256 AND v_zero > 0
                  THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / v_zero)
                  ELSE raw END AS est
      FROM (
        SELECT s, v_zero,
               ((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))
                * 256) * 256 * power(2, 70) / total AS raw
        FROM (
          SELECT s, 256 - COUNT(*) AS v_zero,
                 CAST(SUM(CAST(power(2, 70 - rho) AS DECIMAL(38,0)))
                      + (256 - COUNT(*)) * CAST(power(2, 70) AS DECIMAL(38,0))
                      AS DOUBLE) AS total
          FROM m GROUP BY s))
"""


@register(
    "x115_hll_set_algebra",
    oracle=f"""
    -- set algebra ON SKETCHES: |A|, |B| and |A UNION B| estimated from
    -- md5 register rows (union = max-merge of the two register sets —
    -- HLL's lossless-union property), |A INTERSECT B| by inclusion-
    -- exclusion. Every register and every estimate replicates; the
    -- exact counts ride along as accuracy witnesses. A = custkeys of
    -- even orders, B = custkeys of mod-3 orders (true overlap = mod-6).
    WITH src AS (
      SELECT 'a' AS s, o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'b', o_custkey FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT 'u', o_custkey FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'u', o_custkey FROM orders WHERE o_orderkey % 3 = 0
    ),
    m AS ({_X115_REG_SQL}),
    e AS ({_X115_EST_SQL}),
    w AS (SELECT
            (SELECT est FROM e WHERE s = 'a') AS ea,
            (SELECT est FROM e WHERE s = 'b') AS eb,
            (SELECT est FROM e WHERE s = 'u') AS eu),
    exact AS (SELECT
      (SELECT COUNT(DISTINCT o_custkey) FROM orders WHERE o_orderkey % 2 = 0)
        AS xa,
      (SELECT COUNT(DISTINCT o_custkey) FROM orders WHERE o_orderkey % 3 = 0)
        AS xb,
      (SELECT COUNT(DISTINCT c1.o_custkey) FROM orders c1
        WHERE c1.o_orderkey % 2 = 0
          AND c1.o_custkey IN (SELECT o_custkey FROM orders
                               WHERE o_orderkey % 3 = 0)) AS xi)
    SELECT ROUND(w.ea, 4) AS est_a, ROUND(w.eb, 4) AS est_b,
           ROUND(w.eu, 4) AS est_union,
           ROUND(w.ea + w.eb - w.eu, 4) AS est_intersect,
           CAST(exact.xa AS BIGINT) AS n_a,
           CAST(exact.xb AS BIGINT) AS n_b,
           CAST(exact.xi AS BIGINT) AS n_intersect
    FROM w, exact
    """,
    doc="X115 HLL set algebra (operators/sketches.py::hll_register_rows/"
    "hll_estimate composed): the payoff of keeping sketches as register "
    "RELATIONS — set UNION is a groupBy-max of the two register sets "
    "(HLL's union is lossless, the only exact operation sketch theory "
    "gives away free) and INTERSECTION follows by inclusion-exclusion, "
    "one arithmetic line over three estimates. A distinct-overlap "
    "question ('how many customers ordered in BOTH channels?') costs "
    "three O(groups x 256)-row scans instead of a distinct-join of the "
    "raw sets. The oracle replicates every register of A, B and the "
    "max-merged union, both estimator branches, and the inclusion-"
    "exclusion line — the estimates match to 4 dp and the exact counts "
    "ride along as witnesses (the intersection estimate inherits the "
    "documented HLL caveat: absolute error scales with |union|, so "
    "small true overlaps are noisy — witnessed, not hidden).",
)
def x115_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.sketches import (
        hll_estimate,
        hll_register_rows,
    )

    o = cache_once(load_table(spark, sf_dir, "orders"))
    a_rows = o.filter(F.col("o_orderkey") % 2 == 0)
    b_rows = o.filter(F.col("o_orderkey") % 3 == 0)
    ra = hll_register_rows(a_rows.withColumn("s", F.lit("a")), ["s"], "o_custkey")
    rb = hll_register_rows(b_rows.withColumn("s", F.lit("b")), ["s"], "o_custkey")
    # union sketch = max-merge of A's and B's registers (lossless)
    ru = (
        ra.unionByName(rb)
        .groupBy(F.lit("u").alias("s"), "reg")
        .agg(F.max("rho").alias("rho"))
    )
    est = {
        r["s"]: r["est_distinct"]
        for r in hll_estimate(ra.unionByName(rb).unionByName(ru), ["s"]).collect()
    }  # bounded: 3 rows
    xa = a_rows.select("o_custkey").distinct().count()
    xb = b_rows.select("o_custkey").distinct().count()
    xi = (
        a_rows.select("o_custkey")
        .distinct()
        .join(b_rows.select("o_custkey").distinct(), "o_custkey", "left_semi")
        .count()
    )
    raw = spark.createDataFrame(
        [(est["a"], est["b"], est["u"], xa, xb, xi)],
        "ea double, eb double, eu double, n_a long, n_b long, n_intersect long",
    )
    # F.round (half-up, matches DuckDB ROUND) — python round() is
    # banker's and diverges on .5 boundaries
    return raw.select(
        F.round("ea", 4).alias("est_a"),
        F.round("eb", 4).alias("est_b"),
        F.round("eu", 4).alias("est_union"),
        F.round(F.col("ea") + F.col("eb") - F.col("eu"), 4).alias("est_intersect"),
        "n_a",
        "n_b",
        "n_intersect",
    )


# ---------------------------------------------------------------------------
# X116 — type widening on schema evolution (Delta typeWidening: widen the
# declared type, upcast old files at read — no data rewrite)
# ---------------------------------------------------------------------------


@register(
    "x116_type_widening",
    oracle="""
    -- an int-keyed table widened to bigint by an evolving append whose
    -- key exceeds int range: the final content must equal both batches
    -- under the WIDER type with the old int files upcast at read (no
    -- rewrite — pinned by old_files_carried), and the recorded type is
    -- surfaced as a hash-checked literal.
    WITH both_batches AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_totalprice AS DOUBLE) AS price_d
      FROM orders WHERE o_orderkey % 10 = 1 AND o_orderkey % 3 <> 0
      UNION ALL
      SELECT CAST(o_orderkey AS BIGINT) + 4294967296,
             CAST(o_totalprice AS DOUBLE)
      FROM orders WHERE o_orderkey % 10 = 1 AND o_orderkey % 3 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(price_d AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           'bigint' AS key_type,
           CAST(TRUE AS BOOLEAN) AS old_files_carried
    FROM both_batches
    """,
    doc="X116 type widening on schema evolution (operators/snapshots.py::"
    "_merged_schema + the per-write-group casting read): Delta's "
    "typeWidening — an evolving append may widen a column along the "
    "lossless integer lattice (tinyint->smallint->int->bigint); the "
    "recorded schema takes the wider type, the manifest CARRIES the old "
    "int files untouched (pinned in-result), and the read reconciles "
    "them by casting per write-group before the union (Spark's footer "
    "merge refuses int-vs-long, so the group-wise cast is what makes "
    "the mixed table readable at all). float->double is deliberately "
    "NOT auto-widened (a float upcast exposes garbage past its 24-bit "
    "mantissa — Delta excludes it too); arbitrary retypes still refuse. "
    "Narrower batches keep writing against the widened table and read "
    "back upcast. At 100 TB this is an O(1) metadata operation where a "
    "column rewrite would be a full-table pass.",
)
def x116_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price_d")
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x116_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    ints = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").cast("int").alias("k"), "price_d"
    )
    longs = o.filter(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey").cast("bigint") + F.lit(4294967296)).alias("k"),
        "price_d",
    )
    v1 = S.append(ints, root)
    v1_files = set(S._read_manifest(spark, root, v1)["files"])
    v2 = S.append(longs, root, evolve=True)
    m2 = S._read_manifest(spark, root, v2)
    carried = v1_files <= set(m2["files"])  # widened WITHOUT rewriting
    key_type = dict(m2["schema"])["k"]
    return S.read_snapshot(spark, root).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(F.col("price_d").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    ).select(
        "n_rows",
        "sum_k",
        "sum_price",
        F.lit(key_type).alias("key_type"),
        F.lit(bool(carried)).alias("old_files_carried"),
    )


# ---------------------------------------------------------------------------
# X117 — metadata-only aggregates (Delta/Iceberg's optimized COUNT(*):
# answered from manifest stats, zero data-file opens; MoR-pending refusal
# and the compact()-then-answer path)
# ---------------------------------------------------------------------------


@register(
    "x117_metadata_only_aggregates",
    oracle="""
    -- COUNT/MIN/MAX answered from MANIFEST stats alone (per-file
    -- __rows + min/max recorded at write): equality with this plain
    -- recompute is the correctness claim. With pending MoR deletes a
    -- metadata count would overstate (dead rows still sit in files) —
    -- the refusal is pinned; after compact() materializes the deletes
    -- the metadata answer must equal the post-delete recompute.
    WITH s AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 = 1)
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_meta,
           CAST((SELECT MIN(o_custkey) FROM s) AS BIGINT) AS min_cust,
           CAST((SELECT MAX(o_custkey) FROM s) AS BIGINT) AS max_cust,
           CAST(TRUE AS BOOLEAN) AS mor_refused,
           CAST((SELECT COUNT(*) FROM s WHERE o_orderkey % 7 <> 0) AS BIGINT)
             AS n_after_delete
    """,
    doc="X117 metadata-only aggregates (operators/snapshots.py::"
    "metadata_count/metadata_minmax): COUNT(*) and MIN/MAX answered "
    "from the manifest — zero data-file opens, zero Spark jobs (the "
    "Delta/Iceberg optimized-count path): every writer records a "
    "per-file __rows stat alongside the min/max manifest stats, so the "
    "snapshot count is a JSON sum. Soundness guards pinned in-result: "
    "pending MoR deletes REFUSE (dead rows still sit in the files; a "
    "metadata count would overstate) and files predating row-count "
    "stats refuse rather than silently undercount; after compact() "
    "materializes the deletes the metadata answer equals the "
    "post-delete recompute. At 100 TB this is the difference between a "
    "dashboard count being one manifest read and being a million-file "
    "scan.",
)
def x117_metadata_only_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Row

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", "o_custkey"
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x117_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for k in range(3):
        # single_file: each batch is ~100 KB at sf0.1 — one right-sized
        # file per append (guide §6); stats come from a driver-side
        # pyarrow read of the one just-written file (_single_file_stats
        # — NEVER observe(), which is banned repo-wide)
        S.append(
            o.filter(F.col("o_orderkey") % 3 == k),
            root,
            stats_cols=["o_custkey"],
            single_file=True,
        )
    n_meta = S.metadata_count(spark, root)
    lo, hi = S.metadata_minmax(spark, root, "o_custkey")
    dels = o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    S.mor_delete(dels, root, keys=["o_orderkey"])
    try:
        S.metadata_count(spark, root)
        refused = False
    except ValueError:
        refused = True
    S.compact(spark, root)  # materializes the deletes; stats recorded anew
    n_after = S.metadata_count(spark, root)
    return spark.createDataFrame(
        [Row(n_meta=n_meta, min_cust=lo, max_cust=hi, mor_refused=bool(refused), n_after_delete=n_after)]
    ).select(
        F.col("n_meta").cast("long"),
        F.col("min_cust").cast("long"),
        F.col("max_cust").cast("long"),
        "mor_refused",
        F.col("n_after_delete").cast("long"),
    )


@register(
    "x118_metadata_sum_avg",
    oracle="""
    -- SUM/AVG answered from MANIFEST stats alone (per-file exact
    -- integer __sum/__nulls recorded at write): equality with this
    -- plain recompute is the correctness claim — the int sum is summed
    -- at arbitrary precision and AVG's single float division is the
    -- same IEEE op DuckDB performs on its exact accumulator, so the
    -- match is bit-identical, not approximate. Refusals pinned
    -- in-result: pending MoR deletes, and a column without recorded
    -- sum stats (floats never record sums — order-dependent).
    WITH s AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 = 1)
    SELECT CAST((SELECT SUM(o_custkey) FROM s) AS BIGINT) AS sum_meta,
           CAST((SELECT SUM(o_custkey) FROM s) AS DOUBLE)
             / (SELECT COUNT(o_custkey) FROM s) AS avg_meta,
           CAST(TRUE AS BOOLEAN) AS mor_refused,
           CAST(TRUE AS BOOLEAN) AS unrecorded_refused,
           CAST((SELECT SUM(o_custkey) FROM s WHERE o_orderkey % 7 <> 0) AS BIGINT)
             AS sum_after_delete
    """,
    doc="X118 metadata-only SUM/AVG (operators/snapshots.py::"
    "metadata_sum/metadata_avg): the SUM/AVG twins of x117 — every "
    "write records per-file exact __sum/__nulls for INTEGER stats "
    "columns (decimal(38,0)-carried, JSON round-trips Python ints at "
    "arbitrary precision), so a snapshot SUM is a manifest-JSON sum "
    "with zero file opens and AVG is that sum over the exact non-null "
    "count — bit-identical to a recompute (float columns never record "
    "sums: a float sum is reduction-order-dependent and could not "
    "honor the equality). Refusals mirror x117: pending MoR deletes "
    "overstate, unrecorded columns refuse rather than silently "
    "mis-answer; compact() re-records and the post-delete metadata sum "
    "equals the post-delete recompute.",
)
def x118_metadata_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Row

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", "o_custkey"
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x118_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for k in range(3):
        S.append(
            o.filter(F.col("o_orderkey") % 3 == k),
            root,
            stats_cols=["o_custkey"],
            single_file=True,
        )
    sum_meta = S.metadata_sum(spark, root, "o_custkey")
    avg_meta = S.metadata_avg(spark, root, "o_custkey")
    try:
        S.metadata_sum(spark, root, "o_orderkey")  # never in stats_cols
        unrecorded_refused = False
    except ValueError:
        unrecorded_refused = True
    S.mor_delete(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        root,
        keys=["o_orderkey"],
    )
    try:
        S.metadata_sum(spark, root, "o_custkey")
        mor_refused = False
    except ValueError:
        mor_refused = True
    S.compact(spark, root)  # materializes deletes; sum stats re-recorded
    sum_after = S.metadata_sum(spark, root, "o_custkey")
    return spark.createDataFrame(
        [
            Row(
                sum_meta=sum_meta,
                avg_meta=avg_meta,
                mor_refused=bool(mor_refused),
                unrecorded_refused=bool(unrecorded_refused),
                sum_after_delete=sum_after,
            )
        ]
    ).select(
        F.col("sum_meta").cast("long"),
        F.col("avg_meta").cast("double"),
        "mor_refused",
        "unrecorded_refused",
        F.col("sum_after_delete").cast("long"),
    )


@register(
    "x119_partition_spec_evolution",
    oracle="""
    -- partition-spec EVOLUTION (days -> hours): phase-1 files keep the
    -- day layout, phase-2 files land at hour granularity, and ONE
    -- pruned read plans each era under the spec that wrote it — the
    -- oracle re-derives planned/total independently as day-distincts
    -- over phase 1 PLUS hour-distincts over phase 2 (one file per
    -- partition value by writer layout). Content = plain ts-range
    -- filter (residual keeps it exact); 'hidden' pins that neither
    -- derived column reaches readers; old_files_carried pins that
    -- evolution rewrote nothing.
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
    p1 AS (SELECT e.* FROM events e, b WHERE CAST(ts AS DATE) < d0 + 2),
    p2 AS (SELECT e.* FROM events e, b WHERE CAST(ts AS DATE) = d0 + 2),
    w AS (SELECT CAST(d0 + 1 AS TIMESTAMP) AS lo,
                 CAST(d0 + 2 AS TIMESTAMP) + INTERVAL 12 HOUR AS hi FROM b),
    u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    SELECT
      CAST((SELECT COUNT(*) FROM u, w WHERE u.ts BETWEEN w.lo AND w.hi)
           AS BIGINT) AS n_rows,
      CAST((SELECT SUM(CAST(value AS DECIMAL(18,6))) FROM u, w
            WHERE u.ts BETWEEN w.lo AND w.hi) AS DOUBLE) AS sum_v,
      CAST((SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM p1, w
            WHERE CAST(ts AS DATE) BETWEEN CAST(w.lo AS DATE)
                                       AND CAST(w.hi AS DATE)) AS BIGINT)
      + CAST((SELECT COUNT(DISTINCT strftime(ts, '%Y-%m-%d-%H')) FROM p2, w
              WHERE strftime(ts, '%Y-%m-%d-%H')
                    BETWEEN strftime(w.lo, '%Y-%m-%d-%H')
                        AND strftime(w.hi, '%Y-%m-%d-%H')) AS BIGINT)
        AS planned_files,
      CAST((SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM p1) AS BIGINT)
      + CAST((SELECT COUNT(DISTINCT strftime(ts, '%Y-%m-%d-%H')) FROM p2)
             AS BIGINT) AS files_total,
      CAST(TRUE AS BOOLEAN) AS hidden,
      CAST(TRUE AS BOOLEAN) AS old_files_carried
    """,
    doc="X119 partition-spec evolution (operators/transforms.py::"
    "evolve_transform/read_pruned_source_range): Iceberg's headline "
    "follow-up to hidden partitioning (x112/x113) — CHANGE the declared "
    "transform (days(ts) -> hours(ts), bucket n -> 2n) as a metadata-"
    "only append to the write-once spec chain: no data file is read or "
    "rewritten (pinned in-result), old files are planned under the spec "
    "that wrote them forever (each era's derived column is spec-id-"
    "suffixed, so a file's path segment names its spec), and one pruned "
    "read mixes granularities — day files prune at day resolution, "
    "hour files at hour resolution, with the oracle re-deriving both "
    "eras' planned/total counts independently. Writes with a "
    "superseded spec refuse (tests); at 100 TB this is how a table "
    "whose traffic outgrew daily partitions moves to hourly without a "
    "100 TB rewrite or a reader migration.",
)
def x119_partition_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators import transforms as T

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x119_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    d0 = ev.agg(F.min(F.to_date("ts"))).first()[0]  # bounded: one scalar
    d1, d2 = d0 + datetime.timedelta(days=1), d0 + datetime.timedelta(days=2)
    p1 = ev.filter(F.to_date("ts") < F.lit(str(d2)))
    p2 = ev.filter(F.to_date("ts") == F.lit(str(d2)))
    T.write_transformed(p1, root, T.days("ts"), mode="overwrite")
    old_files = set(S._read_manifest(spark, root, S.latest_version(spark, root))["files"])
    T.evolve_transform(spark, root, T.hours("ts"))
    T.write_transformed(p2, root, T.hours("ts"), mode="append")
    m = S._read_manifest(spark, root, S.latest_version(spark, root))
    old_carried = old_files <= set(m["files"])
    lo_s, hi_s = f"{d1} 00:00:00", f"{d2} 12:00:00"
    df, planned, total = T.read_pruned_source_range(spark, root, lo_s, hi_s)
    hidden = not any(
        c.startswith("_ts_") for c in S.read_snapshot(spark, root).columns
    )
    res = df.filter(
        F.col("ts").between(
            F.lit(lo_s).cast("timestamp"), F.lit(hi_s).cast("timestamp")
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_v"),
    )
    return res.select(
        "n_rows",
        "sum_v",
        F.lit(planned).cast("long").alias("planned_files"),
        F.lit(total).cast("long").alias("files_total"),
        F.lit(bool(hidden)).alias("hidden"),
        F.lit(bool(old_carried)).alias("old_files_carried"),
    )


@register(
    "x120_ann_index_retrain",
    oracle="""
    -- retraining closes x54's frozen-quantizer contract: build+persist
    -- on HALF the planted corpus, append the other half (frozen
    -- quantizers), then ann_retrain_index RE-FITS the coarse centroids
    -- and the PQ codebooks over the CURRENT rows, re-encodes, and
    -- publishes a replacement data directory. The planted construction
    -- stays codeword-exact under ANY codebooks trained on data
    -- containing all 8 patterns, so probe-all ADC search through the
    -- RETRAINED index must find exactly the planted matches — the same
    -- top-12 prediction as x49c/x54.
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X120 ANN index re-training after drift (operators/similarity."
    "py::ann_retrain_index + ann_drift_report): the maintenance job "
    "x54 defers to — drift detection compares live per-cell counts and "
    "mean assigned-centroid residual against the build-time fingerprint "
    "the sidecar now records (one bounded n_cells aggregate, no "
    "search); retrain re-fits centroids AND codebooks over current "
    "rows, re-encodes, and publishes into a FRESH data-r<seq> dir with "
    "one sidecar flip (mutation_seq bumps, so st18's poller reloads; "
    "readers holding the old meta keep serving the superseded dir). "
    "Codes-only indexes refuse (codes cannot re-route themselves). "
    "Recall degradation under a deliberately drifted append and its "
    "recovery by retrain are test-pinned; this oracle hash-checks the "
    "retrained quantizer/encode/search chain end to end.",
)
def x120_ann_index_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_load_index,
        ann_retrain_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    initial = planted.filter(F.col("vec_id") % 16 < 8)
    arrivals = planted.filter(F.col("vec_id") % 16 >= 8)
    assigned, centroids = ivf_build(initial, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(initial, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(initial, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x120_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    ann_append_to_index(spark, path, arrivals)
    ann_retrain_index(spark, path, seed=13)
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x121_quality_expectations",
    oracle="""
    -- DLT expectation triad over the raw feed: warn counts, drop
    -- quarantines (rows preserved, not deleted), fail poisons the
    -- batch. Metrics = per-rule violation counts over ALL input rows;
    -- kept/quarantined partition on the drop rule (NULL predicate
    -- results count as violations — IS [NOT] TRUE spells that here).
    -- fail_tripped pins that a planted NULL-event_id row aborts the
    -- gate. The fail rule is on event_id — non-null by fixture schema
    -- CONSTRUCTION — so a regenerated fixture can never trip it on
    -- real data (CLAUDE.md's regenerated-data rule); warn/drop rules
    -- exercise genuine fixture variation.
    WITH e AS (SELECT * FROM events),
    m AS (
      SELECT 'has_id' AS rule, 'fail' AS action,
             CAST(COUNT(*) FILTER (WHERE (event_id IS NOT NULL) IS NOT TRUE)
                  AS BIGINT) AS n_violations FROM e
      UNION ALL
      SELECT 'not_error', 'drop',
             CAST(COUNT(*) FILTER (WHERE (event_type <> 'error') IS NOT TRUE)
                  AS BIGINT) FROM e
      UNION ALL
      SELECT 'value_present', 'warn',
             CAST(COUNT(*) FILTER (WHERE (value IS NOT NULL) IS NOT TRUE)
                  AS BIGINT) FROM e
    )
    SELECT rule, action, n_violations,
           CAST((SELECT COUNT(*) FROM e WHERE (event_type <> 'error') IS TRUE)
                AS BIGINT) AS n_kept,
           CAST((SELECT COUNT(*) FROM e WHERE (event_type <> 'error') IS NOT TRUE)
                AS BIGINT) AS n_quarantined,
           CAST(TRUE AS BOOLEAN) AS fail_tripped
    FROM m ORDER BY rule
    """,
    doc="X121 declarative quality expectations (operators/quality.py::"
    "expectations_apply): DLT's expect/expect_or_drop/expect_or_fail as "
    "one operator — ONE codegen'd tagging pass marks each row with its "
    "failed-rule array, routing is a map-side filter on the tag, "
    "violation metrics aggregate at rule cardinality (the DLT event-log "
    "record), and drop-rule rows land in a QUARANTINE output with their "
    "full diagnosis instead of being deleted (curation re-inspects; "
    "deletion destroys evidence). fail rules poison the batch eagerly "
    "(ExpectationFailed) before anything publishes — the row-level "
    "sibling of st25's aggregate WAP audit. NULL predicate results "
    "count as violations (SQL CHECK would wave them through; a quality "
    "gate must not). Generalizes the reference's silent inline filters "
    "(extract.py:53-61) into counted, routable, abortable rules.",
)
def x121_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.quality import (
        ExpectationFailed,
        expectations_apply,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    rules = [
        # the FAIL rule gates on event_id — non-null by fixture schema
        # construction — so real regenerated data can never abort the
        # query (r10 ADVICE); the warn/drop rules see genuine variation
        ("has_id", F.col("event_id").isNotNull(), "fail"),
        ("not_error", F.col("event_type") != "error", "drop"),
        ("value_present", F.col("value").isNotNull(), "warn"),
    ]
    kept, quarantined, metrics = expectations_apply(ev, rules)
    n_kept, n_quar = kept.count(), quarantined.count()
    planted = spark.createDataFrame(
        [(None, 42, "click", 1.0)],
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    try:
        expectations_apply(ev.unionByName(planted), rules)
        fail_tripped = False
    except ExpectationFailed as ex:
        fail_tripped = ex.counts.get("has_id") == 1
    return metrics.select(
        "rule",
        "action",
        "n_violations",
        F.lit(n_kept).cast("long").alias("n_kept"),
        F.lit(n_quar).cast("long").alias("n_quarantined"),
        F.lit(bool(fail_tripped)).alias("fail_tripped"),
    ).orderBy("rule")


@register(
    "x122_branch_fastforward",
    oracle="""
    -- branch fast-forward (merge-back): after two appends on the dev
    -- branch, fastforward_branch publishes the branch state as main's
    -- next version ZERO-COPY — main's rows equal the branch's (= all
    -- planted rows), the pre-merge version stays time-travel-readable
    -- (n_at_branch_point recomputes it), the commit references the
    -- branch's files in place (zero_copy), and a fast-forward after
    -- main moved is REFUSED (nonff_refused) — publishing it would drop
    -- main's commits.
    WITH s AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price_d
               FROM orders WHERE o_orderkey % 10 = 1)
    SELECT o_orderkey, price_d,
           CAST((SELECT COUNT(*) FROM s WHERE o_orderkey % 3 < 2) AS BIGINT)
             AS n_at_branch_point,
           CAST(TRUE AS BOOLEAN) AS zero_copy,
           CAST(TRUE AS BOOLEAN) AS nonff_refused
    FROM s ORDER BY o_orderkey
    """,
    doc="X122 branch fast-forward (operators/snapshots.py::"
    "fastforward_branch): the merge-back half of x103's zero-copy "
    "branches — Iceberg fastForwardBranch / the shallow-clone promote. "
    "One manifest write re-roots the branch's file references (shared "
    "../../ refs return to source-relative names; branch-local writes "
    "are referenced in place under _branches/<name>/), no data bytes "
    "move however much the branch diverged. Linear-history safety: "
    "refused when main advanced past the branch point (dropping main's "
    "commits is a rebase/merge decision, never implicit), when the "
    "branch has pending MoR deletes (their seqs were minted in the "
    "branch log), or when the branch origin was vacuumed. Source "
    "vacuum never reclaims _branches/ refs (the branch log still "
    "references those bytes) — symmetric to the branch's ../ guard.",
)
def x122_branch_fastforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price_d")
    )
    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x122_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    root, root2 = os.path.join(base, "main"), os.path.join(base, "probe")
    S.append(o.filter(F.col("o_orderkey") % 3 == 0), root)
    v_bp = S.append(o.filter(F.col("o_orderkey") % 3 == 1), root)
    broot = S.create_branch(spark, root, "dev")
    third = o.filter(F.col("o_orderkey") % 3 == 2)
    S.append(third.filter(F.col("o_orderkey") % 2 == 0), broot)
    S.append(third.filter(F.col("o_orderkey") % 2 == 1), broot)
    bm = S._read_manifest(spark, broot, S.latest_version(spark, broot))
    v_ff = S.fastforward_branch(spark, root, "dev")
    m_ff = S._read_manifest(spark, root, v_ff)

    def reroot(f: str) -> str:
        return f[len("../../"):] if f.startswith("../../") else f"_branches/dev/{f}"

    zero_copy = set(m_ff["files"]) == {reroot(f) for f in bm["files"]}
    n_at_bp = S.read_snapshot(spark, root, v_bp).count()  # time travel intact
    # refusal probe on a scratch table: main moves after the branch point
    S.append(o.limit(3), root2)
    S.create_branch(spark, root2, "dev")
    S.append(o.limit(1), root2)  # main advances
    try:
        S.fastforward_branch(spark, root2, "dev")
        refused = False
    except S.ConcurrentCommitError:
        refused = True
    return (
        S.read_snapshot(spark, root)
        .select("o_orderkey", "price_d")
        .withColumn("n_at_branch_point", F.lit(int(n_at_bp)).cast("long"))
        .withColumn("zero_copy", F.lit(bool(zero_copy)))
        .withColumn("nonff_refused", F.lit(bool(refused)))
        .orderBy("o_orderkey")
    )


@register(
    "x123_multi_column_pruning",
    oracle="""
    -- conjunctive data skipping: files written as quadrants of the
    -- (a, b) grid; a rectangle predicate plans only the files whose
    -- recorded per-file [min,max] boxes intersect BOTH ranges — the
    -- oracle replicates the pruning rule itself (group-level min/max
    -- per quadrant, box-intersection test) so planned/total are
    -- derived independently; content = plain filter (residual).
    WITH s AS (
      SELECT o_orderkey, o_orderkey % 200 AS a, o_custkey % 200 AS b
      FROM orders WHERE o_orderkey % 10 = 1
    ),
    boxes AS (
      SELECT a // 100 AS qa, b // 100 AS qb,
             MIN(a) AS mna, MAX(a) AS mxa, MIN(b) AS mnb, MAX(b) AS mxb
      FROM s GROUP BY a // 100, b // 100
    )
    SELECT CAST((SELECT COUNT(*) FROM s
                 WHERE a BETWEEN 0 AND 99 AND b BETWEEN 150 AND 199)
                AS BIGINT) AS n_rows,
           CAST((SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM s
                 WHERE a BETWEEN 0 AND 99 AND b BETWEEN 150 AND 199)
                AS BIGINT) AS sum_key,
           CAST((SELECT COUNT(*) FROM boxes
                 WHERE NOT (mxa < 0 OR mna > 99)
                   AND NOT (mxb < 150 OR mnb > 199)) AS BIGINT)
             AS planned_files,
           CAST((SELECT COUNT(*) FROM boxes) AS BIGINT) AS files_total
    """,
    doc="X123 multi-column data skipping (operators/snapshots.py::"
    "read_snapshot_pruned_multi): a CONJUNCTION of range predicates "
    "prunes at manifest-planning time — a file dies when its recorded "
    "[min,max] misses ANY range, so selectivity multiplies across "
    "columns. This is the read path that makes Z-order compaction "
    "(x94) pay: Morton-clustered files cover small rectangles, and a "
    "2-D predicate over them plans O(query area / file area) files "
    "where a single-column sort prunes only its lead column. The "
    "planted quadrant layout (one file per grid cell via per-quadrant "
    "appends) lets the oracle re-derive planned/total by replicating "
    "the box-intersection rule over group-level min/max — the pruning "
    "decision itself is hash-checked, not just the surviving rows.",
)
def x123_multi_column_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    s = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey",
        (F.col("o_orderkey") % 200).alias("a"),
        (F.col("o_custkey") % 200).alias("b"),
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x123_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    for qa in (0, 1):
        for qb in (0, 1):
            quad = s.filter(
                (F.floor(F.col("a") / 100) == qa) & (F.floor(F.col("b") / 100) == qb)
            ).coalesce(1)
            if quad.isEmpty():
                continue  # tiny fixture: an empty quadrant writes nothing
            S.append(quad, root, stats_cols=["a", "b"])
    df, planned, total = S.read_snapshot_pruned_multi(
        spark, root, [("a", 0, 99), ("b", 150, 199)]
    )
    res = df.filter(
        F.col("a").between(0, 99) & F.col("b").between(150, 199)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )
    return res.select(
        "n_rows",
        "sum_key",
        F.lit(planned).cast("long").alias("planned_files"),
        F.lit(total).cast("long").alias("files_total"),
    )


@register(
    "x124_snapshot_diff",
    oracle="""
    -- version-to-version row diff (table_changes without a change
    -- feed): across the OVERWRITE (v1->v2) the content-diff fallback
    -- must equal EXCEPT ALL both ways (multiset semantics); across the
    -- plain append (v2->v3) the append-only fast path reads just the
    -- new files and emits inserts only.
    WITH s AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price_d
               FROM orders WHERE o_orderkey % 10 = 1),
    a AS (SELECT * FROM s WHERE o_orderkey % 3 IN (0, 1)),
    b AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 1 THEN price_d + 100.0
                      ELSE price_d END AS price_d
          FROM s WHERE o_orderkey % 3 IN (1, 2)),
    c AS (SELECT * FROM s WHERE o_orderkey % 3 = 0)
    SELECT o_orderkey, price_d, 'insert' AS _change_type, 'v1v2' AS _range
    FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
    UNION ALL
    SELECT o_orderkey, price_d, 'delete', 'v1v2'
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT o_orderkey, price_d, 'insert', 'v2v3' FROM c
    ORDER BY _range, _change_type, o_orderkey
    """,
    doc="X124 snapshot diff (operators/snapshots.py::snapshot_diff): "
    "Delta's table_changes for tables WITHOUT a change feed — the diff "
    "applied to the old version reproduces the new one exactly "
    "(EXCEPT ALL multiset semantics both ways). Plan picked by what "
    "the history proves: append-only ranges take the file-set-"
    "difference fast path (O(new files), zero old data, no deletes by "
    "construction — read_incremental's proof); arbitrary histories "
    "(overwrite/merge/compact) pay the honest two-scan content diff. "
    "Audit/backfill tooling — the change-feed sinks (st21/st31) exist "
    "so hot paths never need the fallback.",
)
def x124_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    s = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price_d")
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x124_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    a = s.filter(F.col("o_orderkey") % 3 <= 1)
    b = s.filter(F.col("o_orderkey") % 3 >= 1).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 1, F.col("price_d") + 100.0)
        .otherwise(F.col("price_d"))
        .alias("price_d"),
    )
    c = s.filter(F.col("o_orderkey") % 3 == 0)
    S.append(a, root)  # v1
    S.overwrite(b, root)  # v2: not append-family -> content diff
    S.append(c, root)  # v3: append-only range -> fast path
    d12 = S.snapshot_diff(spark, root, 1, 2).withColumn("_range", F.lit("v1v2"))
    d23 = S.snapshot_diff(spark, root, 2, 3).withColumn("_range", F.lit("v2v3"))
    return d12.unionByName(d23).orderBy("_range", "_change_type", "o_orderkey")


@register(
    "x125_check_constraints",
    oracle="""
    -- Delta CHECK constraints: a declared predicate every writer
    -- enforces — the violating append is REFUSED (violation_refused,
    -- with the planted row never landing: content equals the two good
    -- batches), and ADDING a constraint that existing rows violate is
    -- refused too (add_refused) — an invariant, not a forward-only
    -- filter.
    WITH s AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price_d
               FROM orders WHERE o_orderkey % 10 = 1)
    SELECT o_orderkey, price_d,
           CAST(TRUE AS BOOLEAN) AS violation_refused,
           CAST(TRUE AS BOOLEAN) AS add_refused
    FROM s ORDER BY o_orderkey
    """,
    doc="X125 CHECK constraints (operators/snapshots.py::"
    "add_check_constraint/drop_check_constraint/_enforce_constraints): "
    "Delta's ADD CONSTRAINT — a SQL predicate declared once (atomic "
    "sidecar, parse-validated, refused if existing rows violate: one "
    "scan paid at declaration) and enforced by EVERY writer (append/"
    "overwrite/merge/replace-partitions/mor-upsert) via the x121 "
    "expectations machinery BEFORE any data file lands — per-constraint "
    "violation counts ride the error. Enforcing only the new rows is "
    "sound by induction: every referenced file passed this gate at its "
    "own write or the add-time scan. NULL predicate results count as "
    "violations. Zero write-path cost when no constraints are declared "
    "(one sidecar listing).",
)
def x125_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.quality import ExpectationFailed

    s = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price_d")
    )
    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x125_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    S.append(s.filter(F.col("o_orderkey") % 3 == 0), root)
    S.add_check_constraint(spark, root, "price_pos", "price_d > 0")
    S.append(s.filter(F.col("o_orderkey") % 3 != 0), root)  # good: passes
    bad = spark.createDataFrame(
        [(999_999_991, -5.0)], "o_orderkey bigint, price_d double"
    )
    try:
        S.append(bad, root)
        violation_refused = False
    except ExpectationFailed as ex:
        violation_refused = ex.counts.get("price_pos") == 1
    try:
        S.add_check_constraint(spark, root, "key_neg", "o_orderkey < 0")
        add_refused = False
    except ValueError:
        add_refused = True
    return (
        S.read_snapshot(spark, root)
        .select("o_orderkey", "price_d")
        .withColumn("violation_refused", F.lit(bool(violation_refused)))
        .withColumn("add_refused", F.lit(bool(add_refused)))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# X126 — column mapping: rename/drop as metadata-only commits (Delta column
# mapping / Iceberg schema evolution); X128 — ADD COLUMN with a declared
# default (Iceberg initial-default)
# ---------------------------------------------------------------------------


@register(
    "x126_column_mapping",
    oracle="""
    -- rename + drop as METADATA-ONLY commits: era-1 files (written
    -- under the old name 'qty', int) and era-2 files (new name
    -- 'cust_id', bigint — widening composes with the mapping) must read
    -- back as ONE table under the new name, with the era-1 files
    -- carried byte-identically (zero_copy_rename) and the dropped
    -- 'status' column hidden from the final schema (dropped_hidden).
    -- meta_sum is SUM(cust_id) answered from MANIFEST stats alone —
    -- the per-file integer sums recorded under 'qty' were re-keyed by
    -- the rename commit, so the metadata path answers on the new name
    -- with zero recompute.
    WITH s AS (SELECT o_orderkey AS k, o_custkey FROM orders
               WHERE o_orderkey % 10 = 1),
    r AS (
      SELECT k, CAST(o_custkey AS BIGINT) AS cust_id FROM s WHERE k % 3 <> 0
      UNION ALL
      SELECT k, CAST(o_custkey AS BIGINT) + 8589934592 FROM s WHERE k % 3 = 0
    )
    SELECT CAST(k AS BIGINT) AS k, cust_id,
           CAST((SELECT SUM(cust_id) FROM r) AS BIGINT) AS meta_sum,
           CAST(TRUE AS BOOLEAN) AS zero_copy_rename,
           CAST(TRUE AS BOOLEAN) AS dropped_hidden
    FROM r ORDER BY k
    """,
    doc="X126 column mapping (operators/snapshots.py::rename_column/"
    "drop_column/undrop_column + the alias-resolving read): Delta column "
    "mapping — RENAME is one metadata commit (no data file read or "
    "rewritten; the schema entry's alias chain records the former "
    "physical name and reads resolve name-first-then-aliases per write "
    "group), DROP hides a physically-retained column behind a tombstone "
    "entry whose aliases reserve the name against stale-value "
    "resurrection (re-adding a former name is refused until "
    "compact(purge_mapping=True) — Delta REORG PURGE — rewrites and "
    "releases it; undrop_column restores losslessly before that). "
    "Per-file stats re-key with the rename, so data skipping and "
    "metadata-only aggregates answer on the new name with zero "
    "recompute; type widening (x116) composes. At 100 TB a rename is "
    "O(1) metadata where a physical rename would be a full-table "
    "rewrite.",
)
def x126_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x126_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    s = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 1)
    era1 = s.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("int").alias("qty"),
        F.col("o_orderstatus").alias("status"),
    )
    v1 = S.append(era1, root, stats_cols=["qty"], single_file=True)
    v1_files = set(S._read_manifest(spark, root, v1)["files"])
    v2 = S.rename_column(spark, root, "qty", "cust_id")
    zero_copy = set(S._read_manifest(spark, root, v2)["files"]) == v1_files
    era2 = s.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey").cast("bigint") + F.lit(8589934592)).alias("cust_id"),
        F.col("o_orderstatus").alias("status"),
    )
    S.append(era2, root, stats_cols=["cust_id"], evolve=True, single_file=True)
    S.drop_column(spark, root, "status")
    final = S.read_snapshot(spark, root)
    dropped_hidden = final.columns == ["k", "cust_id"]
    meta_sum = S.metadata_sum(spark, root, "cust_id")  # manifest-only
    return (
        final.select(F.col("k").cast("long").alias("k"), "cust_id")
        .withColumn("meta_sum", F.lit(int(meta_sum)).cast("long"))
        .withColumn("zero_copy_rename", F.lit(bool(zero_copy)))
        .withColumn("dropped_hidden", F.lit(bool(dropped_hidden)))
        .orderBy("k")
    )


@register(
    "x128_default_column_values",
    oracle="""
    -- ADD COLUMN with a declared DEFAULT (Iceberg initial-default) as
    -- one metadata commit: files written BEFORE the add and batches
    -- that OMIT the column read the default back; a supplying batch
    -- wins; compaction materializes the default physically while
    -- keeping the declaration for future omitting writers.
    WITH r AS (
      SELECT c_custkey, 'UNKNOWN' AS segment FROM customer WHERE c_custkey % 3 = 2
      UNION ALL
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, 'UNKNOWN' FROM customer WHERE c_custkey % 3 = 1
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, segment,
           CAST(TRUE AS BOOLEAN) AS metadata_only_add,
           CAST(TRUE AS BOOLEAN) AS compact_preserves
    FROM r ORDER BY c_custkey
    """,
    doc="X128 default column values (operators/snapshots.py::add_column "
    "+ the default-materializing read): ALTER TABLE ADD COLUMN DEFAULT "
    "as one metadata commit — the default lives in the schema entry as "
    "a JSON literal; reads materialize it for every file lacking the "
    "column (all pre-add files, and future batches that omit it — "
    "omission needs no evolve once declared), a supplying batch wins, "
    "and compact() materializes the values physically while keeping "
    "the declaration. Iceberg's initial-default: backfilling a new "
    "column over a 100 TB table costs one manifest write, not a "
    "rewrite.",
)
def x128_default_column_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x128_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    c = load_table(spark, sf_dir, "customer")
    v1 = S.append(c.filter(F.col("c_custkey") % 3 == 2).select("c_custkey"), root)
    v1_files = set(S._read_manifest(spark, root, v1)["files"])
    v2 = S.add_column(spark, root, "segment", "string", default="UNKNOWN")
    metadata_only = set(S._read_manifest(spark, root, v2)["files"]) == v1_files
    S.append(
        c.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey", F.col("c_mktsegment").alias("segment")
        ),
        root,
    )
    # omitting batch: the declared default fills at read, no evolve needed
    S.append(c.filter(F.col("c_custkey") % 3 == 1).select("c_custkey"), root)
    before = S.read_snapshot(spark, root).localCheckpoint()
    S.compact(spark, root)
    after = S.read_snapshot(spark, root)
    compact_preserves = (
        after.exceptAll(before).isEmpty() and before.exceptAll(after).isEmpty()
    )
    return (
        after.select(F.col("c_custkey").cast("long").alias("c_custkey"), "segment")
        .withColumn("metadata_only_add", F.lit(bool(metadata_only)))
        .withColumn("compact_preserves", F.lit(bool(compact_preserves)))
        .orderBy("c_custkey")
    )


@register(
    "x127_ann_partial_retrain",
    oracle="""
    -- PER-CELL retrain (the big-index refinement of x120's full
    -- retrain): build+persist on half the planted corpus, append the
    -- other half, then ann_retrain_cells re-splits ONLY the two
    -- fullest cells — their rows re-route into a patch dir that takes
    -- ownership of those cell ids, every other cell's files stay
    -- byte-identical, PQ codes are CARRIED (codebooks unchanged), and
    -- the sidecar flip is the single publish. The planted construction
    -- stays codeword-exact, so probe-all ADC search through the
    -- PARTIALLY retrained index must find exactly the planted matches
    -- — identical to x120/x49c's top-12 prediction, which is the
    -- routing-invariance proof (a partial retrain moves rows between
    -- cells, never changes what exists).
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X127 per-cell ANN retrain (operators/similarity.py::"
    "ann_retrain_cells + ann_cell_drift + the patch-dir read plan): at "
    "10^11 vectors you retrain the DRIFTED cells, not the index — "
    "per-cell residual baselines (drift_baseline.cell_d2, recorded at "
    "every build/retrain) rank cells, the named cells' rows re-split "
    "under a local k-means into the same cell count, the re-routed "
    "rows land in a fresh data-p<seq> PATCH dir owning exactly those "
    "cells (untouched cells' files byte-identical — pinned in tests), "
    "PQ codes carry unre-encoded (they depend only on the global "
    "codebooks), and ONE sidecar flip publishes centroids + patch "
    "ownership + refreshed per-cell baseline + mutation_seq together. "
    "Append/delete/compact route per owning dir afterwards; "
    "ann_gc_index keeps every dir the patch list references. "
    "Codes-only refuses (codes cannot re-route themselves).",
)
def x127_ann_partial_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_load_index,
        ann_retrain_cells,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    initial = planted.filter(F.col("vec_id") % 16 < 8)
    arrivals = planted.filter(F.col("vec_id") % 16 >= 8)
    assigned, centroids = ivf_build(initial, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(initial, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(initial, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x127_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    ann_append_to_index(spark, path, arrivals)
    # retrain the two fullest cells (bounded collect: n_cells rows)
    occ = (
        ann_load_index(spark, path)
        .table.groupBy("cell_id")
        .count()
        .orderBy(F.desc("count"), "cell_id")
        .collect()
    )
    cells = sorted(int(r["cell_id"]) for r in occ[:2])
    ann_retrain_cells(spark, path, cells=cells, seed=13)
    idx = ann_load_index(spark, path)
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x139_ann_patch_consolidation",
    oracle="""
    -- Patch-dir consolidation (the ANN analog of x129's bin-packing):
    -- after TWO per-cell retrains the read plan pays one union leg per
    -- patch dir; ann_consolidate_index folds them into ONE dir owning
    -- the union of the patched cells — rows read ONLY from the owning
    -- patch dirs, the primary dir byte-identical, routing/codes/
    -- baseline invariant (layout maintenance). Both invariants are
    -- asserted INSIDE the query (loud-fail), and the planted
    -- codeword-exact construction makes probe-all ADC search through
    -- the consolidated index find exactly the planted matches.
    """
    + _PLANTED_PQ_ORACLE_TAIL,
    doc="X139 ANN patch consolidation (r11 verdict task 7; operators/"
    "similarity.py::ann_consolidate_index): repeated x127 per-cell "
    "retrains accumulate data-p<seq> dirs and grow the sidecar patch "
    "list; consolidation rewrites ONLY the patched cells' rows (read "
    "straight from their owning dirs — never the primary) into one "
    "consolidated dir, flips the sidecar patch list to a single entry "
    "in one publish, and ann_gc_index reclaims the superseded dirs. "
    "Content-invariant by construction: centroids, PQ codes and the "
    "drift baseline are untouched — the index serves identically "
    "before and after. 100 TB: O(patched-cell rows) per run, bounding "
    "the read plan's union legs between full retrains.",
)
def x139_ann_patch_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_consolidate_index,
        ann_gc_index,
        ann_load_index,
        ann_retrain_cells,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    initial = planted.filter(F.col("vec_id") % 16 < 8)
    arrivals = planted.filter(F.col("vec_id") % 16 >= 8)
    assigned, centroids = ivf_build(initial, "embedding", "vec_id", n_cells=4, seed=11)
    cb = pq_train(initial, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(initial, "embedding", "vec_id", cb)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_x139_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)
    ann_append_to_index(spark, path, arrivals)
    occ = (
        ann_load_index(spark, path)
        .table.groupBy("cell_id")
        .count()
        .orderBy(F.desc("count"), "cell_id")
        .collect()  # bounded: n_cells rows
    )
    ranked = [int(r["cell_id"]) for r in occ]
    ann_retrain_cells(spark, path, cells=sorted(ranked[:2]), seed=13)  # patch 1
    ann_retrain_cells(spark, path, cells=[ranked[2]], seed=17)  # patch 2
    primary_files = sorted(fsio.list_files_recursive(spark, f"{path}/data"))
    n_before = ann_load_index(spark, path).table.count()
    ann_consolidate_index(spark, path)
    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_index_meta.json"))
    if len(meta.get("patches", [])) != 1:  # loud-fail invariants
        raise AssertionError(f"consolidation left {meta.get('patches')} patches")
    if sorted(fsio.list_files_recursive(spark, f"{path}/data")) != primary_files:
        raise AssertionError("consolidation touched the primary dir")
    ann_gc_index(spark, path)
    idx = ann_load_index(spark, path)
    if idx.table.count() != n_before:
        raise AssertionError("consolidation changed the row count")
    return (
        idx.pq_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .orderBy("vec_id")
    )


@register(
    "x129_small_file_compaction",
    oracle="""
    -- incremental OPTIMIZE (bin-packing): one big append + three
    -- sliver appends; compact_small merges ONLY the slivers — the big
    -- file's reference is carried byte-identically (big_carried), the
    -- file count drops (files_reduced), content is invariant (this
    -- recompute), and the replace is stamped data_change:false so a
    -- skip-compactions incremental reader steps over it and still
    -- sees exactly the sliver rows as its delta (incremental_skips).
    WITH r AS (
      SELECT l_orderkey * 10 + l_linenumber AS k,
             CAST(l_quantity AS DOUBLE) AS v
      FROM lineitem WHERE l_orderkey % 10 = 1
      UNION ALL
      SELECT o_orderkey + 1000000000, CAST(o_totalprice AS DOUBLE)
      FROM orders WHERE o_orderkey % 100 = 7
    )
    SELECT CAST(k AS BIGINT) AS k, v,
           CAST(TRUE AS BOOLEAN) AS big_carried,
           CAST(TRUE AS BOOLEAN) AS files_reduced,
           CAST(TRUE AS BOOLEAN) AS incremental_skips
    FROM r ORDER BY k
    """,
    doc="X129 incremental small-file compaction (operators/snapshots.py::"
    "compact_small): Delta OPTIMIZE's actual bin-packing behavior — "
    "merge ONLY files below the size threshold (per-file __bytes "
    "recorded in the manifest at every write, the AddFile size field) "
    "into ~threshold-sized outputs and CARRY right-sized files "
    "untouched, so steady-state maintenance on a streaming-fed 100 TB "
    "table costs O(sliver bytes), never O(table) — x91/compact() "
    "remains the full-rewrite clustering/purge/materialization job. "
    "Convergent (merged outputs land right-sized, the next run is a "
    "no-op), row-preserving (data_change:false — skip-compactions "
    "readers step over it), pending MoR deletes refuse (a partial "
    "rewrite would materialize them unevenly).",
)
def x129_small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x129_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    big = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 1)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
            F.col("l_quantity").cast("double").alias("v"),
        )
    )
    v1 = S.append(big.coalesce(1), root)
    big_files = set(S._read_manifest(spark, root, v1)["files"])
    slivers = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 100 == 7
    ).select(
        (F.col("o_orderkey") + F.lit(1000000000)).alias("k"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    n_sliver = 0
    for b in range(3):
        part = slivers.filter(F.col("k") % 3 == b)
        n_sliver += part.count()
        S.append(part.coalesce(1), root)
    m_before = S._read_manifest(spark, root, S.latest_version(spark, root))
    # threshold = the big file's recorded size: slivers are strictly
    # smaller at every SF (they hold ~1% of the big row count)
    threshold = min(m_before["stats"][f]["__bytes"] for f in big_files)
    v = S.compact_small(spark, root, small_bytes=int(threshold))
    m_after = S._read_manifest(spark, root, v)
    big_carried = big_files <= set(m_after["files"])
    files_reduced = len(m_after["files"]) < len(m_before["files"])
    inc = S.read_incremental(
        spark, root, since_version=v1, skip_compactions=True
    )
    incremental_skips = inc.count() == n_sliver
    return (
        S.read_snapshot(spark, root)
        .select(F.col("k").cast("long").alias("k"), "v")
        .withColumn("big_carried", F.lit(bool(big_carried)))
        .withColumn("files_reduced", F.lit(bool(files_reduced)))
        .withColumn("incremental_skips", F.lit(bool(incremental_skips)))
        .orderBy("k")
    )


@register(
    "x130_metadata_distinct",
    oracle="""
    -- APPROX COUNT DISTINCT answered from the MANIFEST alone: per-file
    -- md5-HLL register maps recorded by the incremental analyze
    -- (record_ndv_stats), max-merged in the driver — per-file maxima
    -- then cross-file maxima equals the one-pass global sketch by
    -- max's algebra, and the estimator replays the x100 IEEE sequence,
    -- so the metadata answer is BIT-identical to this base-row
    -- recompute (rounded to 4 for display, like x100). The second
    -- analyze after a fourth append scanned ONLY the new batch's files
    -- (analyze_incremental); a third found nothing to do.
    WITH h AS (SELECT md5(CAST(o_custkey AS VARCHAR) || ':hll') AS h
               FROM orders WHERE o_custkey IS NOT NULL),
    r AS (SELECT
            16*(strpos('0123456789abcdef', substr(h,1,1))-1)
              + (strpos('0123456789abcdef', substr(h,2,1))-1) AS reg,
            4*length(regexp_extract(substr(h,3,16), '^0*'))
              + CASE substr(substr(h,3,16),
                            length(regexp_extract(substr(h,3,16), '^0*'))+1, 1)
                  WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                  WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                  WHEN '7' THEN 1 ELSE 0 END + 1 AS rho
          FROM h),
    m AS (SELECT reg, MAX(rho) AS rho FROM r GROUP BY reg),
    g AS (SELECT 256 - COUNT(*) AS v_zero,
                 CAST(SUM(CAST(power(2, 70 - rho) AS DECIMAL(38,0)))
                      + (256 - COUNT(*)) * CAST(power(2, 70) AS DECIMAL(38,0))
                      AS DOUBLE) AS total
          FROM m),
    e AS (SELECT v_zero,
                 ((CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))
                  * 256) * 256 * power(2, 70) / total AS raw
          FROM g),
    x AS (SELECT v_zero,
                 CASE WHEN raw <= 2.5 * 256 AND v_zero > 0
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / v_zero)
                      ELSE raw END AS est
          FROM e)
    SELECT CAST(x.v_zero AS BIGINT) AS v_zero,
           ROUND(x.est, 4) AS est_r,
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
             AS n_exact,
           CAST(TRUE AS BOOLEAN) AS analyze_incremental,
           CAST(TRUE AS BOOLEAN) AS analyze_idempotent
    FROM x
    """,
    doc="X130 metadata-only distinct count (operators/snapshots.py::"
    "record_ndv_stats + metadata_distinct): ANALYZE-style NDV file "
    "stats — per-file portable md5-HLL register maps land in the "
    "manifest via an INCREMENTAL analyze (only files without registers "
    "are scanned; re-running is free; one metadata-only commit), and "
    "APPROX COUNT DISTINCT is then answered from the manifest with "
    "zero data-file opens: driver-side register max-merge (HLL's "
    "algebra makes per-file-then-cross-file identical to the one-pass "
    "global sketch) + the x100 estimator replayed in the same IEEE "
    "order — the metadata answer is bit-identical to sketching the "
    "base rows, the x107 soundness trick applied to file stats. "
    "Refusals: pending MoR deletes, unanalyzed files. At 100 TB this "
    "is NDV for the optimizer/dashboard at manifest cost, maintained "
    "at O(new files) per analyze cycle.",
)
def x130_metadata_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x130_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    for b in range(3):
        S.append(o.filter(F.col("o_orderkey") % 4 == b), root)
    S.record_ndv_stats(spark, root, "o_custkey", p=8)
    v4 = S.append(o.filter(F.col("o_orderkey") % 4 == 3), root)
    new_files = [
        f
        for f in S._read_manifest(spark, root, v4)["files"]
        if "__hll8_o_custkey" not in S._read_manifest(spark, root, v4)["stats"][f]
    ]
    analyzed = S.record_ndv_stats(spark, root, "o_custkey", p=8)
    analyze_incremental = sorted(analyzed) == sorted(new_files)
    analyze_idempotent = S.record_ndv_stats(spark, root, "o_custkey", p=8) == []
    est, v_zero = S.metadata_distinct(spark, root, "o_custkey", p=8)
    n_exact = o.agg(F.count_distinct("o_custkey")).first()[0]
    return spark.createDataFrame(
        [
            (
                int(v_zero),
                round(est, 4),
                int(n_exact),
                bool(analyze_incremental),
                bool(analyze_idempotent),
            )
        ],
        "v_zero long, est_r double, n_exact long, "
        "analyze_incremental boolean, analyze_idempotent boolean",
    )


@register(
    "x131_merge_schema_evolution",
    oracle="""
    -- MERGE with automatic schema evolution (Delta autoMerge): a merge
    -- whose source carries a NEW column under evolve=True grows the
    -- table schema — matched rows take the source values, untouched
    -- files NULL-backfill at read; a later merge that OMITS a column
    -- inserts typed NULLs; without evolve the historical contract
    -- holds (output pinned to the table's columns — the extra source
    -- column is dropped, pinned by dropped_without_evolve).
    WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS status
                  FROM orders WHERE o_orderkey % 10 = 1),
    m1 AS (SELECT o_orderkey AS k, 'M' AS status,
                  o_orderpriority AS priority
           FROM orders WHERE o_orderkey % 10 = 1 AND o_orderkey % 3 = 0),
    r AS (
      SELECT b.k,
             COALESCE(m1.status, b.status) AS status,
             m1.priority
      FROM base b LEFT JOIN m1 USING (k)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, NULL
      FROM orders WHERE o_orderkey % 10 = 2
    )
    SELECT CAST(k AS BIGINT) AS k, status, priority,
           CAST(TRUE AS BOOLEAN) AS dropped_without_evolve
    FROM r ORDER BY k
    """,
    doc="X131 MERGE schema evolution (operators/snapshots.py::"
    "merge_commit(evolve=True)): Delta's autoMerge — a merge source may "
    "ADD columns (both sides align to the merged schema before the "
    "full-outer join, so update/insert expressions see every column; "
    "the table schema grows in the same commit; untouched carried "
    "files NULL-backfill through the schema-reconciling read), OMIT "
    "columns (inserted rows take typed NULLs), or WIDEN along the "
    "integer lattice (x116 composing with MERGE). The file-pruned COW "
    "shape is unchanged: only key-range-intersecting files rewrite. "
    "cdc_apply_sink(evolve=True) threads this through streaming APPLY "
    "CHANGES for mid-stream source schema additions. Without evolve "
    "the historical pin holds exactly (extra source columns drop, "
    "omissions error).",
)
def x131_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x131_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 10 == 1).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("status")
    )
    S.append(base, root, stats_cols=["k"])
    m1 = o.filter(
        (F.col("o_orderkey") % 10 == 1) & (F.col("o_orderkey") % 3 == 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.lit("M").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    src_wins = {c: F.col(f"s.{c}") for c in m1.columns}
    # historical contract: without evolve the extra column drops silently
    S.merge_commit(root, m1, keys=["k"], when_matched_update=src_wins, prune_on="k")
    dropped = "priority" not in S.read_snapshot(spark, root).columns
    # evolve: the same merge grows the schema; matched rows take source
    S.merge_commit(
        root, m1, keys=["k"], when_matched_update=src_wins, prune_on="k",
        evolve=True,
    )
    # omitting source: inserted rows take typed NULLs for 'priority'
    m2 = o.filter(F.col("o_orderkey") % 10 == 2).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("status")
    )
    S.merge_commit(root, m2, keys=["k"], prune_on="k", evolve=True)
    return (
        S.read_snapshot(spark, root)
        .select(F.col("k").cast("long").alias("k"), "status", "priority")
        .withColumn("dropped_without_evolve", F.lit(bool(dropped)))
        .orderBy("k")
    )


@register(
    "x132_multi_table_commit",
    oracle="""
    -- cross-table transaction: stage-everywhere (WAP prepare), ONE
    -- atomic coordinator record as the decision, publish-everywhere
    -- (idempotent commits). txn t1 commits cleanly; txn t2 CRASHES
    -- between the two publishes (table A visible, table B not — the
    -- documented window: window_observed) and recovery completes it
    -- from the coordinator record (recovered); txn t3 is staged but
    -- never decided and aborts without a trace (aborted_invisible).
    -- Final contents of both tables = this literal recompute.
    WITH r AS (
      SELECT 'A' AS side, o_orderkey AS k
      FROM orders WHERE o_orderkey % 10 IN (1, 2, 3)
      UNION ALL
      SELECT 'B', c_custkey FROM customer WHERE c_custkey % 10 IN (1, 2, 3)
    )
    SELECT side, CAST(k AS BIGINT) AS k,
           CAST(TRUE AS BOOLEAN) AS window_observed,
           CAST(TRUE AS BOOLEAN) AS recovered,
           CAST(TRUE AS BOOLEAN) AS aborted_invisible
    FROM r ORDER BY side, k
    """,
    doc="X132 cross-table atomic commit (operators/snapshots.py::"
    "multi_stage/multi_commit/multi_abort/multi_txn_recover): two-phase "
    "commit with presumed abort over the WAP machinery — stage_append "
    "is the prepare (invisible everywhere), one atomic coordinator "
    "record under the first root is the decision log, publish_staged "
    "the idempotent per-table commit action, so a crash at ANY point "
    "either aborts cleanly (undecided: staged batches reclaim) or "
    "completes under recovery (decided: re-publish is a no-op where it "
    "already landed). Readers can observe A-before-B during the "
    "publish window — per-table commits stay independently atomic; "
    "cross-table snapshot isolation needs a shared catalog by "
    "definition (Iceberg gets it from one; Delta documents multi-table "
    "atomicity as out of scope). Eventual all-or-nothing is the claim, "
    "and it is crash-point tested.",
)
def x132_multi_table_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x132_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    ra, rb = os.path.join(base, "A"), os.path.join(base, "B")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    S.append(o.filter(F.col("k") % 10 == 1), ra)
    S.append(c.filter(F.col("k") % 10 == 1), rb)
    # t1: clean two-table commit
    S.multi_stage(
        [(o.filter(F.col("k") % 10 == 2), ra), (c.filter(F.col("k") % 10 == 2), rb)],
        "t1",
    )
    S.multi_commit(spark, [ra, rb], "t1")
    # t2: decided, then CRASH between the publishes (A landed, B not)
    S.multi_stage(
        [(o.filter(F.col("k") % 10 == 3), ra), (c.filter(F.col("k") % 10 == 3), rb)],
        "t2",
    )
    fsio.create_text_atomic(
        spark,
        f"{ra}/_snapshots/mtxn-t2.json",
        _json.dumps({"txn_id": "t2", "roots": [ra, rb]}),
    )
    S.publish_staged(spark, ra, "mtxn-t2")  # ...crash here
    n_b_before = S.read_snapshot(spark, rb).count()
    window_observed = (
        S.read_snapshot(spark, ra).filter(F.col("k") % 10 == 3).count() > 0
        and S.read_snapshot(spark, rb).filter(F.col("k") % 10 == 3).count() == 0
    )
    recovered_txns = S.multi_txn_recover(spark, ra)
    recovered = recovered_txns == ["t2"] and S.read_snapshot(spark, rb).count() > n_b_before
    # t3: staged, never decided -> presumed abort, no trace anywhere
    S.multi_stage(
        [(o.filter(F.col("k") % 10 == 4), ra), (c.filter(F.col("k") % 10 == 4), rb)],
        "t3",
    )
    S.multi_abort(spark, [ra, rb], "t3")
    aborted_invisible = (
        S.read_snapshot(spark, ra).filter(F.col("k") % 10 == 4).count() == 0
        and S.read_snapshot(spark, rb).filter(F.col("k") % 10 == 4).count() == 0
    )
    both = (
        S.read_snapshot(spark, ra).select(F.lit("A").alias("side"), "k")
        .unionByName(S.read_snapshot(spark, rb).select(F.lit("B").alias("side"), "k"))
    )
    return (
        both.select("side", F.col("k").cast("long").alias("k"))
        .withColumn("window_observed", F.lit(bool(window_observed)))
        .withColumn("recovered", F.lit(bool(recovered)))
        .withColumn("aborted_invisible", F.lit(bool(aborted_invisible)))
        .orderBy("side", "k")
    )


@register(
    "x133_table_history",
    oracle="""
    -- DESCRIBE HISTORY from the manifests alone: one row per version
    -- with op, metadata-derived row count (sum of per-file __rows —
    -- physical rows, so the MoR-delete version still counts the dead
    -- row until the compact materializes), the idempotence token, and
    -- the data-change marker; zero data-file opens. The planted
    -- five-commit sequence makes every column's semantics visible.
    WITH c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                FROM orders WHERE o_orderkey % 10 = 1),
    c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
           FROM orders WHERE o_orderkey % 10 IN (1, 2))
    SELECT * FROM (
      VALUES
        (CAST(1 AS BIGINT), 'append', (SELECT n FROM c1),
         CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN)),
        (2, 'append', (SELECT n FROM c2), 'batch-2', NULL),
        (3, 'rename-column', (SELECT n FROM c2), NULL, NULL),
        (4, 'mor-delete', (SELECT n FROM c2), NULL, NULL),
        (5, 'replace', (SELECT n FROM c2) - 1, NULL, CAST(TRUE AS BOOLEAN))
    ) AS t(version, op, n_rows, txn, data_change)
    ORDER BY version
    """,
    doc="X133 table history (operators/snapshots.py::table_history): "
    "DESCRIBE HISTORY from the manifests alone — one row per retained "
    "version with op, parent, file/row counts (row count only when "
    "every referenced file carries a __rows stat; MoR-pending versions "
    "report physical rows, dead included, like the stats they come "
    "from), txn token, and data-change marker. O(retained manifests) "
    "metadata reads, zero data IO, zero Spark jobs — the audit surface "
    "Delta exposes as a table function, and the operational answer to "
    "'what happened to this table and when' that the reference's flat "
    "file could never give.",
)
def x133_table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Row

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x133_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_custkey").cast("int").alias("c")
    )
    S.append(o.filter(F.col("k") % 10 == 1), root)
    S.append(o.filter(F.col("k") % 10 == 2), root, txn="batch-2")
    S.rename_column(spark, root, "c", "cust")
    first_k = o.filter(F.col("k") % 10 == 1).agg(F.min("k")).first()[0]
    S.mor_delete(spark.createDataFrame([Row(k=int(first_k))]), root, keys=["k"])
    S.compact(spark, root)  # materializes the delete: data_change true
    hist = S.table_history(spark, root)
    return spark.createDataFrame(
        [
            (int(h["version"]), h["op"], h["n_rows"], h["txn"], h["data_change"])
            for h in hist
        ],
        "version long, op string, n_rows long, txn string, data_change boolean",
    ).orderBy("version")


@register(
    "x134_partitions_report",
    oracle="""
    -- SHOW PARTITIONS + per-partition row counts from the MANIFEST
    -- alone, PER ERA under partition-spec evolution (r12 verdict
    -- task 4): era-1 files (partitioned by o_orderstatus) and era-2
    -- files (appended under o_orderpriority after an explicit spec
    -- change) each report under their OWN era's column — paths are
    -- immutable and self-describe the spec that wrote them. Equality
    -- with the two GROUP BY recomputes is the correctness claim.
    SELECT spec, value, CAST(n AS BIGINT) AS n_rows,
           CAST(TRUE AS BOOLEAN) AS unpartitioned_refused
    FROM (
      SELECT 'o_orderstatus' AS spec, o_orderstatus AS value, COUNT(*) AS n
      FROM orders WHERE o_orderkey % 10 = 1 GROUP BY o_orderstatus
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority, COUNT(*)
      FROM orders WHERE o_orderkey % 10 = 3 GROUP BY o_orderpriority
    ) ORDER BY spec, value
    """,
    doc="X134 partitions report (operators/snapshots.py::"
    "partitions_report): SHOW PARTITIONS with per-partition file and "
    "row counts answered from the manifest — partition values parse "
    "from the Hive col=val path segments (typed through the recorded "
    "schema, the same parser pruning uses), counts sum per-file "
    "__rows. PER-ERA under spec evolution (r12 verdict task 4): each "
    "file's immutable path self-describes the spec that wrote it, so "
    "an evolved table reports both eras' values, each row tagged with "
    "its era's column list — never lumping old-era files into NULL. "
    "Zero data-file opens: the partition dashboard at a million files "
    "without the listing. Refusals: unpartitioned tables, pending MoR "
    "deletes, files without row stats.",
)
def x134_partitions_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x134_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    S.append(
        o.filter(F.col("o_orderkey") % 10 == 1)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority"),
        root, partition_by="o_orderstatus",
    )
    # era 2: an explicit spec change — new files land under
    # o_orderpriority= while era-1 files keep their o_orderstatus= paths
    S.append(
        o.filter(F.col("o_orderkey") % 10 == 3)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority"),
        root, partition_by="o_orderpriority", allow_spec_change=True,
    )
    refused = False
    flat = os.path.join(tempfile.gettempdir(), f"nagios_etl_x134f_{os.getpid()}")
    shutil.rmtree(flat, ignore_errors=True)
    S.append(o.filter(F.col("o_orderkey") % 10 == 1).select("o_orderkey"), flat)
    try:
        S.partitions_report(spark, flat)
    except ValueError:
        refused = True
    rep = S.partitions_report(spark, root)
    return spark.createDataFrame(
        [
            (",".join(r["spec"]), r["value"], int(r["n_rows"]), bool(refused))
            for r in rep
        ],
        "spec string, value string, n_rows long, unpartitioned_refused boolean",
    ).orderBy("spec", "value")


@register(
    "x140_cdf_incremental_mv",
    oracle="""
    -- Incremental MV maintenance driven by the TABLE-LEVEL change feed
    -- (x136 composed with the signed-delta MV algebra): a batch MERGE's
    -- recorded transitions feed mv_apply_delta — postimages/inserts as
    -- +1 rows, preimages/deletes as -1 rows — and the maintained view
    -- must equal this full GROUP-BY recompute of the post-merge state,
    -- the base table never re-scanned.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_custkey % 7 AS BIGINT) AS g,
             CAST(o_orderkey % 1000 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 10 = 6
    ), state2 AS (
      SELECT k, g, CASE WHEN k % 4 = 0 THEN v + 100 ELSE v END AS v FROM base
      UNION ALL SELECT -k, g, 55 FROM base WHERE k % 9 = 0
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv
    FROM state2 GROUP BY g ORDER BY g
    """,
    doc="X140 CDF-driven incremental MV (operators/merge.py::"
    "mv_apply_delta consuming operators/snapshots.py::read_changes): "
    "the batch-MERGE counterpart of st31's streaming MV maintenance — "
    "with the table-level feed on, a MERGE's atomically-recorded "
    "transitions ARE the signed delta (insert/update_postimage -> +1, "
    "update_preimage/delete -> -1), so a downstream summary table "
    "refreshes at O(transitions) cost with zero base re-scan and no "
    "separate feed infrastructure. Equality with the full recompute is "
    "the classic view-maintenance soundness claim. 100 TB: the delta "
    "aggregate is |changes|-sized; the view join is |groups|-sized.",
)
def x140_cdf_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.merge import mv_apply_delta, mv_build

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x140_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 6)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_custkey") % 7).cast("long").alias("g"),
            (F.col("o_orderkey") % 1000).cast("long").alias("v"),
        )
    )
    S.set_change_feed(spark, root, True)
    S.append(base, root, stats_cols=["k"])  # v1
    mv = mv_build(S.read_snapshot(spark, root, 1), ["g"], "n", {"sv": ("v", 38, 0)})
    batch = (
        base.filter(F.col("k") % 4 == 0).withColumn("v", F.col("v") + 100)
    ).unionByName(
        base.filter(F.col("k") % 9 == 0).select(
            (-F.col("k")).alias("k"), F.col("g"), F.lit(55).cast("long").alias("v")
        )
    )
    S.merge_commit(
        root, batch, keys=["k"], prune_on="k",
        when_matched_update={c: F.col(f"s.{c}") for c in ("k", "g", "v")},
    )  # v2: transitions recorded atomically
    feed = S.read_changes(spark, root, 1)  # (1, 2]: the merge's delta only
    ins = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("k", "g", "v")
    dels = feed.filter(
        F.col("_change_type").isin("update_preimage", "delete")
    ).select("k", "g", "v")
    maintained = mv_apply_delta(mv, ins, dels, ["g"], "n", {"sv": ("v", 38, 0)})
    return maintained.select(
        "g", F.col("n").cast("long").alias("n"), F.col("sv").cast("long").alias("sv")
    ).orderBy("g")


@register(
    "x138_multi_read_consistency",
    oracle="""
    -- Cross-table consistent cut: with txn T decided and published on
    -- table A only (planted crash), multi_read pins A BELOW its half —
    -- 'before' sees exactly the pre-T contents of BOTH tables (A's
    -- later unrelated append is deferred too: a cut is a frontier);
    -- after recovery the cut advances to include T's both halves AND
    -- the unrelated append. All four aggregates recompute literally.
    WITH a AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders WHERE o_orderkey % 10 = 4),
         b AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey % 10 = 4)
    SELECT 'before' AS phase, 'a' AS tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(k) AS BIGINT) AS sum_k FROM a
    UNION ALL SELECT 'before', 'b', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT) FROM b
    UNION ALL SELECT 'after', 'a', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM (SELECT k FROM a UNION ALL SELECT -k FROM a
            UNION ALL SELECT k + 10000000 FROM a)
    UNION ALL SELECT 'after', 'b', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM (SELECT k FROM b UNION ALL SELECT -k FROM b)
    ORDER BY phase, tag
    """,
    doc="X138 cross-table read consistency (r11 verdict task 6; "
    "operators/snapshots.py::multi_read/multi_read_versions): the "
    "reader-side close of x132's A-before-B window — st33's "
    "visibility protocol generalized to 2PC participants. Each table "
    "in the read set is pinned to the highest version at which every "
    "decided cross-table transaction is uniformly included or "
    "uniformly excluded (iterated to a fixpoint: lowering one pin can "
    "expose an interleaved transaction's tear), so a reader never "
    "sees one table's half of a decided transaction without its "
    "siblings'. Common case costs one metadata listing per root "
    "(coordinator records are retired after commit). Single-table "
    "reads are never held back — consistency is a property of the "
    "read SET.",
)
def x138_multi_read_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x138_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    ra, rb = f"{base}/a", f"{base}/b"
    a = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 4)
        .select(F.col("o_orderkey").cast("long").alias("k"))
    )
    b = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 4)
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    S.append(a, ra)
    S.append(b, rb)
    S.multi_stage([(a.select((-F.col("k")).alias("k")), ra),
                   (b.select((-F.col("k")).alias("k")), rb)], "rt")
    # the decision landed, then the coordinator crashed after ONE publish
    fsio.create_text_atomic(
        spark, f"{ra}/_snapshots/mtxn-rt.json",
        _json.dumps({"txn_id": "rt", "roots": [ra, rb]}),
    )
    S.publish_staged(spark, ra, "mtxn-rt")
    S.append(a.select((F.col("k") + 10000000).alias("k")), ra)  # unrelated

    def agg(df, phase, tag):
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("sum_k"),
        ).select(F.lit(phase).alias("phase"), F.lit(tag).alias("tag"), "n_rows", "sum_k")

    cut = S.multi_read(spark, [ra, rb])
    before_a, before_b = agg(cut[ra], "before", "a"), agg(cut[rb], "before", "b")
    S.multi_txn_recover(spark, ra)
    cut2 = S.multi_read(spark, [ra, rb])
    after_a, after_b = agg(cut2[ra], "after", "a"), agg(cut2[rb], "after", "b")
    return (
        before_a.unionByName(before_b).unionByName(after_a).unionByName(after_b)
        .orderBy("phase", "tag")
    )


@register(
    "x137_clustered_incremental_compaction",
    oracle="""
    -- Incremental OPTIMIZE ZORDER BY (x129 bin-pack composed with x94
    -- Z-order): the quadrant GROUP BY is the row-invariance proof (a
    -- layout-only rewrite must reproduce the recompute exactly), and
    -- the literal flags pin the layout claims — locality_improved (a
    -- 2-D corner box plans FEWER files than the 8 scattered slivers it
    -- replaced), layout_only (data_change:false), converged (the
    -- progress guard reaches a fixpoint).
    WITH base AS (
      SELECT event_id,
             CAST(event_id % 97 AS BIGINT) AS x,
             CAST((event_id * 37) % 97 AS BIGINT) AS y
      FROM events WHERE event_id % 3 = 0
    )
    SELECT CAST(x // 49 AS BIGINT) AS xq, CAST(y // 49 AS BIGINT) AS yq,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_id,
           CAST(TRUE AS BOOLEAN) AS locality_improved,
           CAST(TRUE AS BOOLEAN) AS layout_only,
           CAST(TRUE AS BOOLEAN) AS converged
    FROM base GROUP BY 1, 2 ORDER BY xq, yq
    """,
    doc="X137 clustered incremental compaction (r11 verdict task 5; "
    "operators/snapshots.py::compact_small(cluster_by=) via "
    "_zorder_shape): the steady-state maintenance loop that KEEPS a "
    "growing table's Z-order clustering — bin-packs ONLY sub-threshold "
    "sliver files and Z-orders the rewritten output (range-partition "
    "on the Morton key, sort within), leaving right-sized clustered "
    "files byte-untouched; a progress guard (merging must strictly "
    "reduce the file count) makes the loop convergent. This is what "
    "keeps x123's multi-column skipping paying without re-paying x94's "
    "full-table rewrite. 100 TB: O(sliver bytes) per run, sizes from "
    "the manifest's __bytes — no listing, no statting.",
)
def x137_clustered_incremental_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x137_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select(
            "event_id",
            (F.col("event_id") % 97).cast("long").alias("x"),
            ((F.col("event_id") * 37) % 97).cast("long").alias("y"),
        )
    )
    # 8 slivers, each scattered over the WHOLE (x, y) space — the
    # worst case for multi-column skipping
    for k in range(8):
        S.append(
            base.filter(F.col("event_id") % 8 == k).coalesce(1),
            root, stats_cols=["x", "y"],
        )
    m = S._read_manifest(spark, root, 8)
    thr = 2 * max(m["stats"][f]["__bytes"] for f in m["files"])
    _, planned_before, _ = S.read_snapshot_pruned_multi(
        spark, root, [("x", 0, 47), ("y", 0, 47)]
    )
    v = S.compact_small(spark, root, small_bytes=int(thr), cluster_by=["x", "y"])
    layout_only = S._read_manifest(spark, root, v).get("data_change") is False
    _, planned_after, _ = S.read_snapshot_pruned_multi(
        spark, root, [("x", 0, 47), ("y", 0, 47)]
    )
    locality = planned_after < planned_before
    converged = False
    for _ in range(5):
        if S.compact_small(spark, root, small_bytes=int(thr), cluster_by=["x", "y"]) is None:
            converged = True
            break
    return (
        S.read_snapshot(spark, root)
        .groupBy(
            (F.col("x") / 49).cast("long").alias("xq"),
            (F.col("y") / 49).cast("long").alias("yq"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").cast("long").alias("sum_id"),
        )
        .withColumn("locality_improved", F.lit(bool(locality)))
        .withColumn("layout_only", F.lit(bool(layout_only)))
        .withColumn("converged", F.lit(bool(converged)))
        .orderBy("xq", "yq")
    )


@register(
    "x136_table_change_feed",
    oracle="""
    -- Table-level CHANGE DATA FEED (Delta enableChangeDataFeed): the
    -- oracle recomputes every transition literally — v1 derived inserts
    -- (append), v2 MERGE update pre/post pairs + inserts (recorded
    -- ATOMICALLY in the committing manifest: no feed-before-merge
    -- window), v3 MoR-delete rows carrying the OLD values from the
    -- post-merge state. Equality is the replay==delta proof.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS c,
             o_orderstatus AS st
      FROM orders WHERE o_orderkey % 100 = 3
    ), upd AS (
      SELECT k, c, st FROM base WHERE k % 3 = 0
    ), state2 AS (
      SELECT k, c, CASE WHEN k % 3 = 0 THEN 'X' ELSE st END AS st FROM base
      UNION ALL SELECT -k, c, 'N' FROM base WHERE k % 7 = 3
    )
    SELECT k, c, st, 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version FROM base
    UNION ALL SELECT k, c, st, 'update_preimage', 2 FROM upd
    UNION ALL SELECT k, c, 'X', 'update_postimage', 2 FROM upd
    UNION ALL SELECT -k, c, 'N', 'insert', 2 FROM base WHERE k % 7 = 3
    UNION ALL SELECT k, c, st, 'delete', 3 FROM state2 WHERE k % 5 = 0
    ORDER BY _commit_version, _change_type, k
    """,
    doc="X136 table-level change data feed (r11 verdict task 4; "
    "operators/snapshots.py::set_change_feed/read_changes + the "
    "writer integrations in merge_commit/mor_delete/mor_upsert): a "
    "table property that makes every row-mutating writer record its "
    "row-level transitions — Delta's enableChangeDataFeed. Change "
    "files commit ATOMICALLY in the same manifest as the data change "
    "(AddCDCFile), so unlike the streaming sinks' separate feed "
    "tables (st31) there is NO feed-before-merge window and no "
    "visibility gate is needed; add-only and file-replacing commits "
    "derive their feed from the manifest file diff at read time (zero "
    "write amplification on the hot append path). Vacuum keeps a "
    "version's change files exactly as long as the version; unrecorded "
    "row-mutating commits in range REFUSE. 100 TB: feed read cost is "
    "O(change files + added files in range), never a table scan.",
)
def x136_table_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x136_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 3)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            F.col("o_custkey").cast("long").alias("c"),
            F.col("o_orderstatus").alias("st"),
        )
    )
    S.set_change_feed(spark, root, True)
    S.append(base, root, stats_cols=["k"])  # v1: feed derives inserts
    batch = (
        base.filter(F.col("k") % 3 == 0).withColumn("st", F.lit("X"))
    ).unionByName(
        base.filter(F.col("k") % 7 == 3).select(
            (-F.col("k")).alias("k"), F.col("c"), F.lit("N").alias("st")
        )
    )
    S.merge_commit(
        root, batch, keys=["k"], prune_on="k",
        when_matched_update={
            "k": F.col("s.k"), "c": F.col("s.c"), "st": F.col("s.st")
        },
    )  # v2: change files in the committing manifest
    live = S.read_snapshot(spark, root)
    S.mor_delete(
        live.filter(F.col("k") % 5 == 0).select("k"), root, keys=["k"]
    )  # v3: delete rows carry the old values
    return S.read_changes(spark, root, 0).orderBy(
        "_commit_version", "_change_type", "k"
    )


@register(
    "x135_multi_level_partitions",
    oracle="""
    -- Composite (2-level) Hive partition spec end-to-end, with
    -- ':'-bearing (Hive-escaped) values in BOTH levels: per-partition
    -- counts are recomputed by GROUP BY over the replace-adjusted base;
    -- planned_files/total_files are LITERAL claims about the pruning
    -- DECISION (1 file per composite value by construction: the box
    -- hh='02:00:00', q in ['15:00','30:00'] plans exactly 2 of 12
    -- files) and box_rows re-counts what the pruned read returned.
    WITH base AS (
      SELECT event_id,
             printf('%02d:00:00', CAST(event_id % 4 AS INT)) AS hh,
             printf('%02d:00', CAST((event_id % 3) * 15 AS INT)) AS q
      FROM events WHERE event_id % 7 = 0
    ), after AS (
      SELECT * FROM base
      WHERE NOT (hh = '01:00:00' AND q = '15:00' AND (event_id // 84) % 2 = 1)
    ), rep AS (
      SELECT hh, q, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM after GROUP BY hh, q
    ), box AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS box_rows FROM after
      WHERE hh = '02:00:00' AND q BETWEEN '15:00' AND '30:00'
    )
    SELECT rep.hh, rep.q, rep.n_rows,
           CAST(2 AS BIGINT) AS planned_files,
           CAST(12 AS BIGINT) AS total_files,
           box.box_rows
    FROM rep, box ORDER BY hh, q
    """,
    doc="X135 multi-column partition specs (r11 verdict task 3; "
    "operators/snapshots.py::_norm_pcols and the composite paths in "
    "replace_partitions/partitions_report/read_snapshot_pruned_multi): "
    "a 2-level Hive layout (hh=…/q=…, both levels carrying ':' so both "
    "segments are Hive-escaped on disk) written as partition_by=[hh,q]; "
    "composite pruning plans path values per LEVEL (multiplicative — "
    "the (hh, q-range) box plans exactly the 2 matching files of 12, a "
    "literal oracle claim on the pruning decision); replace_partitions "
    "replaces the COMPOSITE unit only; partitions_report reports "
    "per-level unescaped values with manifest-only row counts. Delta/"
    "Iceberg standard surface; 100 TB: date=/region= layouts prune at "
    "manifest-planning time, zero file opens.",
)
def x135_multi_level_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x135_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            F.format_string("%02d:00:00", (F.col("event_id") % 4).cast("int")).alias("hh"),
            F.format_string("%02d:00", ((F.col("event_id") % 3) * 15).cast("int")).alias("q"),
        )
    )
    # one file per composite value: each (hh, q) lives in exactly one
    # task after the repartition, so planned-file counts are layout
    # facts, not data accidents
    S.overwrite(
        base.repartition("hh", "q"), root,
        partition_by=["hh", "q"], stats_cols=["event_id"],
    )
    # replace exactly ONE composite cell with a thinned recompute — the
    # other 11 cells' files must carry untouched
    batch = base.filter(
        (F.col("hh") == "01:00:00") & (F.col("q") == "15:00")
        & (F.expr("event_id div 84") % 2 == 0)
    ).coalesce(1)
    S.replace_partitions(batch, root)
    pruned, planned, total = S.read_snapshot_pruned_multi(
        spark, root,
        [("hh", "02:00:00", "02:00:00"), ("q", "15:00", "30:00")],
    )
    box_rows = pruned.filter(
        (F.col("hh") == "02:00:00") & F.col("q").between("15:00", "30:00")
    ).count()
    rep = S.partitions_report(spark, root)
    return spark.createDataFrame(
        [
            (r["value"][0], r["value"][1], int(r["n_rows"]), int(planned),
             int(total), int(box_rows))
            for r in rep
        ],
        "hh string, q string, n_rows long, planned_files long, "
        "total_files long, box_rows long",
    ).orderBy("hh", "q")


@register(
    "x141_delta_log_replay",
    oracle="""
    -- The delta-logged manifest layer itself (r12 verdict task 8): 35
    -- commits (> 2x the 16-commit checkpoint cadence) of modulo slices,
    -- a mid-log TAG, a mid-log VACUUM (survivor set non-contiguous:
    -- {tagged 12, 21..24}), then more delta commits — and reconstruction
    -- probed at three planted versions with a COLD state cache, so the
    -- reads genuinely walk checkpoint + delta chains. Version v's
    -- content is slices 0..v-1 by construction, so each probe is a
    -- literal modulo predicate here.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k
      FROM orders WHERE o_orderkey % 10 = 7
    ), probes AS (
      SELECT 'v12' AS probe, k FROM base WHERE k % 35 <= 11
      UNION ALL SELECT 'v23' AS probe, k FROM base WHERE k % 35 <= 22
      UNION ALL SELECT 'v35' AS probe, k FROM base WHERE k % 35 <= 34
    )
    SELECT probe, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk
    FROM probes GROUP BY probe ORDER BY probe
    """,
    doc="X141 delta-log manifest replay (operators/snapshots.py::"
    "_commit/_state/_ensure_checkpoint — the r11-verdict delta-log "
    "storage, given its own registry oracle per r12 verdict task 8): "
    "35 commits write O(files-touched) delta records with full "
    "checkpoints every 16th commit and at every vacuum-retained "
    "version; a tag pins version 12 through a vacuum whose survivor "
    "set is therefore non-contiguous; probes at the tagged version, a "
    "vacuum-retained mid version, and the latest all reconstruct with "
    "a cleared _STATE_CACHE (a fresh process's walk: nearest base, "
    "deltas folded forward). 100 TB: append metadata cost stays O(K) "
    "per commit regardless of table file count; the walk is bounded "
    "by the checkpoint cadence.",
)
def x141_delta_log_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x141_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = cache_once(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 7)
        .select(F.col("o_orderkey").cast("long").alias("k"))
    )
    # single_file (r15): each slice is a ~KB batch — the coalesce(1)
    # variant paid a distributed stats read-back job per commit on top
    # of the write job; single_file writes one file and computes the
    # __rows stat on the driver from its footer (35 Spark jobs instead
    # of 70, commit content identical)
    S.overwrite(
        base.filter(F.col("k") % 35 == 0), root, single_file=True
    )  # v1 (full)
    for j in range(1, 24):
        S.append(
            base.filter(F.col("k") % 35 == j), root, single_file=True
        )  # v2..v24
    S.create_tag(spark, root, "probe12", 12)
    # survivor set {12, 21, 22, 23, 24}: non-contiguous, every member
    # checkpointed by vacuum before the expired manifests drop
    S.vacuum(spark, root, keep_last=4)
    for j in range(24, 35):
        S.append(
            base.filter(F.col("k") % 35 == j), root, single_file=True
        )  # v25..v35
    S._STATE_CACHE.clear()  # force a fresh process's log walk
    p12 = S.read_snapshot_tag(spark, root, "probe12").withColumn("probe", F.lit("v12"))
    p23 = S.read_snapshot(spark, root, 23).withColumn("probe", F.lit("v23"))
    p35 = S.read_snapshot(spark, root).withColumn("probe", F.lit("v35"))
    return (
        p12.unionByName(p23).unionByName(p35)
        .groupBy("probe")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sk"),
        )
        .orderBy("probe")
    )


@register(
    "x142_cdf_across_compaction",
    oracle="""
    -- CDF continuity across a delete-materializing compaction (r12
    -- verdict task 3): with the feed on, v1 appends (derived inserts),
    -- v2 MoR-deletes k%7==0 (recorded pre-image deletes), v3 compacts
    -- — materializing the deletes but contributing ZERO feed rows (the
    -- killed rows already left the logical table at v2; a re-emit
    -- would double-remove on replay), v4 appends. A long-lag consumer
    -- reading (0, latest] crosses the compaction WITHOUT refusal, and
    -- the feed groups to exactly these three (version, type) rows plus
    -- the final-state checksum — no (3, *) row may exist.
    WITH b9 AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k
      FROM orders WHERE o_orderkey % 10 = 9
    ), b4 AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k
      FROM orders WHERE o_orderkey % 10 = 4
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS cv, 'insert' AS ctype,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk
      FROM b9
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'delete',
             CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM b9 WHERE k % 7 = 0
      UNION ALL
      SELECT CAST(4 AS BIGINT), 'insert',
             CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM b4
      UNION ALL
      SELECT CAST(99 AS BIGINT), 'final',
             CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM (SELECT k FROM b9 WHERE k % 7 <> 0 UNION ALL SELECT k FROM b4)
    ) ORDER BY cv
    """,
    doc="X142 change feed across a materializing compaction (operators/"
    "snapshots.py::compact + read_changes; r12 verdict task 3): a "
    "compaction that folds pending MoR deletes in records an EMPTY "
    "change-file list when the feed is on — recorded-empty, not "
    "unrecorded — because compaction is logically row-preserving (the "
    "dead rows fed their pre-images at the mor_delete commit and were "
    "never visible after it), so a long-lag feed consumer crosses the "
    "compaction without a full resync and multiset replay stays exact. "
    "100 TB: feed continuity no longer couples the consumer's lag to "
    "the compaction cadence; file-diff consumers (read_incremental) "
    "still correctly refuse the data-changing rewrite.",
)
def x142_cdf_across_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x142_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    b9 = orders.filter(F.col("o_orderkey") % 10 == 9).select(
        F.col("o_orderkey").cast("long").alias("k")
    )
    b4 = orders.filter(F.col("o_orderkey") % 10 == 4).select(
        F.col("o_orderkey").cast("long").alias("k")
    )
    S.set_change_feed(spark, root, True)
    S.append(b9, root, stats_cols=["k"])  # v1
    S.mor_delete(b9.filter(F.col("k") % 7 == 0), root, keys=["k"])  # v2
    assert S.compact(spark, root) == 3  # v3: materializes the deletes
    S.append(b4, root, stats_cols=["k"])  # v4
    feed = S.read_changes(spark, root, 0)  # long-lag: crosses v3
    agg = feed.groupBy(
        F.col("_commit_version").alias("cv"),
        F.col("_change_type").alias("ctype"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sk"),
    )
    final = (
        S.read_snapshot(spark, root)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sk"),
        )
        .select(
            F.lit(99).cast("long").alias("cv"),
            F.lit("final").alias("ctype"),
            "n",
            "sk",
        )
    )
    return agg.unionByName(final).orderBy("cv")


@register(
    "x143_manifest_list_sharding",
    oracle="""
    -- Manifest-list sharding (r12 verdict task 2): a 16-file
    -- range-clustered table checkpointed as range-enveloped SHARDS;
    -- a pruned read over rid [17, 48] must (a) return exactly the
    -- recomputed box — rows 17..48 of the dense rank over k — while
    -- (b) parsing strictly fewer checkpoint bytes than a full
    -- reconstruction and (c) planning fewer files than the table
    -- holds, with the true total intact (all literal flags).
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
      FROM orders WHERE o_orderkey % 10 = 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sk,
           CAST(TRUE AS BOOLEAN) AS fewer_bytes,
           CAST(TRUE AS BOOLEAN) AS fewer_files,
           CAST(TRUE AS BOOLEAN) AS total_exact
    FROM base WHERE rid BETWEEN 17 AND 48
    """,
    doc="X143 manifest-list sharding (r12 verdict task 2; operators/"
    "snapshots.py::_write_checkpoint/_plan_pruned_state): checkpoints "
    "of big tables split into range-enveloped shard files (Iceberg's "
    "manifest-list/manifest layout) and read_snapshot_pruned* walk "
    "nearest-base-plus-deltas parsing ONLY the shards whose envelopes "
    "intersect the predicate — shard exclusion is provably a subset of "
    "the per-file check, so the plan is identical while the checkpoint "
    "bytes parsed drop to O(matching shards). The query shrinks the "
    "shard constants (restored in finally), builds a 16-file "
    "range-clustered table, checkpoints, and probes with a COLD state "
    "cache + the byte counter. 100 TB: at 10^6 files a day-range read "
    "parses a few shards, not a ~1000-shard checkpoint — the last "
    "O(files) READ ceiling of the manifest layer removed (writers' "
    "full reconstruction remains O(files), documented in SCALING.md).",
)
def x143_manifest_list_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x143_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 2)
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .withColumn("rid", F.row_number().over(Window.orderBy("k")))
    )
    saved = (S._SHARD_MIN_FILES, S._SHARD_SIZE)
    S._SHARD_MIN_FILES, S._SHARD_SIZE = 8, 4
    try:
        S.append(base.repartitionByRange(16, "rid"), root, stats_cols=["rid"])
        S.append(base.limit(0), root, stats_cols=["rid"], single_file=True)  # v2 delta
        S._ensure_checkpoint(spark, root, 2)  # sharded: 16 files / 4 per shard
        S._STATE_CACHE.clear()
        S._CKPT_BYTES_READ["n"] = 0
        df, planned, total = S.read_snapshot_pruned(spark, root, "rid", 17, 48)
        pruned_bytes = S._CKPT_BYTES_READ["n"]
        box = df.filter(F.col("rid").between(17, 48)).agg(
            F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sk")
        )
        S._STATE_CACHE.clear()
        S._CKPT_BYTES_READ["n"] = 0
        m_full = S._read_manifest(spark, root, 2)
        full_bytes = S._CKPT_BYTES_READ["n"]
    finally:
        S._SHARD_MIN_FILES, S._SHARD_SIZE = saved
    return box.select(
        "n",
        "sk",
        F.lit(bool(0 < pruned_bytes < full_bytes)).alias("fewer_bytes"),
        F.lit(bool(0 < planned < total)).alias("fewer_files"),
        F.lit(bool(total == len(m_full["files"]))).alias("total_exact"),
    )


@register(
    "x144_multi_read_coordinator_mirror",
    oracle="""
    -- r12 verdict task 1: a decided 3-table txn whose COORDINATOR root
    -- is OUTSIDE the read set crashes after publishing B only — the
    -- mirrors multi_commit writes under every participant root before
    -- any publish let a [B, C] reader find the record under its own
    -- roots and pin B below its half (uniform exclusion); recovery
    -- from a MIRROR root completes the txn everywhere and the cut
    -- advances to uniform inclusion. All aggregates recompute
    -- literally.
    WITH b AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey % 10 = 6),
         c AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier WHERE s_suppkey % 10 = 6)
    SELECT 'before' AS phase, 'b' AS tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(k) AS BIGINT) AS sum_k FROM b
    UNION ALL SELECT 'before', 'c', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT) FROM c
    UNION ALL SELECT 'after', 'b', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM (SELECT k FROM b UNION ALL SELECT -k FROM b)
    UNION ALL SELECT 'after', 'c', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
      FROM (SELECT k FROM c UNION ALL SELECT -k FROM c)
    ORDER BY phase, tag
    """,
    doc="X144 coordinator-mirror consistency (r12 verdict task 1 + "
    "ADVICE; operators/snapshots.py::multi_commit/multi_read_versions/"
    "_norm_root): multi_commit mirrors the decision record under EVERY "
    "participant root BEFORE the first publish — the atomic decision "
    "point stays the roots[0] create, the mirrors are advisory copies "
    "retired together — so a reader whose read set excludes the "
    "coordinator root still finds the record under its own roots and "
    "never sees a torn cut (the x138 hole the r12 judge found: "
    "multi_read scans only its OWN roots by design). Record roots "
    "compare path-normalized. Write cost O(participants) small-JSON "
    "creates per txn; the zero-record common case is unchanged.",
)
def x144_multi_read_coordinator_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x144_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    ra, rb, rc = f"{base}/a", f"{base}/b", f"{base}/c"
    a = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 6)
        .select(F.col("o_orderkey").cast("long").alias("k"))
    )
    b = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 6)
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    c = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 6)
        .select(F.col("s_suppkey").cast("long").alias("k"))
    )
    S.append(a, ra)
    S.append(b, rb)
    S.append(c, rc)
    S.multi_stage(
        [
            (a.select((-F.col("k")).alias("k")), ra),
            (b.select((-F.col("k")).alias("k")), rb),
            (c.select((-F.col("k")).alias("k")), rc),
        ],
        "mt",
    )
    # the decision + its mirrors landed (multi_commit's order: all
    # records BEFORE the first publish), then the coordinator crashed
    # after publishing B only — coordinator root A is NOT read below
    rec = _json.dumps({"txn_id": "mt", "roots": [ra, rb, rc]})
    for r in (ra, rb, rc):
        fsio.create_text_atomic(spark, f"{r}/_snapshots/mtxn-mt.json", rec)
    S.publish_staged(spark, rb, "mtxn-mt")

    def agg(df, phase, tag):
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("sum_k"),
        ).select(
            F.lit(phase).alias("phase"), F.lit(tag).alias("tag"), "n_rows", "sum_k"
        )

    cut = S.multi_read(spark, [rb, rc])  # coordinator root OUTSIDE
    before_b, before_c = agg(cut[rb], "before", "b"), agg(cut[rc], "before", "c")
    S.multi_txn_recover(spark, rb)  # recovery from a MIRROR root
    cut2 = S.multi_read(spark, [rb, rc])
    after_b, after_c = agg(cut2[rb], "after", "b"), agg(cut2[rc], "after", "c")
    return (
        before_b.unionByName(before_c)
        .unionByName(after_b)
        .unionByName(after_c)
        .orderBy("phase", "tag")
    )


@register(
    "x145_table_sql_surface",
    oracle="""
    -- SQL-string surface over the table layer (r12 verdict missing
    -- item 4): MERGE INTO (source-wins star form, key-pruned),
    -- snapshot views per version bridging into plain Spark SQL,
    -- DESCRIBE HISTORY and SHOW PARTITIONS — each routed 1:1 onto the
    -- Python API. n1 = per-partition counts at VERSION AS OF 1 (the
    -- pre-merge base), n2 = post-merge counts via SHOW PARTITIONS;
    -- history_ok pins the op sequence, vacuumed pins that OPTIMIZE
    -- ZORDER + VACUUM RETAIN 1 VERSIONS reclaimed the old files.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS g,
             CAST(o_orderkey % 1000 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 10 = 8
    ), merged AS (
      SELECT k, g, CASE WHEN k % 3 = 0 THEN v + 100 ELSE v END AS v FROM base
      UNION ALL SELECT -k, g, CAST(55 AS BIGINT) FROM base WHERE k % 9 = 0
    )
    SELECT b.g,
           CAST(b.n AS BIGINT) AS n1,
           CAST(m.n AS BIGINT) AS n2,
           CAST(SUM_v AS BIGINT) AS sv2,
           CAST(TRUE AS BOOLEAN) AS history_ok,
           CAST(TRUE AS BOOLEAN) AS vacuumed
    FROM (SELECT g, COUNT(*) AS n FROM base GROUP BY g) b
    JOIN (SELECT g, COUNT(*) AS n, SUM(v) AS SUM_v FROM merged GROUP BY g) m
      USING (g)
    ORDER BY g
    """,
    doc="X145 table-format SQL surface (operators/table_sql.py::"
    "table_sql — r12 verdict 'What's missing' item 4): a regex-routed "
    "mini-dialect giving the Delta-habituated user SQL strings for the "
    "table layer — MERGE INTO ... UPDATE SET */INSERT * (source-wins "
    "star form onto the file-pruned COW merge_commit), CREATE TEMP "
    "VIEW ... AS SNAPSHOT OF ... VERSION AS OF/TAG (bridges into the "
    "FULL Spark SQL surface), DESCRIBE HISTORY, SHOW PARTITIONS, "
    "OPTIMIZE [ZORDER BY], VACUUM RETAIN n VERSIONS. Open-source Spark "
    "has no parser extension point for these against a custom layout "
    "(Delta injects a whole parser), so the dialect is explicit and "
    "REFUSES unsupported syntax with the grammar in the error. Every "
    "statement returns a DataFrame (Delta's convention). 100 TB: each "
    "statement maps 1:1 onto the already-scale-shaped Python API — the "
    "SQL layer adds parsing, never a plan.",
)
def x145_table_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.table_sql import table_sql

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x145_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 8)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            F.col("o_orderstatus").alias("g"),
            (F.col("o_orderkey") % 1000).cast("long").alias("v"),
        )
    )
    S.append(base, root, partition_by="g", stats_cols=["k"])  # v1
    src = base.filter(F.col("k") % 3 == 0).select(
        "k", "g", (F.col("v") + 100).alias("v")
    ).unionByName(
        base.filter(F.col("k") % 9 == 0).select(
            (-F.col("k")).alias("k"), "g", F.lit(55).cast("long").alias("v")
        )
    )
    src.createOrReplaceTempView("x145_src")
    table_sql(
        spark,
        f"MERGE INTO '{root}' USING x145_src ON k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * "
        "PRUNE ON k",
    )  # v2
    hist = table_sql(spark, f"DESCRIBE HISTORY '{root}'")
    ops = [r.op for r in hist.orderBy("version").collect()]
    history_ok = ops == ["append", "merge"]
    # materialize the per-partition probes BEFORE vacuum reclaims the
    # old versions' files (bounded collects: one row per order status)
    parts = {
        r["value"]: int(r["n_rows"])
        for r in table_sql(spark, f"SHOW PARTITIONS '{root}'").collect()
    }
    table_sql(
        spark,
        f"CREATE OR REPLACE TEMP VIEW x145_v1 AS SNAPSHOT OF '{root}' "
        "VERSION AS OF 1",
    )
    n1 = {
        r["g"]: int(r["n1"])
        for r in spark.sql(
            "SELECT g, CAST(COUNT(*) AS LONG) AS n1 FROM x145_v1 GROUP BY g"
        ).collect()
    }
    table_sql(
        spark,
        f"CREATE OR REPLACE TEMP VIEW x145_cur AS SNAPSHOT OF '{root}'",
    )
    sv2 = {
        r["g"]: int(r["sv2"])
        for r in spark.sql(
            "SELECT g, CAST(SUM(v) AS LONG) AS sv2 FROM x145_cur GROUP BY g"
        ).collect()
    }
    table_sql(spark, f"OPTIMIZE '{root}' ZORDER BY (k, v)")  # v3
    deleted = table_sql(
        spark, f"VACUUM '{root}' RETAIN 1 VERSIONS"
    ).first()["files_deleted"]
    return spark.createDataFrame(
        [
            (g, n1[g], parts[g], sv2[g], bool(history_ok), bool(int(deleted) > 0))
            for g in sorted(n1)
        ],
        "g string, n1 long, n2 long, sv2 long, history_ok boolean, "
        "vacuumed boolean",
    ).orderBy("g")


@register(
    "x146_filtered_vector_search",
    oracle="""
    -- FILTERED vector search (the RAG-stack retrieval shape: nearest
    -- vectors WHERE <metadata predicate>): the selective path filters
    -- first and runs the EXACT brute-force top-k over the survivors —
    -- exact by construction, so the oracle is the literal filtered
    -- top-k. The unselective path (predicate applied INSIDE the IVF
    -- probe, before truncation) is probabilistic and pinned by the
    -- probe-all == prefilter equality test in tests/test_similarity.py.
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cos_sim_r,
           'prefilter' AS strategy
    FROM embeddings, q WHERE label = 3
    ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC, vec_id
    LIMIT 10
    """,
    doc="X146 filtered vector search (operators/similarity.py::"
    "cosine_topk_filtered): top-k by cosine among rows satisfying a "
    "metadata predicate — strategy picked by predicate selectivity, "
    "the classic vector-DB decision. Selective predicates PRE-FILTER "
    "(Catalyst pushes the predicate to the scan, composing with "
    "partition/stats pruning) then exact TakeOrdered top-k; "
    "unselective predicates apply the filter INSIDE the probed IVF "
    "cells BEFORE the top-k truncation, so recall degrades exactly "
    "like unfiltered IVF and no expanded-k dance is needed (probing "
    "all cells recovers the exact filtered answer — the equality "
    "pinned in tests). 100 TB: a 0.1%-selective predicate leaves "
    "~10^8 rows for one pruned scan + per-partition heaps; the probe "
    "path reads n_probe/n_cells of a cell-partitioned index.",
)
def x146_filtered_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.operators.similarity import cosine_topk_filtered

    em = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    out, strategy = cosine_topk_filtered(
        em, "embedding", "vec_id", qvec, F.col("label") == 3, k=10,
        selectivity=0.1,  # stats-derived in production; labels are ~10 values
    )
    return out.select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim_r")
    ).withColumn("strategy", F.lit(strategy))


@register(
    "x147_filtered_ann_index",
    oracle=f"""
    -- FILTERED search over the PERSISTED IVF-PQ index (x146's probe
    -- strategy reaching the x52 index): the index is written WITH a
    -- metadata column (lbl = vec_id % 3), the predicate evaluates
    -- against the stored rows INSIDE probed cells before truncation,
    -- and ADC scores the survivors' codes. On the planted-lossless
    -- construction with probe-all routing the filtered ADC top-k IS
    -- the exact filtered answer: the first <=12 vec_ids of the query
    -- pattern with lbl = 1, all at distance 0. sel_ok pins the
    -- manifest-stats selectivity estimate (discrete-uniform per-file
    -- interpolation over recorded [min,max] + __rows — ZERO count
    -- jobs) landing exactly on the true 1/3.
    SELECT vec_id, CAST(0.0 AS DOUBLE) AS adc_dist_r,
           CAST(TRUE AS BOOLEAN) AS sel_ok
    FROM embeddings WHERE vec_id % 8 = {_PLANTED_QUERY_PATTERN}
      AND vec_id % 3 = 1
    ORDER BY vec_id LIMIT 12
    """,
    doc="X147 filtered ANN over the persisted index (r13 verdict task "
    "4; operators/similarity.py::ann_write_index(meta_cols=)/"
    "AnnIndex.filtered_pq_search/ann_selectivity_from_stats): the "
    "metadata columns a filtered query needs are persisted WITH the "
    "cell-partitioned rows (schema opt-in recorded in the sidecar; "
    "appends must carry them, deletes/compaction/retrain rewrite rows "
    "wholesale so they ride along), so a codes-only index serves "
    "'nearest k WHERE lang = en' at n_probe/n_cells scan cost with "
    "zero join-back to the corpus — the predicate applies BEFORE the "
    "top-k truncation, recall degrades exactly like unfiltered IVF, "
    "and probe-all recovers the exact filtered answer (this oracle). "
    "Strategy selectivity now derives from snapshot-table manifest "
    "stats (rows-weighted per-file range interpolation, discrete form "
    "for integer columns) instead of x146's two-full-count fallback: "
    "a serving loop pays one kilobyte metadata read per query, not "
    "two corpus scans. 100 TB: filtered RAG retrieval = sidecar read "
    "+ n_probe cell directories of m-byte codes.",
)
def x147_filtered_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.similarity import (
        ann_load_index,
        ann_selectivity_from_stats,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir))
    assigned, centroids = ivf_build(planted, "embedding", "vec_id", n_cells=4, seed=11)
    assigned = assigned.withColumn("lbl", (F.col("vec_id") % 3).cast("int"))
    cb = pq_train(planted, "embedding", "vec_id", **_PLANTED_PQ)
    codes = pq_encode(planted, "embedding", "vec_id", cb)
    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x147_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    path, root = os.path.join(base, "idx"), os.path.join(base, "tab")
    ann_write_index(
        path, assigned, centroids, "vec_id", "embedding", codes, cb,
        meta_cols=["lbl"],
    )
    idx = ann_load_index(spark, path)
    out = idx.filtered_pq_search(
        _PLANTED_QUERY_VEC, F.col("lbl") == 1, k=12, n_probe=4
    )
    # selectivity from MANIFEST stats (zero count jobs, zero file opens):
    # the corpus as a snapshot table with integer stats on lbl — per-file
    # [0, 2] ranges + __rows interpolate (discrete form) to exactly 1/3
    S.append(
        assigned.select("vec_id", "lbl").repartition(4), root,
        stats_cols=["lbl"],
    )
    est = ann_selectivity_from_stats(spark, root, "lbl", 1, 1)
    sel_ok = abs(est - (1.0 / 3.0)) < 1e-12
    return (
        out.select("vec_id", F.round("adc_dist", 6).alias("adc_dist_r"))
        .filter(F.col("adc_dist_r") == 0.0)
        .withColumn("sel_ok", F.lit(bool(sel_ok)))
        .orderBy("vec_id")
    )


@register(
    "x148_incremental_checkpoints",
    oracle="""
    -- INCREMENTAL (shard-reusing) checkpoints + the shard-lazy writer
    -- (r13 verdict tasks 1-2): after two 1-file appends onto a sharded
    -- checkpoint base, the next checkpoint must (a) write strictly
    -- fewer than half the bytes of the full checkpoint write
    -- (reused_shards: every previous shard referenced by name),
    -- (b) read only the previous INDEX during assembly (the deltas
    -- already carry the added files — zero shard loads), and (c) the
    -- appends themselves must load ZERO checkpoint bytes (the lazy
    -- delta-write commit path). The data box and the index-only count
    -- recompute literally; every flag is a literal TRUE.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
      FROM orders WHERE o_orderkey % 10 = 9
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sk,
           CAST((SELECT COUNT(*) + 2 FROM base) AS BIGINT) AS n_total,
           CAST(TRUE AS BOOLEAN) AS reused_shards,
           CAST(TRUE AS BOOLEAN) AS fewer_write_bytes,
           CAST(TRUE AS BOOLEAN) AS index_only_reads,
           CAST(TRUE AS BOOLEAN) AS lazy_append_zero_ckpt_bytes
    FROM base WHERE rid BETWEEN 20 AND 60
    """,
    doc="X148 incremental checkpoints + shard-lazy appends (r13 "
    "verdict tasks 1-2; operators/snapshots.py::_try_incremental_ckpt/"
    "_commit_delta/_parent_head): a checkpoint onto a sharded base "
    "REUSES the previous checkpoint's untouched shard files by name "
    "(content-addressed, immutable — vacuum keeps shared shards alive "
    "BY REFERENCE until no retained index cites them) and writes only "
    "shards the delta chain touched — O(K + touched shards) bytes per "
    "checkpoint, never O(table files); the pure-append path reads "
    "zero previous shard bytes because the delta records already "
    "carry every added file + stat. Appends onto a delta-record "
    "parent commit through the shard-lazy path: one raw head read "
    "(the delta base carries schema/spec/deletes verbatim), one O(K) "
    "delta write, no file-list reconstruction — at 10^6 files the "
    "writer's driver memory is O(K + touched shards). These close the "
    "last two O(files) write-path ceilings the r13 sharding left.",
)
def x148_incremental_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x148_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 9)
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .withColumn("rid", F.row_number().over(Window.orderBy("k")))
    )
    one = base.limit(1).select(
        (F.col("k") + 9000000).alias("k"), (F.col("rid") + 9000000).alias("rid")
    )
    saved = (S._SHARD_MIN_FILES, S._SHARD_SIZE)
    S._SHARD_MIN_FILES, S._SHARD_SIZE = 8, 4
    try:
        S.append(base.repartitionByRange(16, "rid"), root, stats_cols=["rid"])
        S.append(base.limit(0), root, stats_cols=["rid"], single_file=True)  # v2 delta
        S._CKPT_BYTES_WRITTEN["n"] = 0
        S._ensure_checkpoint(spark, root, 2)  # full sharded write
        full_w = S._CKPT_BYTES_WRITTEN["n"]
        idx2 = _json.loads(fsio.read_text(spark, S._ckpt_path(root, 2)))
        # two 1-file lazy appends from a COLD process: zero ckpt bytes
        S._STATE_CACHE.clear()
        S._CKPT_BYTES_READ["n"] = 0
        S.append(one, root, stats_cols=["rid"], single_file=True)  # v3
        S.append(
            one.select(
                (F.col("k") + 1).alias("k"), (F.col("rid") + 1).alias("rid")
            ),
            root, stats_cols=["rid"], single_file=True,
        )  # v4
        lazy_zero = S._CKPT_BYTES_READ["n"] == 0
        S._STATE_CACHE.clear()
        S._CKPT_BYTES_READ["n"] = 0
        S._CKPT_BYTES_WRITTEN["n"] = 0
        S._ensure_checkpoint(spark, root, 4)  # incremental: reuse shards
        inc_w = S._CKPT_BYTES_WRITTEN["n"]
        index_only = (
            S._CKPT_BYTES_READ["n"]
            == fsio.file_size(spark, S._ckpt_path(root, 2))
        )
        idx4 = _json.loads(fsio.read_text(spark, S._ckpt_path(root, 4)))
        p2 = {sm["path"] for sm in idx2["shards"]}
        p4 = {sm["path"] for sm in idx4["shards"]}
        reused = p2 <= p4
        fewer = 0 < inc_w < full_w / 2
        S._STATE_CACHE.clear()
        n_total = S.metadata_count(spark, root, version=4)
        df, _, _ = S.read_snapshot_pruned(spark, root, "rid", 20, 60, version=4)
        box = df.filter(F.col("rid").between(20, 60)).agg(
            F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sk")
        )
    finally:
        S._SHARD_MIN_FILES, S._SHARD_SIZE = saved
    return box.select(
        "n",
        "sk",
        F.lit(int(n_total)).cast("long").alias("n_total"),
        F.lit(bool(reused)).alias("reused_shards"),
        F.lit(bool(fewer)).alias("fewer_write_bytes"),
        F.lit(bool(index_only)).alias("index_only_reads"),
        F.lit(bool(lazy_zero)).alias("lazy_append_zero_ckpt_bytes"),
    )


@register(
    "x149_table_sql_dml",
    oracle="""
    -- Conditional DML through the SQL dialect (r13 verdict task 5):
    -- DELETE FROM ... WHERE kills v < 100; UPDATE ... SET v = v + 1000
    -- WHERE g = 2 rewrites only matching rows; MERGE ... WHEN MATCHED
    -- AND s.v > t.v guards the update per key (source v = 0 never
    -- beats a surviving target, so matched rows hold still) while NOT
    -- MATCHED re-inserts the deleted k % 7 = 0 keys at v = 0; a
    -- TIMESTAMP AS OF view pins the pre-DML row count. Every effect
    -- recomputes literally.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_custkey % 5 AS BIGINT) AS g,
             CAST(o_orderkey % 1000 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 10 = 3
    ), s1 AS (
      SELECT * FROM base WHERE NOT (v < 100)
    ), s2 AS (
      SELECT k, g, CASE WHEN g = 2 THEN v + 1000 ELSE v END AS v FROM s1
    ), s3 AS (
      SELECT * FROM s2
      UNION ALL
      SELECT k, g, CAST(0 AS BIGINT) FROM base
      WHERE k % 7 = 0 AND k NOT IN (SELECT k FROM s2)
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
           CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_v1
    FROM s3 GROUP BY g ORDER BY g
    """,
    doc="X149 table-format SQL DML surface (r13 verdict task 5; "
    "operators/table_sql.py + operators/snapshots.py::delete_where/"
    "update_where): the x145 dialect grown to the conditional forms a "
    "Delta-habituated user types first — DELETE FROM '<root>' WHERE, "
    "UPDATE '<root>' SET ... WHERE, MERGE ... WHEN MATCHED AND <cond> "
    "(s/t aliases; FALSE/NULL keeps the target row), SNAPSHOT views "
    "with TIMESTAMP AS OF, RESTORE ... TO VERSION AS OF — each routed "
    "1:1 onto the engine API. The DML is file-pruned copy-on-write: a "
    "find scan (predicate pushed to parquet row-group stats) locates "
    "touched files, ONLY those rewrite through the MoR-aware live "
    "view, untouched references + stats carry verbatim, and the "
    "change feed (when on) records atomically in the same commit. "
    "Unsupported grammar still refuses with the grammar in the error. "
    "100 TB: rewrite cost is O(touched files) + one manifest commit.",
)
def x149_table_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.table_sql import table_sql

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x149_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_custkey") % 5).cast("long").alias("g"),
            (F.col("o_orderkey") % 1000).cast("long").alias("v"),
        )
    )
    S.append(base, root, stats_cols=["k", "v"])  # v1
    ts1 = S._manifest_base_field(spark, root, 1, "committed_at")
    table_sql(spark, f"DELETE FROM '{root}' WHERE v < 100")
    table_sql(spark, f"UPDATE '{root}' SET v = v + 1000 WHERE g = 2")
    base.filter(F.col("k") % 7 == 0).select(
        "k", "g", F.lit(0).cast("long").alias("v")
    ).createOrReplaceTempView("x149_src")
    table_sql(
        spark,
        f"MERGE INTO '{root}' USING x149_src ON k "
        "WHEN MATCHED AND s.v > t.v THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * PRUNE ON k",
    )
    table_sql(
        spark,
        f"CREATE OR REPLACE TEMP VIEW x149_v1 AS SNAPSHOT OF '{root}' "
        f"TIMESTAMP AS OF {ts1}",
    )
    n_v1 = spark.sql("SELECT COUNT(*) AS n FROM x149_v1").first()["n"]
    table_sql(spark, f"CREATE OR REPLACE TEMP VIEW x149_cur AS SNAPSHOT OF '{root}'")
    return (
        spark.sql(
            """
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS sv
            FROM x149_cur GROUP BY g
            """
        )
        .withColumn("n_v1", F.lit(int(n_v1)).cast("long"))
        .orderBy("g")
    )


@register(
    "x150_mtxn_feed_exactly_once",
    oracle="""
    -- 2PC x change feed (r13 verdict task 8): participant A has the
    -- table-level feed ENABLED; the txn crashes after publishing B
    -- only; recovery (run TWICE, from a MIRROR root) completes it.
    -- A WAP publish is strictly additive, so its feed DERIVES from
    -- the manifest file diff at read time — the recovered txn's feed
    -- rows appear EXACTLY ONCE because publish_staged is idempotent
    -- per stage id (one commit = one version = one feed slice; a
    -- re-publish cannot double it). cv 1 = A's seed append, cv 2 =
    -- the recovered publish; recover_idempotent pins the second
    -- recovery run changing nothing.
    WITH a AS (
      SELECT CAST(c_custkey AS BIGINT) AS k
      FROM customer WHERE c_custkey % 10 = 2
    )
    SELECT CAST(1 AS BIGINT) AS cv, 'insert' AS ctype,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
           CAST(TRUE AS BOOLEAN) AS recover_idempotent
    FROM a
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'insert',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(k + 1000000) AS BIGINT),
           CAST(TRUE AS BOOLEAN)
    FROM a
    ORDER BY cv
    """,
    doc="X150 cross-table 2PC over a CHANGE-FEED-ENABLED participant "
    "(r13 verdict task 8; operators/snapshots.py::multi_commit/"
    "multi_txn_recover/read_changes): pins the one-commit-covers-both "
    "invariant under recovery — a WAP publish is append-family, its "
    "feed slice derives from the published version's file diff at "
    "read time (zero write amplification, the x136 design), and "
    "because publish_staged is idempotent per stage id a crashed-and-"
    "recovered (twice) transaction yields exactly one feed slice: no "
    "doubled inserts, no missing slice, mirrors retired after. The "
    "crash matrix (crash before any publish / after one / before "
    "retirement) is pinned in tests/test_snapshots.py.",
)
def x150_mtxn_feed_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x150_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    ra, rb = f"{base}/a", f"{base}/b"
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 2)
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    S.set_change_feed(spark, ra, True)
    S.append(a, ra, stats_cols=["k"])  # A v1 (feed: derived inserts)
    S.append(a.select((F.col("k") + 5).alias("k")), rb)  # B v1
    S.multi_stage(
        [
            (a.select((F.col("k") + 1000000).alias("k")), ra),
            (a.select((F.col("k") + 2000000).alias("k")), rb),
        ],
        "x150t",
    )
    # crash after publishing B only: decision + mirrors land first (the
    # multi_commit ordering), then one half
    rec = {"txn_id": "x150t", "roots": [ra, rb]}
    for r in (ra, rb):
        fsio.create_text_atomic(
            spark, f"{r}/_snapshots/mtxn-x150t.json", _json.dumps(rec)
        )
    S.publish_staged(spark, rb, "mtxn-x150t")
    # recovery from the MIRROR root, run twice: idempotent end to end
    S.multi_txn_recover(spark, ra)
    va = S.latest_version(spark, ra)
    feed1 = S.read_changes(spark, ra, 0)
    n1 = feed1.count()
    S.multi_txn_recover(spark, ra)
    S.multi_txn_recover(spark, rb)
    recover_idempotent = (
        S.latest_version(spark, ra) == va
        and S.read_changes(spark, ra, 0).count() == n1
        and not fsio.exists(spark, f"{ra}/_snapshots/mtxn-x150t.json")
        and not fsio.exists(spark, f"{rb}/_snapshots/mtxn-x150t.json")
    )
    return (
        S.read_changes(spark, ra, 0)
        .groupBy(
            F.col("_commit_version").cast("long").alias("cv"),
            F.col("_change_type").alias("ctype"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sk"),
        )
        .withColumn("recover_idempotent", F.lit(bool(recover_idempotent)))
        .orderBy("cv")
    )


@register(
    "x151_shard_lazy_merge",
    oracle="""
    -- SHARD-LAZY MERGE (r13 verdict tasks 1-2 extended to the merge
    -- writer): a keyed file-pruned merge onto a sharded-checkpoint
    -- table plans through INTERSECTING shards only and commits a
    -- DELTA record (touched files removed, rewrites added) — neither
    -- planning nor commit materializes the table's file list. The
    -- flags pin: fewer checkpoint bytes read than a full
    -- reconstruction, a delta-format version file, and a touched set
    -- strictly between 0 and the table's file count. The merged
    -- content recomputes literally: rid in [30, 34] gets k + 1000000
    -- (source wins), rid 900000 inserts with k = 77.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
      FROM orders WHERE o_orderkey % 10 = 5
    ), merged AS (
      SELECT CASE WHEN rid BETWEEN 30 AND 34 THEN k + 1000000 ELSE k END AS k,
             rid FROM base
      UNION ALL SELECT CAST(77 AS BIGINT), CAST(0 AS BIGINT)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sk,
           CAST(SUM(CASE WHEN rid BETWEEN 25 AND 40 THEN k END) AS BIGINT)
             AS sk_box,
           CAST(TRUE AS BOOLEAN) AS fewer_bytes,
           CAST(TRUE AS BOOLEAN) AS delta_record,
           CAST(TRUE AS BOOLEAN) AS pruned_removed
    FROM merged
    """,
    doc="X151 shard-lazy MERGE (operators/snapshots.py::"
    "_merge_commit_lazy/_commit_delta): the r13-verdict write-path "
    "work extended to the COW merge — when the parent is a delta "
    "record with no pending MoR deletes, the merge resolves its "
    "candidate files through _plan_pruned_state (parsing ONLY shards "
    "whose envelopes intersect the source key range; a disjoint "
    "envelope provably holds no matching key, so its members stay in "
    "place by omission) and publishes touched-removed/rewritten-added "
    "as an O(touched)-byte delta. Planning IO and driver memory are "
    "O(candidates in intersecting shards): at 10^6 files a 1-file-"
    "touching merge parses a few shards and writes kilobytes, where "
    "r13's merge reconstructed and re-serialized the full list. "
    "Change feed, txn tokens, constraints and insert-only routing are "
    "the legacy path's, verbatim.",
)
def x151_shard_lazy_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x151_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 5)
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .withColumn("rid", F.row_number().over(Window.orderBy("k")).cast("long"))
    )
    saved = (S._SHARD_MIN_FILES, S._SHARD_SIZE)
    S._SHARD_MIN_FILES, S._SHARD_SIZE = 8, 4
    try:
        S.append(base.repartitionByRange(16, "rid"), root, stats_cols=["rid"])
        S.append(base.limit(0).coalesce(1), root, stats_cols=["rid"])  # v2
        S._ensure_checkpoint(spark, root, 2)
        src = base.filter(F.col("rid").between(30, 34)).select(
            (F.col("k") + 1000000).alias("k"), "rid"
        ).unionByName(
            spark.range(1).select(
                F.lit(77).cast("long").alias("k"),
                F.lit(0).cast("long").alias("rid"),
            )
        )
        S._STATE_CACHE.clear()
        S._CKPT_BYTES_READ["n"] = 0
        v3 = S.merge_commit(
            root, src, keys=["rid"], prune_on="rid",
            when_matched_update={c: F.col(f"s.{c}") for c in ("k", "rid")},
        )
        lazy_bytes = S._CKPT_BYTES_READ["n"]
        raw = _json.loads(fsio.read_text(spark, S._manifest_path(root, v3)))
        S._STATE_CACHE.clear()
        S._CKPT_BYTES_READ["n"] = 0
        m_full = S._read_manifest(spark, root, v3)
        full_bytes = S._CKPT_BYTES_READ["n"]
        n_removed = len(raw.get("files_removed", ()))
        agg = S.read_snapshot(spark, root, v3).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sk"),
            F.sum(
                F.when(F.col("rid").between(25, 40), F.col("k"))
            ).cast("long").alias("sk_box"),
        )
    finally:
        S._SHARD_MIN_FILES, S._SHARD_SIZE = saved
    return agg.select(
        "n",
        "sk",
        "sk_box",
        F.lit(bool(0 < lazy_bytes < full_bytes)).alias("fewer_bytes"),
        F.lit(bool(raw.get("format") == "delta-v1")).alias("delta_record"),
        F.lit(bool(0 < n_removed < len(m_full["files"]))).alias("pruned_removed"),
    )


@register(
    "x152_ann_cdf_sync",
    oracle=f"""
    -- ANN index FOLLOWING a mutating corpus through its change feed
    -- (the RAG vector-sync loop): the corpus table takes a MoR delete
    -- (vec_id % 5 = 3, feed-recorded pre-images) and an append of
    -- resurrected rows under shifted ids (+200000 preserves the
    -- planted pattern: 200000 % 8 = 0); ann_sync_from_changes nets
    -- each id to its final transition and applies delete+append to
    -- the persisted index. Probe-all exact search for the planted
    -- query pattern then returns exactly the final state's first <=12
    -- same-pattern ids at cosine 1.0 — identical vectors, so every
    -- cell is SQL-predictable. synced/resync_noop pin the high-water
    -- mark advancing once and holding on replay.
    WITH ids AS (SELECT CAST(vec_id AS BIGINT) AS vec_id FROM embeddings),
    state AS (
      SELECT vec_id FROM ids WHERE vec_id % 5 <> 3
      UNION ALL SELECT vec_id + 200000 FROM ids WHERE vec_id % 10 = 3
    )
    SELECT vec_id, CAST(1.0 AS DOUBLE) AS cos_r,
           CAST(TRUE AS BOOLEAN) AS synced,
           CAST(TRUE AS BOOLEAN) AS resync_noop
    FROM state WHERE vec_id % 8 = {_PLANTED_QUERY_PATTERN}
    ORDER BY vec_id LIMIT 12
    """,
    doc="X152 CDF-driven ANN index maintenance (operators/similarity."
    "py::ann_sync_from_changes over operators/snapshots.py::"
    "read_changes): the index-follows-table loop a RAG stack runs — "
    "consume the corpus table's change feed over (synced_version, "
    "latest], net each id to its FINAL transition (insert-then-delete "
    "nets to nothing; an update to its last post-image), apply as "
    "delete-touched-ids + append-final-rows (touched cells rewrite, "
    "appends route through the frozen quantizers), and advance the "
    "sidecar high-water mark only after both legs land — a replayed "
    "range deletes before re-appending, so crash recovery cannot "
    "duplicate rows. O(transitions) per sync: never a corpus rescan, "
    "never an index rebuild; refusals (unrecorded mutations, vacuumed "
    "ranges) inherited from read_changes verbatim.",
)
def x152_ann_cdf_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.similarity import (
        ann_load_index,
        ann_sync_from_changes,
        ann_write_index,
        ivf_build,
    )

    base = os.path.join(tempfile.gettempdir(), f"nagios_etl_x152_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    root, path = os.path.join(base, "tab"), os.path.join(base, "idx")
    planted = cache_once(_planted_pattern_embeddings(spark, sf_dir)).select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    S.set_change_feed(spark, root, True)
    S.append(planted, root, stats_cols=["vec_id"])  # v1
    assigned, centroids = ivf_build(
        S.read_snapshot(spark, root, 1), "embedding", "vec_id", n_cells=4,
        seed=11,
    )
    ann_write_index(path, assigned, centroids, "vec_id", "embedding")
    # corpus mutates: MoR delete (feed-recorded) + shifted re-append
    S.mor_delete(
        planted.filter(F.col("vec_id") % 5 == 3).select("vec_id"),
        root, keys=["vec_id"],
    )  # v2
    S.append(
        planted.filter(F.col("vec_id") % 10 == 3).select(
            (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
        ),
        root, stats_cols=["vec_id"],
    )  # v3
    v = ann_sync_from_changes(spark, path, root)
    resync_noop = ann_sync_from_changes(spark, path, root) == v
    idx = ann_load_index(spark, path)
    return (
        idx.exact_search(_PLANTED_QUERY_VEC, k=12, n_probe=4)
        .select("vec_id", F.round("cos_sim", 6).alias("cos_r"))
        .filter(F.col("cos_r") == 1.0)
        .withColumn("synced", F.lit(bool(v == 3)))
        .withColumn("resync_noop", F.lit(bool(resync_noop)))
        .orderBy("vec_id")
    )


@register(
    "x153_distributed_manifest_planning",
    oracle="""
    -- DISTRIBUTED manifest planning (r13 'What's missing' item 2 —
    -- Iceberg's distributed manifest reads): executor tasks parse the
    -- intersecting checkpoint shards and apply the per-file stats
    -- check THERE; the driver reads only the index, the delta records
    -- above the base, and the O(matching) survivor names. plan_equal
    -- pins the planned set IDENTICAL to the single-node planner's;
    -- pruned_shards pins driver-side envelope exclusion still engaged
    -- (strictly fewer shards scheduled than exist); total_exact pins
    -- the arithmetic file total. The box recomputes literally.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
      FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sk,
           CAST(TRUE AS BOOLEAN) AS plan_equal,
           CAST(TRUE AS BOOLEAN) AS pruned_shards,
           CAST(TRUE AS BOOLEAN) AS total_exact
    FROM base WHERE rid BETWEEN 17 AND 48
    """,
    doc="X153 distributed manifest planning (sources/manifest_scan.py::"
    "plan_files_distributed + ManifestShardSource): the r13 judge's "
    "remaining metadata-plane ceiling — at 10^6 files a broad "
    "predicate intersects ~10^3 shards x 1024 entries of DRIVER-side "
    "json.loads — removed by parsing shards in EXECUTOR tasks (one "
    "per intersecting shard; a Python batch DataSource emitting only "
    "surviving file names as Arrow batches). The driver's work is one "
    "index read + O(commits) delta records + O(matching) collected "
    "names. Exactness: envelope exclusion unchanged, executors replay "
    "the per-file check verbatim, delta-re-statted members are "
    "force-emitted and re-decided on the driver through their "
    "override stats, partition-path refinement applies only to "
    "stats-missing survivors (the single-node rule). Tables without a "
    "sharded base or with pending MoR deletes refuse and fall back to "
    "read_snapshot_pruned.",
)
def x153_distributed_manifest_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.sources.manifest_scan import (
        plan_files_distributed,
    )

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x153_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 1)
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .withColumn("rid", F.row_number().over(Window.orderBy("k")))
    )
    saved = (S._SHARD_MIN_FILES, S._SHARD_SIZE)
    S._SHARD_MIN_FILES, S._SHARD_SIZE = 8, 4
    try:
        S.append(base.repartitionByRange(16, "rid"), root, stats_cols=["rid"])
        # v2/v3: planted single-row appends FAR outside the probe range
        # (a limit(0) append's part-file count is session-conf-dependent
        # — an envelope-less zero-row shard broke the pruned flag, the
        # r14 parity catch): v2 lands in the checkpoint as an excludable
        # shard, v3 exercises the delta-above-base driver path
        one = base.limit(1).select(
            (F.col("k") + 9000000).alias("k"), (F.col("rid") + 9000000).alias("rid")
        )
        S.append(one.coalesce(1), root, stats_cols=["rid"])  # v2
        S._ensure_checkpoint(spark, root, 2)
        S.append(
            one.select((F.col("k") + 1).alias("k"), (F.col("rid") + 1).alias("rid"))
            .coalesce(1),
            root, stats_cols=["rid"],
        )  # v3
        v = S.latest_version(spark, root)
        planned, n_shards, total = plan_files_distributed(
            spark, root, v, [("rid", 17, 48)]
        )
        import json as _json

        from nagios_custom_etl_spark import fsio as _fsio

        n_all_shards = len(
            _json.loads(_fsio.read_text(spark, S._ckpt_path(root, 2)))["shards"]
        )
        S._STATE_CACHE.clear()
        m = S._plan_pruned_state(spark, root, v, [("rid", 17, 48)])
        fstats = m.get("stats", {})

        def keeps(f: str) -> bool:
            s = fstats.get(f, {}).get("rid")
            if s and s[0] is not None and s[1] is not None:
                return not (s[1] < 17 or s[0] > 48)
            return True

        expect = sorted(f for f in m["files"] if keeps(f))
        plan_equal = planned == expect
        # behavioral, not a layout constant: at least one shard's
        # envelope (the rid+9e6 planted one by construction) excludes
        pruned_shards = 0 < n_shards < n_all_shards
        total_exact = total == m["_files_total"]
        box = (
            S._read_files(spark, root, planned, m.get("schema"))
            .filter(F.col("rid").between(17, 48))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("k").cast("long").alias("sk"),
            )
        )
    finally:
        S._SHARD_MIN_FILES, S._SHARD_SIZE = saved
    return box.select(
        "n",
        "sk",
        F.lit(bool(plan_equal)).alias("plan_equal"),
        F.lit(bool(pruned_shards)).alias("pruned_shards"),
        F.lit(bool(total_exact)).alias("total_exact"),
    )


@register(
    "x154_positional_delete_vectors",
    oracle="""
    -- POSITIONAL deletion vectors (Delta DVs / Iceberg v2 positional
    -- deletes): two predicate deletes commit small (file, row_index)
    -- position files — NO data file is rewritten (files_unchanged) —
    -- and metadata_count stays EXACT through both (meta_n1) because
    -- each entry records its live-view-computed position cardinality
    -- (entries provably never overlap). A later append lands g=3
    -- v=0 rows that the earlier "g = 3" DV must NOT touch (positions
    -- are file-scoped: new files are untargeted), and the count stays
    -- exact (meta_n2). compact() then materializes the survivors
    -- byte-equally (compact_equal). All groups recompute literally.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_custkey % 9 AS BIGINT) AS g,
             CAST(o_orderkey % 97 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 6 = 1
    ), live2 AS (
      SELECT * FROM base WHERE NOT (v % 5 = 0) AND NOT (g = 3)
    ), appended AS (
      SELECT k + 10000000 AS k, CAST(3 AS BIGINT) AS g,
             CAST(0 AS BIGINT) AS v
      FROM base WHERE k % 5 = 1
    ), final AS (
      SELECT * FROM live2 UNION ALL SELECT * FROM appended
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
           CAST((SELECT COUNT(*) FROM live2) AS BIGINT) AS meta_n1,
           CAST((SELECT COUNT(*) FROM final) AS BIGINT) AS meta_n2,
           CAST(TRUE AS BOOLEAN) AS files_unchanged,
           CAST(TRUE AS BOOLEAN) AS compact_equal
    FROM final GROUP BY g ORDER BY g
    """,
    doc="X154 positional deletion vectors (operators/snapshots.py::"
    "dv_delete + _live_view's pos entries): DELETE WHERE <predicate> "
    "commits one small parquet of (_dv_file, _dv_pos) rows naming "
    "exact physical positions (_metadata.row_index) in exact immutable "
    "files — no data file rewritten, no key columns needed; reads "
    "apply a broadcast anti-join on (manifest-relative path, position) "
    "with no seq residual, skipped for untargeted files. Positions are "
    "computed on the LIVE view so entries never overlap — which keeps "
    "metadata_count EXACT on DV-pending tables (rows minus recorded "
    "positions; min/max/sum still refuse). At 100 TB: deleting 0.1% "
    "of rows scattered over 10^6 files costs one pruned find scan + "
    "megabytes of positions instead of a million file rewrites; "
    "compact() materializes and clears. Conservative surfaces refuse "
    "verbatim (branches, incremental readers, the shard-lazy merge "
    "falls back) because the entries live in the same manifest "
    "`deletes` list as equality MoR entries.",
)
def x154_positional_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x154_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 6 == 1)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_custkey") % 9).cast("long").alias("g"),
            (F.col("o_orderkey") % 97).cast("long").alias("v"),
        )
    )
    S.append(base.filter(F.col("k") % 4 == 1), root, stats_cols=["k"], single_file=True)
    S.append(base.filter(F.col("k") % 4 == 3), root, stats_cols=["k"], single_file=True)
    files_before = S._read_manifest(spark, root, 2)["files"]
    S.dv_delete(spark, root, "v % 5 = 0")
    S.dv_delete(spark, root, "g = 3")  # overlaps the first on v%5=0 rows
    m4 = S._read_manifest(spark, root, 4)
    files_unchanged = m4["files"] == files_before
    meta_n1 = S.metadata_count(spark, root)
    appended = base.filter(F.col("k") % 5 == 1).select(
        (F.col("k") + 10000000).alias("k"),
        F.lit(3).cast("long").alias("g"),
        F.lit(0).cast("long").alias("v"),
    )
    S.append(appended, root, stats_cols=["k"], single_file=True)
    meta_n2 = S.metadata_count(spark, root)
    pre_compact = S.read_snapshot(spark, root)
    S.compact(spark, root)
    post = S.read_snapshot(spark, root)
    # multiset equality as ONE short-circuiting action (r14): per-row
    # count compare over a null-safe full outer join — the two exceptAll
    # counts computed the same boolean in two actions of two shuffles
    # each. eqNullSafe keeps the semantics exactly exceptAll's (NULL
    # rows group together), though x154's rows are non-null by
    # construction.
    cols = post.columns
    a = pre_compact.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n1")).alias("a")
    b = post.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n2")).alias("b")
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in cols],
    )
    compact_equal = (
        a.join(b, cond, "full_outer")
        .filter(
            F.coalesce("_n1", F.lit(0)) != F.coalesce("_n2", F.lit(0))
        )
        .isEmpty()
    )
    return (
        post.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("sv"))
        .select(
            F.col("g").cast("long").alias("g"),
            F.col("n").cast("long").alias("n"),
            "sv",
            F.lit(int(meta_n1)).cast("long").alias("meta_n1"),
            F.lit(int(meta_n2)).cast("long").alias("meta_n2"),
            F.lit(bool(files_unchanged)).alias("files_unchanged"),
            F.lit(bool(compact_equal)).alias("compact_equal"),
        )
        .orderBy("g")
    )


@register(
    "x155_dv_update",
    oracle="""
    -- DV-shaped UPDATE (Delta's deletion-vector UPDATE): one commit
    -- records matched positions (killing old images in place) and
    -- appends ONLY the updated rows as new files — old files survive
    -- byte-identical (files_kept), write amplification O(matched
    -- rows). A following DV DELETE keyed on the UPDATED values proves
    -- the new files are first-class DV targets. metadata_count stays
    -- exact through both (meta_n1/meta_n2); the update's feed records
    -- one pre/post pair per matched row (n_pairs). All literal.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_custkey % 9 AS BIGINT) AS g,
             CAST(o_orderkey % 89 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 4 = 2
    ), upd AS (
      SELECT k, g, CASE WHEN g = 4 THEN v + 1000 ELSE v END AS v FROM base
    ), fin AS (
      SELECT * FROM upd WHERE NOT (v % 7 = 0)
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
           CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS meta_n1,
           CAST((SELECT COUNT(*) FROM fin) AS BIGINT) AS meta_n2,
           CAST((SELECT COUNT(*) FROM base WHERE g = 4) AS BIGINT)
             AS n_pairs,
           CAST(TRUE AS BOOLEAN) AS files_kept
    FROM fin GROUP BY g ORDER BY g
    """,
    doc="X155 deletion-vector UPDATE (operators/snapshots.py::"
    "dv_update; SQL: UPDATE ... WHERE ... USING DV): positions for the "
    "matched rows + new files holding ONLY their updated images, one "
    "atomic commit — a 10-row update inside a 10^6-row file costs 10 "
    "positions + 10 rows, not a file rewrite; updating the partition "
    "column legally moves rows across col=val dirs; new files carry "
    "the commit's seq so pending equality deletes never eat them; "
    "update_preimage/update_postimage pairs record atomically when "
    "the feed is on; metadata_count stays exact (old rows − positions "
    "+ new rows). The follow-up dv_delete here predicates on the "
    "POST-update values, pinning that DV-written files are themselves "
    "DV-targetable.",
)
def x155_dv_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x155_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 2)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_custkey") % 9).cast("long").alias("g"),
            (F.col("o_orderkey") % 89).cast("long").alias("v"),
        )
    )
    S.set_change_feed(spark, root, True)
    S.append(base.filter(F.col("k") % 8 == 2).coalesce(1), root, stats_cols=["k"])
    S.append(base.filter(F.col("k") % 8 == 6).coalesce(1), root, stats_cols=["k"])
    files_before = S._read_manifest(spark, root, 2)["files"]
    v3 = S.dv_update(spark, root, "g = 4", {"v": "v + 1000"})
    meta_n1 = S.metadata_count(spark, root)
    ch = S.read_changes(spark, root, 2, v3)
    n_pairs = ch.filter(F.col("_change_type") == "update_preimage").count()
    n_posts = ch.filter(F.col("_change_type") == "update_postimage").count()
    S.dv_delete(spark, root, "v % 7 = 0")
    meta_n2 = S.metadata_count(spark, root)
    m = S._read_manifest(spark, root, S.latest_version(spark, root))
    files_kept = set(files_before) <= set(m["files"]) and n_pairs == n_posts
    return (
        S.read_snapshot(spark, root)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("sv"))
        .select(
            F.col("g").cast("long").alias("g"),
            F.col("n").cast("long").alias("n"),
            "sv",
            F.lit(int(meta_n1)).cast("long").alias("meta_n1"),
            F.lit(int(meta_n2)).cast("long").alias("meta_n2"),
            F.lit(int(n_pairs)).cast("long").alias("n_pairs"),
            F.lit(bool(files_kept)).alias("files_kept"),
        )
        .orderBy("g")
    )


@register(
    "x156_distributed_ckpt_write",
    oracle="""
    -- Distributed checkpoint shard WRITES (the write-side twin of
    -- x153's distributed manifest reads — Iceberg distributes both):
    -- executor tasks compute each shard's payload and write the
    -- content-addressed file through pyarrow.fs; the driver collects
    -- O(shards) index metas and publishes the index. The payload is
    -- PURE, so wiping the checkpoint and rewriting through the driver
    -- loop reproduces byte-identical shards under identical names
    -- (names_equal, bytes_equal) — the two paths are interchangeable.
    -- dist_used pins that the Spark-job path actually ran; the
    -- metadata count and the pruned-read box recompute literally.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
      FROM orders WHERE o_orderkey % 10 = 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sk,
           CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_total,
           CAST(TRUE AS BOOLEAN) AS dist_used,
           CAST(TRUE AS BOOLEAN) AS names_equal,
           CAST(TRUE AS BOOLEAN) AS bytes_equal
    FROM base WHERE rid BETWEEN 25 AND 70
    """,
    doc="X156 distributed checkpoint shard writes (operators/"
    "snapshots.py::_build_shards_distributed over the pure "
    "_shard_payload): above _DIST_CKPT_MIN_SHARDS, checkpoint shards "
    "are written by one executor task each (pyarrow.fs tmp+rename, "
    "content-addressed skip on collision) instead of a serial driver "
    "loop — at 10^6 files a full checkpoint's ~10^3 shard writes "
    "parallelize across the cluster while the driver holds only the "
    "collected metas + the index publish. Payload purity makes the "
    "distributed result BYTE-IDENTICAL to the single-node write (same "
    "content -> same digest -> same name), pinned here by wiping the "
    "distributed checkpoint and rewriting through the driver loop. "
    "Removes the last driver-serial step of the r13-r14 metadata-plane "
    "arc (sharded ckpts -> incremental ckpts -> distributed reads -> "
    "distributed writes).",
)
def x156_distributed_ckpt_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x156_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .withColumn("rid", F.row_number().over(Window.orderBy("k")))
    )
    saved = (S._SHARD_MIN_FILES, S._SHARD_SIZE, S._DIST_CKPT_MIN_SHARDS)
    S._SHARD_MIN_FILES, S._SHARD_SIZE, S._DIST_CKPT_MIN_SHARDS = 8, 4, 2
    try:
        S.append(base.repartitionByRange(16, "rid"), root, stats_cols=["rid"])
        S._DIST_SHARD_WRITES["n"] = 0
        S._ensure_checkpoint(spark, root, 1)
        dist_used = S._DIST_SHARD_WRITES["n"] == 4
        names = [
            sm["path"]
            for sm in _json.loads(
                fsio.read_text(spark, S._ckpt_path(root, 1))
            )["shards"]
        ]
        blobs = {
            n: fsio.read_text(spark, f"{S._snap_dir(root)}/{n}") for n in names
        }
        fs, jp, _ = fsio._fs(spark, S._ckpt_path(root, 1))
        fs.delete(jp, False)
        for n in names:
            f2, j2, _ = fsio._fs(spark, f"{S._snap_dir(root)}/{n}")
            f2.delete(j2, False)
        S._DIST_CKPT_MIN_SHARDS = 9999  # force the driver loop
        S._STATE_CACHE.clear()
        S._write_checkpoint(spark, root, 1)
        names_b = [
            sm["path"]
            for sm in _json.loads(
                fsio.read_text(spark, S._ckpt_path(root, 1))
            )["shards"]
        ]
        names_equal = names_b == names
        bytes_equal = all(
            fsio.read_text(spark, f"{S._snap_dir(root)}/{n}") == blobs[n]
            for n in names
        )
        S._STATE_CACHE.clear()
        n_total = S.metadata_count(spark, root)
        dfp, _, _ = S.read_snapshot_pruned(spark, root, "rid", 25, 70)
        box = dfp.filter(F.col("rid").between(25, 70)).agg(
            F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sk")
        )
    finally:
        S._SHARD_MIN_FILES, S._SHARD_SIZE, S._DIST_CKPT_MIN_SHARDS = saved
    return box.select(
        "n",
        "sk",
        F.lit(int(n_total)).cast("long").alias("n_total"),
        F.lit(bool(dist_used)).alias("dist_used"),
        F.lit(bool(names_equal)).alias("names_equal"),
        F.lit(bool(bytes_equal)).alias("bytes_equal"),
    )


@register(
    "x157_dv_aware_compact_small",
    oracle="""
    -- DV-aware incremental compaction: a table under constant
    -- predicate DML accumulates small slivers AND deletion vectors;
    -- compact_small merges only the slivers, materializing exactly
    -- THEIR positions into the merged output, and REWRITES the pos
    -- entry to cover only the surviving big-file targets (positions
    -- refiltered, count recounted) — the big file is never read or
    -- rewritten, reads stay exact, metadata_count stays exact
    -- (meta_n), and the feed contribution is recorded-EMPTY (x142:
    -- materialization is logically row-preserving). entry_big_only
    -- pins the rewrite; equality deletes still refuse. All literal.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_custkey % 9 AS BIGINT) AS g,
             CAST(o_orderkey % 61 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 12 = 5
    ), sliv AS (
      SELECT k + 10000000 AS k, g, v FROM base WHERE k % 13 IN (1, 2, 3)
    ), allr AS (
      SELECT * FROM base UNION ALL SELECT * FROM sliv
    ), live AS (
      SELECT * FROM allr WHERE k % 10 <> 1
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
           CAST((SELECT COUNT(*) FROM live) AS BIGINT) AS meta_n,
           CAST(TRUE AS BOOLEAN) AS entry_big_only,
           CAST(TRUE AS BOOLEAN) AS feed_empty,
           CAST(TRUE AS BOOLEAN) AS live_preserved
    FROM live GROUP BY g ORDER BY g
    """,
    doc="X157 DV-aware incremental compaction (operators/snapshots.py::"
    "compact_small over pos entries): positional deletes are file-"
    "scoped, so the bin-pack pass stays sound on a DV-pending table — "
    "merged slivers read through the live view (their positions "
    "materialize), untouched big files keep their entries, and each "
    "entry rewrites to its surviving targets with a recounted "
    "cardinality (stale targets self-heal, so metadata_count recovers "
    "exactness after a COW rewrite too). Stamps data_change + "
    "deletes_materialized when positions materialize; feed "
    "contribution recorded-EMPTY. At 100 TB this is the missing "
    "maintenance loop for predicate-DML-heavy tables: the steady "
    "state pays O(sliver bytes + touched position files), never the "
    "big files — equality deletes (seq-scoped, all-file) still "
    "refuse to partial-rewrite.",
)
def x157_dv_aware_compact_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x157_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 12 == 5)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_custkey") % 9).cast("long").alias("g"),
            (F.col("o_orderkey") % 61).cast("long").alias("v"),
        )
    )
    S.set_change_feed(spark, root, True)
    S.append(base.coalesce(1), root, stats_cols=["k"])  # the big file
    for r in (1, 2, 3):
        S.append(
            base.filter(F.col("k") % 13 == r)
            .select((F.col("k") + 10000000).alias("k"), "g", "v")
            .coalesce(1),
            root, stats_cols=["k"],
        )
    S.dv_delete(spark, root, "k % 10 = 1")  # hits big AND slivers
    m0 = S._read_manifest(spark, root, S.latest_version(spark, root))
    sizes = {f: int(m0["stats"][f]["__bytes"]) for f in m0["files"]}
    big_file = max(sizes, key=sizes.get)
    live_before = S.read_snapshot(spark, root)
    rows_before = sorted((r.k, r.g, r.v) for r in live_before.collect())
    v = S.compact_small(spark, root, small_bytes=sizes[big_file], min_merge=2)
    m = S._read_manifest(spark, root, v)
    pos = m.get("deletes") or []
    entry_big_only = (
        len(pos) == 1
        and pos[0].get("pos")
        and set(pos[0]["targets"]) == {big_file}
    )
    feed_empty = m.get("change_files") == [] and m.get("deletes_materialized")
    meta_n = S.metadata_count(spark, root)
    after = S.read_snapshot(spark, root)
    live_preserved = (
        sorted((r.k, r.g, r.v) for r in after.collect()) == rows_before
    )
    return (
        after.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("sv"))
        .select(
            F.col("g").cast("long").alias("g"),
            F.col("n").cast("long").alias("n"),
            "sv",
            F.lit(int(meta_n)).cast("long").alias("meta_n"),
            F.lit(bool(entry_big_only)).alias("entry_big_only"),
            F.lit(bool(feed_empty)).alias("feed_empty"),
            F.lit(bool(live_preserved)).alias("live_preserved"),
        )
        .orderBy("g")
    )


@register(
    "x158_table_sql_insert",
    oracle="""
    -- INSERT INTO through the table-format SQL dialect: the body runs
    -- in FULL Spark SQL (a SELECT over a temp view here; a VALUES
    -- literal with a positional column list too), appended as a
    -- normal snapshot commit — so inserts compose with time travel
    -- (n_v1 pins the pre-insert count via VERSION AS OF). All rows
    -- recompute literally.
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_custkey % 9 AS BIGINT) AS g,
             CAST(o_orderkey % 53 AS BIGINT) AS v
      FROM orders WHERE o_orderkey % 9 = 4
    ), ins1 AS (
      SELECT k + 500000 AS k, g, v + 7 AS v FROM base WHERE g <= 3
    ), planted AS (
      SELECT CAST(900001 AS BIGINT) AS k, CAST(0 AS BIGINT) AS g,
             CAST(11 AS BIGINT) AS v
      UNION ALL SELECT 900002, 8, 13
    ), allr AS (
      SELECT * FROM base UNION ALL SELECT * FROM ins1
      UNION ALL SELECT * FROM planted
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
           CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_v1
    FROM allr GROUP BY g ORDER BY g
    """,
    doc="X158 SQL INSERT surface (operators/table_sql.py): INSERT INTO "
    "'<root>' [(cols)] SELECT ...|VALUES ... appends through full "
    "Spark SQL — temp views, functions, joins all usable in the body; "
    "the optional column list renames by position (VALUES yields "
    "col1/col2 otherwise); schema drift fails loudly, INSERT never "
    "evolves. Commits are plain appends: delta-logged O(K) manifests, "
    "time-travelable, feed-derivable, WAP-gateable like any other.",
)
def x158_table_sql_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.table_sql import table_sql

    root = os.path.join(tempfile.gettempdir(), f"nagios_etl_x158_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 9 == 4)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_custkey") % 9).cast("long").alias("g"),
            (F.col("o_orderkey") % 53).cast("long").alias("v"),
        )
    )
    S.append(base.coalesce(1), root, stats_cols=["k"])  # v1
    base.createOrReplaceTempView("x158_base")
    table_sql(
        spark,
        f"INSERT INTO '{root}' "
        "SELECT k + 500000 AS k, g, v + 7 AS v FROM x158_base WHERE g <= 3",
    )
    table_sql(
        spark,
        f"INSERT INTO '{root}' (k, g, v) VALUES "
        "(CAST(900001 AS BIGINT), CAST(0 AS BIGINT), CAST(11 AS BIGINT)), "
        "(CAST(900002 AS BIGINT), CAST(8 AS BIGINT), CAST(13 AS BIGINT))",
    )
    n_v1 = S.read_snapshot(spark, root, 1).count()
    return (
        S.read_snapshot(spark, root)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("sv"))
        .select(
            F.col("g").cast("long").alias("g"),
            F.col("n").cast("long").alias("n"),
            "sv",
            F.lit(int(n_v1)).cast("long").alias("n_v1"),
        )
        .orderBy("g")
    )
