"""Similarity-search tests: planted nearest neighbors with known cosine
ranking; LSH/IVF recall vs the exact brute-force baseline (SURVEY §5.3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_join,
    embedding_near_dup_pairs,
    ivf_build,
    ivf_search,
)


@pytest.fixture(scope="module")
def planted_vectors(spark):
    def unit(*xs):
        n = math.sqrt(sum(x * x for x in xs))
        return [x / n for x in xs]

    rows = [
        (0, unit(1.0, 0.0, 0.0, 0.0)),
        (1, unit(0.99, 0.1, 0.0, 0.0)),   # closest to 0
        (2, unit(0.8, 0.6, 0.0, 0.0)),    # second
        (3, unit(0.0, 1.0, 0.0, 0.0)),    # orthogonal
        (4, unit(-1.0, 0.0, 0.0, 0.0)),   # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_planted_ranking(planted_vectors):
    out = cosine_topk(planted_vectors, "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert out[0]["cos_sim"] == pytest.approx(1.0)
    assert out[1]["cos_sim"] == pytest.approx(0.99 / math.sqrt(0.99**2 + 0.1**2))


def test_cosine_topk_join_per_query(planted_vectors):
    queries = planted_vectors.filter(F.col("vec_id").isin(0, 3))
    out = cosine_topk_join(
        planted_vectors, queries, "embedding", "vec_id", "embedding", "vec_id", k=2
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["nbr_id"])
    assert per_q[0] == [0, 1]
    assert per_q[3][0] == 3


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    # exact pair set via self-join (small fixture — the brute-force oracle)
    from nagios_custom_etl_spark.functions.vector import as_double_array, cosine

    base = em.select(F.col("vec_id").alias("_id"), as_double_array("embedding").alias("_v"))
    a, b = base.alias("a"), base.alias("b")
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cosine(F.col("a._v"), F.col("b._v")).alias("cs"),
        )
        .filter(F.col("cs") >= 0.85)
        .collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            em, "embedding", "vec_id", dim=64, threshold=0.85, n_planes=8, n_tables=6
        ).collect()
    }
    assert approx <= exact  # exact-verify ⇒ no false positives
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.6, f"sign-LSH recall {recall:.2f} on {len(exact)} pairs"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """Behavioral recall gate robust to fixture regeneration: absolute
    recall at a fixed n_probe depends on how k-means carves near-isotropic
    data (and on input partitioning), so assert the properties a correct
    IVF must have — the query's own cell is always probed, recall never
    decreases as n_probe grows, and probing every cell IS brute force."""
    em = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact_ids = {r["vec_id"] for r in cosine_topk(em, "embedding", "vec_id", qvec, k=10).collect()}
    assigned, centroids = ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    recalls = []
    for n_probe in (3, 5, 8):
        ivf_ids = [
            r["vec_id"]
            for r in ivf_search(
                assigned, centroids, "embedding", "vec_id", qvec, k=10, n_probe=n_probe
            ).collect()
        ]
        assert ivf_ids[0] == 0  # the query vector itself lives in a probed cell
        recalls.append(len(exact_ids & set(ivf_ids)) / 10)
    assert recalls == sorted(recalls), f"recall must be monotonic in n_probe: {recalls}"
    assert recalls[0] >= 0.2, f"IVF@3/8 recall {recalls[0]:.2f}"
    assert recalls[-1] == 1.0, "probing every cell IS brute force"


def test_ivf_join_parity_and_monotonic_recall(spark, sf_dir):
    """The IVF-routed top-k JOIN (non-broadcast query side, VERDICT r3
    gap 4): probing ALL cells must reproduce the brute-force join
    bit-for-bit (same (query, rank) → neighbor assignment, ties by id),
    and recall vs exact must be monotonic in n_probe — both properties
    hold under any fixture regeneration."""
    from nagios_custom_etl_spark.operators.similarity import cosine_topk_join_ivf

    em = load_table(spark, sf_dir, "embeddings")
    qs = em.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["rank"]): r["nbr_id"]
        for r in cosine_topk_join(
            em, qs, "embedding", "vec_id", "embedding", "vec_id", k=10
        ).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["nbr_id"]
        for r in cosine_topk_join_ivf(
            em, qs, "embedding", "vec_id", "embedding", "vec_id",
            k=10, n_cells=8, n_probe=8, seed=42,
        ).collect()
    }
    assert full == exact  # probe-all ≡ brute force, rank for rank
    exact_sets: dict[int, set] = {}
    for (qid, _), nbr in exact.items():
        exact_sets.setdefault(qid, set()).add(nbr)
    prev = None
    for n_probe in (2, 4, 8):
        hits = {}
        for r in cosine_topk_join_ivf(
            em, qs, "embedding", "vec_id", "embedding", "vec_id",
            k=10, n_cells=8, n_probe=n_probe, seed=42,
        ).collect():
            hits.setdefault(r["query_id"], set()).add(r["nbr_id"])
        recall = sum(
            len(hits.get(q, set()) & s) for q, s in exact_sets.items()
        ) / sum(len(s) for s in exact_sets.values())
        assert prev is None or recall >= prev, "recall must grow with n_probe"
        prev = recall
    assert prev == 1.0


def test_int8_quantized_topk_recall(spark, sf_dir):
    """Quantized cosine ranking must closely track the exact ranking:
    top-10 overlap >= 8/10 on the fixture embeddings (values ~N(0, 0.1),
    scale calibrated from the corpus max)."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.functions.vector import (
        as_double_array,
        int8_dot,
        quantize_int8,
    )

    em = load_table(spark, sf_dir, "embeddings")
    max_abs = em.select(
        F.max(F.array_max(F.transform(as_double_array("embedding"), F.abs))).alias("m")
    ).head()["m"]
    scale = max_abs / 127.0
    qdf = em.select("vec_id", quantize_int8("embedding", scale).alias("q")).cache()
    qvec = qdf.filter(F.col("vec_id") == 0).head()["q"]
    qlit = F.lit([int(x) for x in qvec]).cast("array<tinyint>")
    # int dot with the quantized query, normalized by int norms → cosine-ish
    scored = qdf.select(
        "vec_id",
        (
            int8_dot(F.col("q"), qlit).cast("double")
            / (
                F.sqrt(int8_dot(F.col("q"), F.col("q")).cast("double"))
                * F.sqrt(int8_dot(qlit, qlit).cast("double"))
            )
        ).alias("qcos"),
    )
    q_top = [r["vec_id"] for r in scored.orderBy(F.desc("qcos"), "vec_id").limit(10).collect()]
    qvec_f = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact_top = [
        r["vec_id"] for r in cosine_topk(em, "embedding", "vec_id", qvec_f, k=10).collect()
    ]
    assert q_top[0] == 0
    assert len(set(q_top) & set(exact_top)) >= 8, (q_top, exact_top)


def test_embedding_pca_captures_variance(spark, sf_dir):
    """PCA 64->16: projected variance must be a large share of total
    variance (embeddings fixture is low-rank-ish), projection must be
    deterministic across partition layouts within a session."""
    import numpy as np
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("_v")
    )
    model = PCA(k=16, inputCol="_v", outputCol="_pc").fit(emb)
    explained = sum(model.explainedVariance.toArray())
    # isotropic floor is 16/64 = 0.25; the fixture has mild structure
    # (~0.38 at sf0.001) — assert we beat the floor with margin
    assert explained > 0.30, explained
    out = model.transform(emb).select("vec_id", vector_to_array("_pc").alias("p"))
    rows = out.collect()
    assert all(len(r["p"]) == 16 for r in rows)
    # determinism across layouts (same fitted model)
    out2 = model.transform(emb.repartition(7)).select("vec_id", vector_to_array("_pc").alias("p"))
    a = {r["vec_id"]: np.array(r["p"]) for r in rows}
    b = {r["vec_id"]: np.array(r["p"]) for r in out2.collect()}
    assert all(np.allclose(a[k], b[k]) for k in a)


def test_pq_lossless_on_codeword_vectors(spark):
    """Planted case where PQ is exact: every vector is bit-identical to a
    codeword in each subspace, so encoding is lossless, ADC distance
    equals true squared-L2, and recall@k vs exact cosine is 1.0."""
    import math

    from nagios_custom_etl_spark.operators.similarity import pq_encode, pq_topk, pq_train

    # 16 distinct 8-dim base patterns; each vector = one pattern repeated
    # over both subspaces (d=16, m=2) then L2-normalized by the operators
    rows = []
    for i in range(64):
        pat = [float((i % 16 == j) * 2 + 1) for j in range(8)]
        rows.append((i, pat + pat))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, "embedding", "vec_id", m=2, ks=16, seed=7, sample_rows=64)
    codes = pq_encode(df, "embedding", "vec_id", cb)
    got = {r["vec_id"]: list(r["pq_codes"]) for r in codes.collect()}
    assert len(got) == 64 and all(len(c) == 2 for c in got.values())
    # identical input vectors must get identical codes (determinism)
    for i in range(64):
        twin = (i % 16) + 16 * 0  # vec with same pattern: i and i+16 share i%16
        assert got[i] == got[(i % 16)]
    # ADC top-k for a query equal to one of the patterns: every vector
    # with the same pattern must rank at distance 0 before all others
    q = [float((3 == j) * 2 + 1) for j in range(8)] * 2
    top = pq_topk(codes, cb, "vec_id", q, k=4).collect()
    ids = [r["vec_id"] for r in top]
    assert set(ids) == {3, 19, 35, 51}  # the 4 vectors with pattern 3
    assert all(math.isclose(r["adc_dist"], 0.0, abs_tol=1e-12) for r in top)


def test_pq_encode_is_deterministic_and_distributed(spark, sf_dir):
    """Same codes across two independent encode runs (hash-ordered
    sample + seeded Lloyd => reproducible codebooks), code values within
    [0, ks), and the pandas-UDF path handles multi-partition input."""
    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.similarity import pq_encode, pq_train

    em = load_table(spark, sf_dir, "embeddings")
    cb1 = pq_train(em, "embedding", "vec_id", m=8, ks=16, seed=11)
    cb2 = pq_train(em, "embedding", "vec_id", m=8, ks=16, seed=11)
    assert cb1 == cb2
    a = {r["vec_id"]: list(r["pq_codes"]) for r in pq_encode(em, "embedding", "vec_id", cb1).collect()}
    b = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode(em.repartition(13), "embedding", "vec_id", cb1).collect()
    }
    assert a == b  # layout-invariant
    assert all(0 <= c < 16 for codes in a.values() for c in codes)


def test_ivf_pq_probe_all_matches_plain_pq(spark, sf_dir):
    """IVF-PQ with n_probe = n_cells must reproduce plain PQ ADC top-k
    exactly (routing only restricts candidates, never rescores); with
    fewer probes the result is a subset of cells but still k rows."""
    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.similarity import (
        ivf_build,
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    em = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    cb = pq_train(em, "embedding", "vec_id", m=8, ks=16, seed=42)
    codes = pq_encode(em, "embedding", "vec_id", cb).cache()
    q = [float(x) for x in em.filter(F.col("vec_id") == 0).first()["embedding"]]
    full = [(r["vec_id"], round(r["adc_dist"], 9)) for r in pq_topk(codes, cb, "vec_id", q, k=10).collect()]
    all_probe = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ivf_pq_topk(assigned, centroids, codes, cb, "vec_id", q, k=10, n_probe=8).collect()
    ]
    assert full == all_probe
    few = ivf_pq_topk(assigned, centroids, codes, cb, "vec_id", q, k=10, n_probe=2).collect()
    assert len(few) == 10
    assert {r["vec_id"] for r in few} <= {r["vec_id"] for r in codes.join(
        assigned, "vec_id").collect()}


def test_pq_topk_ignores_null_codes(spark):
    """ADVICE r4: NULL pq_codes -> NULL adc_dist, and ascending order is
    NULLS FIRST by default — a null row must never outrank real
    neighbors."""
    from nagios_custom_etl_spark.operators.similarity import pq_encode, pq_topk, pq_train

    rows = []
    for i in range(32):
        pat = [float((i % 16 == j) * 2 + 1) for j in range(8)]
        rows.append((i, pat + pat))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, "embedding", "vec_id", m=2, ks=16, seed=7, sample_rows=64)
    codes = pq_encode(df, "embedding", "vec_id", cb)
    with_null = codes.unionByName(
        spark.createDataFrame([(999, None)], "vec_id long, pq_codes array<int>")
    )
    q = [float((3 == j) * 2 + 1) for j in range(8)] * 2
    top = pq_topk(with_null, cb, "vec_id", q, k=4).collect()
    assert 999 not in {r["vec_id"] for r in top}
    assert all(r["adc_dist"] is not None for r in top)


def test_recall_per_query_reports_zero_hit_queries(spark):
    """ADVICE r4: the recall contract queries must emit a row for EVERY
    probe query, including recall 0.0 — a catastrophic regression must
    not shrink the result set."""
    from nagios_custom_etl_spark.plans.extensions import _recall_per_query

    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4)], "query_id long, vec_id long"
    )
    approx = spark.createDataFrame([(0, 1)], "query_id long, vec_id long")
    out = {
        r["query_id"]: (r["n_hits"], r["recall_at_10"])
        for r in _recall_per_query(exact, approx, 2).collect()
    }
    assert out[0] == (1, 0.5)
    assert out[1] == (0, 0.0)


def test_pq_topk_codes_col_parameterized(spark):
    """ADVICE r5: the ADC expression is generated SQL text — a renamed
    codes column must work via codes_col= (backtick-quoted), and a
    missing column must fail up front with a clear message, not an
    opaque parse error."""
    import pytest as _pytest

    from nagios_custom_etl_spark.operators.similarity import pq_encode, pq_topk, pq_train

    rows = []
    for i in range(32):
        pat = [float((i % 16 == j) * 2 + 1) for j in range(8)]
        rows.append((i, pat + pat))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, "embedding", "vec_id", m=2, ks=16, seed=7, sample_rows=64)
    codes = pq_encode(df, "embedding", "vec_id", cb)
    q = [float((3 == j) * 2 + 1) for j in range(8)] * 2
    base = {r["vec_id"] for r in pq_topk(codes, cb, "vec_id", q, k=2).collect()}
    renamed = codes.withColumnRenamed("pq_codes", "my codes")
    got = {
        r["vec_id"]
        for r in pq_topk(renamed, cb, "vec_id", q, k=2, codes_col="my codes").collect()
    }
    assert got == base
    with _pytest.raises(ValueError, match="codes column 'nope'"):
        pq_topk(codes, cb, "vec_id", q, k=2, codes_col="nope")


def test_ann_index_roundtrip_zero_refit(spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r5 task 1: write -> load must serve with ZERO KMeans/Lloyd
    fits and zero encode passes (a serving restart must never re-run the
    most expensive job in the system), answering identically to the
    in-memory index; the loaded probed scan must partition-prune on
    cell_id."""
    import contextlib
    import io

    import pytest as _pytest
    from pyspark.ml.clustering import KMeans

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators import similarity as S

    em = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = S.ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    cb = S.pq_train(em, "embedding", "vec_id", m=8, ks=16, seed=42)
    codes = S.pq_encode(em, "embedding", "vec_id", cb)
    q = [float(x) for x in em.filter(F.col("vec_id") == 0).first()["embedding"]]
    mem_pq = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in S.ivf_pq_topk(assigned, centroids, codes, cb, "vec_id", q, k=10, n_probe=3).collect()
    ]
    mem_exact = [
        (r["vec_id"], round(r["cos_sim"], 9))
        for r in S.ivf_search(assigned, centroids, "embedding", "vec_id", q, k=10, n_probe=3).collect()
    ]

    path = str(tmp_path / "index")
    S.ann_write_index(path, assigned, centroids, "vec_id", "embedding", codes, cb)

    # a restarted serving process must not be ABLE to fit: every training
    # entry point raises from here on
    def boom(*a, **k):
        raise AssertionError("loaded index must not trigger a fit/encode")

    monkeypatch.setattr(KMeans, "fit", boom)
    monkeypatch.setattr(S, "_lloyd", boom)
    monkeypatch.setattr(S, "pq_encode", boom)
    S._IVF_MEMO.clear()
    S._PQ_MEMO.clear()
    S._PQ_ENCODE_MEMO.clear()

    idx = S.ann_load_index(spark, path)
    disk_pq = [(r["vec_id"], round(r["adc_dist"], 9)) for r in idx.pq_search(q, k=10, n_probe=3).collect()]
    disk_exact = [
        (r["vec_id"], round(r["cos_sim"], 9)) for r in idx.exact_search(q, k=10, n_probe=3).collect()
    ]
    assert disk_pq == mem_pq
    assert disk_exact == mem_exact

    # probed scan prunes cells at the file-listing level
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx.routed(q, 2).explain("formatted")
    assert "PartitionFilters: [cell_id" in buf.getvalue()

    # guard rails: partial index (no sidecar) refuses to load; future
    # format versions refuse too; capability errors are clear
    with _pytest.raises(Exception):
        S.ann_load_index(spark, str(tmp_path / "nonexistent"))
    import json

    meta_path = f"{path}/{S._ANN_META_FILE}"
    meta = json.loads(S._fs_read_text(spark, meta_path))
    meta["format"] = 999
    S._fs_write_text(spark, meta_path, json.dumps(meta))
    with _pytest.raises(ValueError, match="unsupported ANN index format"):
        S.ann_load_index(spark, path)
    meta["format"] = S.ANN_INDEX_FORMAT
    meta["codebooks"] = None
    S._fs_write_text(spark, meta_path, json.dumps(meta))
    idx2 = S.ann_load_index(spark, path)
    with _pytest.raises(ValueError, match="without PQ codes"):
        idx2.pq_search(q)


def test_ann_assign_cells_matches_kmeans_transform(spark, sf_dir):
    """The incremental-append cell router (pure argmin expression over
    the stored centroid literals) must reproduce KMeans.transform's
    assignment exactly — otherwise appended rows land in different cells
    than a rebuild would place them."""
    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators import similarity as S

    em = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = S.ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    model_cells = {r["vec_id"]: r["cell_id"] for r in assigned.select("vec_id", "cell_id").collect()}
    expr_cells = {
        r["vec_id"]: r["cell"]
        for r in em.select(
            "vec_id", S.ann_assign_cells(em, "embedding", centroids).alias("cell")
        ).collect()
    }
    assert expr_cells == model_cells


def test_ann_append_zero_refit_and_codes_only_guard(spark, sf_dir, tmp_path, monkeypatch):
    """ann_append_to_index must never fit (frozen quantizers: encode-only
    with stored codebooks, expression-routed cells); a codes-only index
    refuses exact_search but appends fine when vec_col names the new
    rows' vectors."""
    import pytest as _pytest
    from pyspark.ml.clustering import KMeans

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators import similarity as S

    em = load_table(spark, sf_dir, "embeddings")
    initial = em.filter(F.col("vec_id") % 2 == 0)
    arrivals = em.filter(F.col("vec_id") % 2 == 1)
    assigned, centroids = S.ivf_build(initial, "embedding", "vec_id", n_cells=8, seed=3)
    cb = S.pq_train(initial, "embedding", "vec_id", m=8, ks=16, seed=3)
    codes = S.pq_encode(initial, "embedding", "vec_id", cb)
    path = str(tmp_path / "codes_only_idx")
    S.ann_write_index(path, assigned, centroids, "vec_id", None, codes, cb)

    def boom(*a, **k):
        raise AssertionError("append must not fit")

    monkeypatch.setattr(KMeans, "fit", boom)
    monkeypatch.setattr(S, "_lloyd", boom)
    S._IVF_MEMO.clear()
    S._PQ_MEMO.clear()

    # codes-only: must name the vector column of the new rows
    with _pytest.raises(ValueError, match="codes-only index"):
        S.ann_append_to_index(spark, path, arrivals)
    S.ann_append_to_index(spark, path, arrivals, vec_col="embedding")
    idx = S.ann_load_index(spark, path)
    assert idx.table.count() == em.count()  # both halves present
    with _pytest.raises(ValueError, match="without float vectors"):
        idx.exact_search([0.0] * 64)
    # the grown codes-only index still answers ADC searches over ALL rows
    q = [float(x) for x in em.filter(F.col("vec_id") == 1).first()["embedding"]]
    top = idx.pq_search(q, k=5, n_probe=8).collect()
    assert len(top) == 5 and top[0]["vec_id"] == 1  # odd (appended) row found


def test_ann_delete_and_compact_touch_only_affected_cells(spark, sf_dir, tmp_path):
    """x55/x56 physical claims: deletion rewrites ONLY cells containing
    deleted ids (untouched cells keep their exact files), and compaction
    collapses sliver piles to file-sized output per cell without
    touching already-compact cells."""
    import glob as _glob
    import os

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators import similarity as S

    em = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = S.ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    path = str(tmp_path / "idx")
    S.ann_write_index(path, assigned, centroids, "vec_id", "embedding")

    def files_per_cell() -> dict[int, set]:
        out: dict[int, set] = {}
        for d in _glob.glob(f"{path}/data/cell_id=*"):
            cell = int(os.path.basename(d).split("=")[1])
            out[cell] = {os.path.basename(f) for f in _glob.glob(f"{d}/*.parquet")}
        return out

    before = files_per_cell()
    # delete every id in ONE cell only
    victim_cell = min(before)
    victim_ids = assigned.filter(F.col("cell_id") == victim_cell).select("vec_id")
    n_victims = victim_ids.count()
    assert n_victims > 0
    S.ann_delete_from_index(spark, path, victim_ids)
    after = files_per_cell()
    for cell, fs in before.items():
        if cell != victim_cell:
            assert after[cell] == fs, f"untouched cell {cell} was rewritten"
    idx = S.ann_load_index(spark, path)
    assert idx.table.count() == em.count() - n_victims
    assert idx.table.filter(F.col("cell_id") == victim_cell).count() == 0

    # deleting nothing is a no-op (no files touched at all)
    S.ann_delete_from_index(spark, path, em.filter(F.col("vec_id") < 0).select("vec_id"))
    assert files_per_cell() == after

    # pile up slivers via appends, then compact: hot cells collapse,
    # row count and answers preserved
    for i in range(3):
        S.ann_append_to_index(
            spark, path, victim_ids.join(em, "vec_id").filter(F.col("vec_id") % 3 == i)
        )
    piled = files_per_cell()
    rewritten = S.ann_compact_index(spark, path, max_files_per_cell=2)
    compacted = files_per_cell()
    assert rewritten, "appends should have produced at least one hot cell"
    for cell in rewritten:
        assert len(compacted[cell]) < len(piled[cell])
    for cell, fs in piled.items():
        if cell not in rewritten:
            assert compacted[cell] == fs, f"compact touched cold cell {cell}"
    assert S.ann_load_index(spark, path).table.count() == em.count()


def test_x63_planted_contamination_flags(spark):
    """Planted train copies must flag at cosine 1.0 against their own
    source; organic evals stay far under the 0.8 threshold."""
    from nagios_custom_etl_spark.plans.registry import all_queries

    fn = all_queries()["x63_semantic_decontamination"].fn
    rows = {r.eval_id: r for r in fn(spark, "/root/testdata/sf0.001").collect()}
    planted = [i for i in rows if i >= 2000000]
    assert planted, "fixture must yield planted eval copies"
    for i in planted:
        assert rows[i].contaminated is True
        assert rows[i].max_cos_r == 1.0
        assert rows[i].nbr_id == i - 2000000  # argmax is the source vector
    organic = [i for i in rows if i < 2000000]
    assert organic and all(not rows[i].contaminated for i in organic)


def test_ann_drift_detect_and_retrain_recovers_recall(spark, tmp_path):
    """The x54 freeze's maintenance job: an append drawn from a DRIFTED
    distribution (a new cluster far from every build-time centroid)
    trips ann_drift_report and degrades recall@10 for drifted queries
    at small n_probe; ann_retrain_index re-fits the quantizers into a
    fresh data dir (old dir untouched — superseded readers keep
    serving), after which recall recovers and drift clears."""
    import random

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators.similarity import (
        ann_drift_report,
        ann_index_mutation_seq,
        ann_load_index,
        ann_retrain_index,
        ann_write_index,
        cosine_topk,
        ivf_build,
    )

    rnd = random.Random(5)
    dim = 8

    def cluster(center, n, base_id):
        return [
            (base_id + i, [c + rnd.uniform(-0.05, 0.05) for c in center])
            for i in range(n)
        ]

    # build-time distribution: two tight clusters on KNOWN hand-picked
    # centroids (no k-means in the build — the index layout is fully
    # deterministic; ann_write_index accepts any (assigned, centroids))
    from nagios_custom_etl_spark.operators.similarity import ann_assign_cells

    c0 = [3.0] + [0.3] * (dim - 1)
    c1 = [0.3, 3.0] + [0.3] * (dim - 2)
    centroids = [c0, c1]
    build_rows = cluster(c0, 60, 0) + cluster(c1, 60, 1000)
    df = spark.createDataFrame(build_rows, "vec_id long, embedding array<double>")
    assigned = df.withColumn(
        "cell_id", ann_assign_cells(df, "embedding", centroids)
    )
    path = str(tmp_path / "drift_idx")
    ann_write_index(path, assigned, centroids, "vec_id", "embedding")

    rep0 = ann_drift_report(spark, path)
    assert not rep0["drifted"]

    # drifted arrivals: ONE tight far-away cluster on axes the build
    # never used, EQUIDISTANT from both build centroids — the frozen
    # quantizers split it across the two cells on noise alone, so a
    # 1-probe query at its center sees only about half its true
    # neighbors (120 coin flips: the split cannot be one-sided)
    drift_center = [0.3] * dim
    drift_center[2] = drift_center[3] = 8.0
    drifted = cluster(drift_center, 120, 9000)
    from nagios_custom_etl_spark.operators.similarity import ann_append_to_index

    ann_append_to_index(
        spark,
        path,
        spark.createDataFrame(drifted, "vec_id long, embedding array<double>"),
    )
    rep1 = ann_drift_report(spark, path)
    assert rep1["drifted"]
    assert rep1["residual_ratio"] > 1.5

    def recall_at10(idx, qvec):
        truth = {
            r.vec_id
            for r in cosine_topk(
                idx.table, "embedding", "vec_id", qvec, k=10
            ).collect()
        }
        got = {r.vec_id for r in idx.exact_search(qvec, k=10, n_probe=1).collect()}
        return len(got & truth) / 10.0

    query = list(drift_center)
    idx = ann_load_index(spark, path)
    before = recall_at10(idx, query)
    assert before < 0.9  # the drift genuinely degraded 1-probe recall

    # retrain: 2-means over two well-separated superclusters (build
    # region vs the single tight drift blob) separates them from any
    # init — the drifted mass gets its own cell, 1-probe recall recovers
    seq = ann_retrain_index(spark, path, n_cells=2)
    assert seq == ann_index_mutation_seq(spark, path) == 2
    idx2 = ann_load_index(spark, path)
    after = recall_at10(idx2, query)
    assert after >= 0.9
    assert after > before  # the retrain is what recovered it
    rep2 = ann_drift_report(spark, path)
    assert not rep2["drifted"]
    # old data dir untouched on disk (superseded readers keep serving)
    assert fsio.exists(spark, f"{path}/data")
    assert fsio.exists(spark, f"{path}/data-r2")
    assert idx2.table.count() == idx.table.count()


def test_ann_retrain_codes_only_refuses(spark, tmp_path):
    from nagios_custom_etl_spark.operators.similarity import (
        ann_retrain_index,
        ann_write_index,
        ivf_build,
        pq_encode,
        pq_train,
    )

    rows = [(i, [float((i + j) % 4) for j in range(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = ivf_build(df, "embedding", "vec_id", n_cells=2, seed=3)
    cb = pq_train(df, "embedding", "vec_id", m=2, ks=4, seed=3)
    codes = pq_encode(df, "embedding", "vec_id", cb)
    path = str(tmp_path / "codesonly")
    ann_write_index(
        path, assigned, centroids, "vec_id", vec_col=None, codes=codes, codebooks=cb
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="codes-only"):
        ann_retrain_index(spark, path)


def test_ann_gc_index_reclaims_superseded_dirs_only(spark, tmp_path):
    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators.similarity import (
        ann_gc_index,
        ann_load_index,
        ann_retrain_index,
        ann_write_index,
        ivf_build,
    )

    rows = [(i, [float(i % 3), float(i % 5), 0.1, 0.2]) for i in range(90)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = ivf_build(df, "embedding", "vec_id", n_cells=3, seed=2)
    path = str(tmp_path / "gcidx")
    ann_write_index(path, assigned, centroids, "vec_id", "embedding")
    ann_retrain_index(spark, path)  # -> data-r1 current
    assert ann_gc_index(spark, path) == ["data"]
    assert not fsio.exists(spark, f"{path}/data")
    idx = ann_load_index(spark, path)
    assert idx.table.count() == 90  # current dir untouched, index servable
    assert ann_gc_index(spark, path) == []  # idempotent


def test_ann_retrain_cells_local_recovery_untouched_bytes(spark, tmp_path):
    """Per-cell retrain (x127): drift planted EQUIDISTANT from two of
    three hand-picked build centroids splits across those two cells and
    degrades 1-probe recall; ann_cell_drift names exactly those cells;
    ann_retrain_cells re-splits ONLY them into a patch dir — the primary
    dir's files stay byte-identical (untouched cells never rewritten),
    recall recovers, the refreshed per-cell baseline clears the drift,
    and later appends route into the owning patch dir."""
    import random

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_assign_cells,
        ann_cell_drift,
        ann_drift_report,
        ann_index_mutation_seq,
        ann_load_index,
        ann_retrain_cells,
        ann_write_index,
        cosine_topk,
    )

    rnd = random.Random(7)
    dim = 8

    def cluster(center, n, base_id):
        return [
            (base_id + i, [c + rnd.uniform(-0.05, 0.05) for c in center])
            for i in range(n)
        ]

    # three tight clusters on hand-picked centroids (no k-means at build:
    # fully deterministic layout — the x120 test convention)
    c0 = [3.0] + [0.3] * (dim - 1)
    c1 = [0.3, 3.0] + [0.3] * (dim - 2)
    c2 = [0.3, 0.3, 3.0] + [0.3] * (dim - 3)
    centroids = [c0, c1, c2]
    build = cluster(c0, 60, 0) + cluster(c1, 60, 1000) + cluster(c2, 60, 2000)
    df = spark.createDataFrame(build, "vec_id long, embedding array<double>")
    assigned = df.withColumn("cell_id", ann_assign_cells(df, "embedding", centroids))
    path = str(tmp_path / "pcr_idx")
    ann_write_index(path, assigned, centroids, "vec_id", "embedding")

    # drift: one tight far blob equidistant from c1 and c2 (axes 1,2 at
    # the midpoint; axes 4,5 far off) and strictly farther from c0 — the
    # 120 rows split across cells 1 and 2 on noise alone
    drift_center = [0.3, 1.65, 1.65, 0.3, 8.0, 8.0, 0.3, 0.3]
    drifted = cluster(drift_center, 120, 9000)
    ann_append_to_index(
        spark, path,
        spark.createDataFrame(drifted, "vec_id long, embedding array<double>"),
    )
    rep = ann_cell_drift(spark, path)
    assert rep["drifted_cells"] == [1, 2]
    assert rep["cells"]["0"]["ratio"] < 1.2  # cell 0 is NOT drifted

    def recall_at10(idx, qvec):
        truth = {
            r.vec_id
            for r in cosine_topk(idx.table, "embedding", "vec_id", qvec, k=10).collect()
        }
        got = {r.vec_id for r in idx.exact_search(qvec, k=10, n_probe=1).collect()}
        return len(got & truth) / 10.0

    idx = ann_load_index(spark, path)
    n_before = idx.table.count()
    before = recall_at10(idx, list(drift_center))
    assert before < 0.9  # the split genuinely degraded 1-probe recall

    primary_files = sorted(fsio.list_files_recursive(spark, f"{path}/data"))
    # cell-LOCAL retrain: 2-means over cells 1+2's rows separates the
    # tight far blob from the c1/c2 mass from any init (well-separated
    # superclusters — the x120 retrain-determinism argument)
    seq = ann_retrain_cells(spark, path, cells=[1, 2], seed=5)
    assert seq == ann_index_mutation_seq(spark, path) == 2
    # untouched-cell files BYTE-IDENTICAL: the primary dir was never
    # rewritten — the patch dir holds the re-routed cells
    assert sorted(fsio.list_files_recursive(spark, f"{path}/data")) == primary_files
    assert fsio.exists(spark, f"{path}/data-p2")
    idx2 = ann_load_index(spark, path)
    assert idx2.table.count() == n_before  # re-route moves rows, never drops
    after = recall_at10(idx2, list(drift_center))
    assert after >= 0.9 and after > before
    # cell 0's rows are untouched — still served from the primary dir
    assert idx2.table.filter(F.col("cell_id") == 0).count() == 60
    # refreshed per-cell baseline: nothing drifted anymore (global too)
    assert ann_cell_drift(spark, path)["drifted_cells"] == []
    assert not ann_drift_report(spark, path)["drifted"]
    # appends now route into the OWNING dir: a new blob row must land in
    # the patch dir, not the primary, and be served
    extra = spark.createDataFrame(
        [(9999, list(drift_center))], "vec_id long, embedding array<double>"
    )
    ann_append_to_index(spark, path, extra)
    assert sorted(fsio.list_files_recursive(spark, f"{path}/data")) == primary_files
    assert ann_load_index(spark, path).table.filter(F.col("vec_id") == 9999).count() == 1


def test_ann_retrain_cells_kmeans_collapse_fallback(spark, tmp_path, monkeypatch):
    """r11-verdict regression (x127 crash): Spark's random-init KMeans
    DE-DUPLICATES sampled init points, so duplicate-heavy drifted cells
    can return fewer centers than requested and the local-cell remap
    used to IndexError. The guard must detect the shortfall and fall
    back to deterministic per-cell mean re-centering (assignment
    unchanged). Pinned deterministically by truncating ivf_build's
    centers to simulate the collapse."""
    import json

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import similarity as sim

    c0, c1 = [3.0] + [0.3] * 7, [0.3, 3.0] + [0.3] * 6
    rows = [(i, [v + 0.01 * (i % 5) for v in (c0 if i % 2 else c1)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = df.withColumn(
        "cell_id", sim.ann_assign_cells(df, "embedding", [c0, c1])
    )
    path = str(tmp_path / "collapse_idx")
    sim.ann_write_index(path, assigned, [c0, c1], "vec_id", "embedding")

    real_build = sim.ivf_build

    def collapsing_build(vecs, vec_col, id_col, n_cells, seed=0, **kw):
        a, cents = real_build(vecs, vec_col, id_col, n_cells, seed, **kw)
        return a, cents[:1]  # the dedup collapse: fewer centers than k

    monkeypatch.setattr(sim, "ivf_build", collapsing_build)
    seq = sim.ann_retrain_cells(spark, path, cells=[0, 1], seed=13)
    assert seq == 1
    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_index_meta.json"))
    assert [p["cells"] for p in meta["patches"]] == [[0, 1]]
    idx = sim.ann_load_index(spark, path)
    assert idx.table.count() == 80
    # assignment unchanged: c0-rows map to centroid index 0 (40 rows)
    assert idx.table.filter(F.col("cell_id") == 0).count() == 40
    # centroid moved to each cell's mean: the jitter is 0.01*(i%5) with
    # i%5 uniform over {0..4} within each parity class, so mean = c+0.02
    for cid, base in ((0, c0), (1, c1)):
        cent = meta["centroids"][cid]
        expect = [v + 0.02 for v in base]
        assert max(abs(a - b) for a, b in zip(cent, expect)) < 1e-9
    # refreshed baseline covers both retrained cells
    assert set(meta["drift_baseline"]["cell_d2"]) == {"0", "1"}


def test_ann_retrain_cells_duplicate_heavy_end_to_end(spark, tmp_path):
    """The verdict's exact recipe, unpatched: many copies of 2 distinct
    vectors across 2 cells at the seed where the collapse was measured
    (k=2 over 2 distinct repeated points -> 1 center at seed 13). Must
    not crash regardless of which path runs; invariants (row count,
    exact search, patch ownership) hold on both."""
    from nagios_custom_etl_spark.operators.similarity import (
        ann_assign_cells,
        ann_load_index,
        ann_retrain_cells,
        ann_write_index,
    )

    vA, vB = [3.0] + [0.3] * 7, [0.3, 3.0] + [0.3] * 6
    rows = [(i, list(vA)) for i in range(50)] + [
        (100 + i, list(vB)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = df.withColumn("cell_id", ann_assign_cells(df, "embedding", [vA, vB]))
    path = str(tmp_path / "dup_idx")
    ann_write_index(path, assigned, [vA, vB], "vec_id", "embedding")
    seq = ann_retrain_cells(spark, path, cells=[0, 1], seed=13)
    assert seq == 1
    idx = ann_load_index(spark, path)
    assert idx.table.count() == 100
    got = {r.vec_id for r in idx.exact_search(list(vA), k=5, n_probe=1).collect()}
    assert got <= set(range(50)) and len(got) == 5


def test_ann_consolidate_index_folds_patches(spark, tmp_path):
    """r11 verdict task 7: after >=2 per-cell retrains, consolidation
    folds the patch dirs into ONE (rows read only from the owning patch
    dirs), the primary stays byte-identical, routing/search/counts are
    invariant, gc reclaims the superseded dirs, and <2 patches is a
    no-op."""
    import json

    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators.similarity import (
        ann_assign_cells,
        ann_consolidate_index,
        ann_gc_index,
        ann_load_index,
        ann_retrain_cells,
        ann_write_index,
    )

    c0 = [3.0] + [0.3] * 7
    c1 = [0.3, 3.0] + [0.3] * 6
    c2 = [0.3, 0.3, 3.0] + [0.3] * 5
    cents = [c0, c1, c2]
    rows = [
        (i, [v + 0.01 * (i % 7) for v in cents[i % 3]]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = df.withColumn("cell_id", ann_assign_cells(df, "embedding", cents))
    path = str(tmp_path / "cons_idx")
    ann_write_index(path, assigned, cents, "vec_id", "embedding")
    assert ann_consolidate_index(spark, path) is None  # no patches yet
    ann_retrain_cells(spark, path, cells=[0], seed=3)  # patch 1
    assert ann_consolidate_index(spark, path) is None  # one patch: no-op
    ann_retrain_cells(spark, path, cells=[2], seed=4)  # patch 2
    before = sorted(
        (r.vec_id, r.cell_id) for r in ann_load_index(spark, path).table.collect()
    )
    primary_files = sorted(fsio.list_files_recursive(spark, f"{path}/data"))
    seq = ann_consolidate_index(spark, path)
    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_index_meta.json"))
    assert seq == meta["mutation_seq"] == 3
    assert [sorted(p["cells"]) for p in meta["patches"]] == [[0, 2]]  # ONE entry
    assert meta["patches"][0]["dir"] == "data-p3"
    # primary untouched; content invariant
    assert sorted(fsio.list_files_recursive(spark, f"{path}/data")) == primary_files
    idx = ann_load_index(spark, path)
    assert sorted((r.vec_id, r.cell_id) for r in idx.table.collect()) == before
    got = {r.vec_id for r in idx.exact_search(list(c1), k=5, n_probe=1).collect()}
    assert got and all(v % 3 == 1 for v in got)  # cell-1 rows, untouched leg
    # gc reclaims exactly the superseded patch dirs
    reclaimed = ann_gc_index(spark, path)
    assert sorted(reclaimed) == ["data-p1", "data-p2"]
    assert ann_load_index(spark, path).table.count() == 120
    # idempotent: one patch left -> no-op
    assert ann_consolidate_index(spark, path) is None


def test_ann_retrain_cells_lifecycle_guards(spark, tmp_path):
    """Patch lifecycle: a re-patch supersedes the previous patch entry
    and ann_gc_index reclaims the emptied dir; a FULL retrain clears
    every patch; delete works inside a patched cell; codes-only and
    missing-baseline refuse; no-drift returns None."""
    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators.similarity import (
        ann_assign_cells,
        ann_delete_from_index,
        ann_gc_index,
        ann_load_index,
        ann_retrain_cells,
        ann_retrain_index,
        ann_write_index,
    )

    c0, c1 = [3.0] + [0.3] * 7, [0.3, 3.0] + [0.3] * 6
    rows = [(i, [v + 0.01 * (i % 5) for v in (c0 if i % 2 else c1)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = df.withColumn("cell_id", ann_assign_cells(df, "embedding", [c0, c1]))
    path = str(tmp_path / "lc_idx")
    ann_write_index(path, assigned, [c0, c1], "vec_id", "embedding")
    assert ann_retrain_cells(spark, path, cells=[]) is None
    assert ann_retrain_cells(spark, path) is None  # nothing drifted
    ann_retrain_cells(spark, path, cells=[1], seed=3)   # -> data-p1... seq 1
    ann_retrain_cells(spark, path, cells=[1], seed=4)   # supersedes p-entry
    import json

    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_index_meta.json"))
    assert [p["cells"] for p in meta["patches"]] == [[1]]  # one live entry
    reclaimed = ann_gc_index(spark, path)
    assert reclaimed and all(d.startswith("data-p") for d in reclaimed)
    idx = ann_load_index(spark, path)
    assert idx.table.count() == 80
    # delete inside the patched cell
    ann_delete_from_index(spark, path, spark.createDataFrame([(2,)], "vec_id long"))
    assert ann_load_index(spark, path).table.count() == 79
    # full retrain clears patches; gc reclaims the patch dir
    ann_retrain_index(spark, path, n_cells=2, seed=9)
    meta = json.loads(fsio.read_text(spark, f"{path}/_ann_index_meta.json"))
    assert "patches" not in meta
    assert any(d.startswith("data-p") for d in ann_gc_index(spark, path))
    assert ann_load_index(spark, path).table.count() == 79


def test_filtered_search_strategies_and_probe_all_exactness(spark, sf_dir):
    """x146: filtered vector search — the selective path prefilters and
    is EXACT; the unselective path applies the predicate inside the
    probed cells (before truncation), so probing EVERY cell recovers
    exactly the prefiltered answer; selectivity measurement picks the
    strategy when none is supplied."""
    from nagios_custom_etl_spark.operators.similarity import (
        cosine_topk_filtered,
        ivf_build,
    )

    em = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    pred = F.col("label") == 3
    exact, s1 = cosine_topk_filtered(
        em, "embedding", "vec_id", qvec, pred, k=10, selectivity=0.01
    )
    assert s1 == "prefilter"
    exact_rows = [(r["vec_id"], round(r["cos_sim"], 9)) for r in exact.collect()]
    assert all(
        r["label"] == 3
        for r in em.join(exact.select("vec_id"), "vec_id", "left_semi").collect()
    )
    # probe path: index carries the predicate column (joined back on id)
    assigned, centroids = ivf_build(em, "embedding", "vec_id", n_cells=8, seed=42)
    assigned_meta = assigned.join(em.select("vec_id", "label"), "vec_id")
    probed, s2 = cosine_topk_filtered(
        em, "embedding", "vec_id", qvec, pred, k=10,
        assigned=assigned_meta, centroids=centroids,
        n_probe=8, selectivity=0.5,  # unselective -> probe
    )
    assert s2 == "probe"
    probed_rows = [(r["vec_id"], round(r["cos_sim"], 9)) for r in probed.collect()]
    assert probed_rows == exact_rows  # probe-all == exact filtered
    # partial probes return a subset of the filtered corpus, never leak
    # predicate-failing rows
    part, _ = cosine_topk_filtered(
        em, "embedding", "vec_id", qvec, pred, k=10,
        assigned=assigned_meta, centroids=centroids,
        n_probe=2, selectivity=0.5,
    )
    ids = [r["vec_id"] for r in part.collect()]
    labels = {r["label"] for r in em.filter(F.col("vec_id").isin(ids)).collect()}
    assert labels <= {3}
    # measured selectivity (no hint): ~10% labels -> above the 5%
    # threshold BUT no index supplied -> prefilter fallback
    auto, s3 = cosine_topk_filtered(em, "embedding", "vec_id", qvec, pred, k=10)
    assert s3 == "prefilter"
    assert [(r["vec_id"], round(r["cos_sim"], 9)) for r in auto.collect()] == exact_rows


def test_filtered_index_meta_cols_lifecycle(spark, tmp_path):
    """r13 verdict task 4: metadata columns persisted WITH the index
    (meta_cols opt-in) serve filtered searches inside probed cells —
    probe-all filtered search == exact filtered brute force; appends
    must carry the meta columns (refused otherwise) and deletes keep
    them; an index written WITHOUT meta_cols refuses filtered search."""
    import math

    from nagios_custom_etl_spark.operators.similarity import (
        ann_append_to_index,
        ann_delete_from_index,
        ann_load_index,
        ann_write_index,
    )

    def unit(*xs):
        n = math.sqrt(sum(x * x for x in xs))
        return [x / n for x in xs]

    rows = [
        (i, unit(math.cos(i * 0.37), math.sin(i * 0.37), 0.1 * (i % 5), 1.0),
         i % 3)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lbl int"
    )
    assigned, centroids = ivf_build(df, "embedding", "vec_id", n_cells=4, seed=7)
    assigned = assigned.join(df.select("vec_id", "lbl"), "vec_id")
    path = str(tmp_path / "idx")
    ann_write_index(
        path, assigned, centroids, "vec_id", "embedding", meta_cols=["lbl"]
    )
    idx = ann_load_index(spark, path)
    assert idx.meta_cols == ["lbl"]
    q = unit(1.0, 0.2, 0.1, 1.0)
    got = [
        r["vec_id"]
        for r in idx.filtered_exact_search(
            q, F.col("lbl") == 1, k=5, n_probe=4
        ).collect()
    ]
    exact = [
        r["vec_id"]
        for r in cosine_topk(
            df.filter(F.col("lbl") == 1), "embedding", "vec_id", q, k=5
        ).collect()
    ]
    assert got == exact  # probe-all == exact filtered answer
    # appends must carry the stored meta columns
    newbie = spark.createDataFrame(
        [(100, unit(1.0, 0.2, 0.1, 1.0))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="meta column"):
        ann_append_to_index(spark, path, newbie)
    ann_append_to_index(spark, path, newbie.withColumn("lbl", F.lit(1)))
    idx = ann_load_index(spark, path)
    got = [
        r["vec_id"]
        for r in idx.filtered_exact_search(
            q, F.col("lbl") == 1, k=1, n_probe=4
        ).collect()
    ]
    assert got == [100]  # the appended exact-match row serves filtered
    # deletes rewrite rows wholesale: meta columns ride along
    ann_delete_from_index(
        spark, path, spark.createDataFrame([(100,)], "vec_id long")
    )
    idx = ann_load_index(spark, path)
    got = [
        r["vec_id"]
        for r in idx.filtered_exact_search(
            q, F.col("lbl") == 1, k=5, n_probe=4
        ).collect()
    ]
    assert got == exact
    # an index without meta_cols refuses filtered search loudly
    path2 = str(tmp_path / "idx2")
    ann_write_index(path2, assigned, centroids, "vec_id", "embedding")
    with pytest.raises(ValueError, match="meta_cols"):
        ann_load_index(spark, path2).filtered_exact_search(q, F.col("lbl") == 1)


def test_ann_selectivity_from_stats_zero_scan(spark, tmp_path):
    """The manifest-stats selectivity estimator: discrete-uniform
    interpolation over recorded per-file [min,max] + __rows — exact on
    a uniform integer column, range-clamped, refusing unrecorded rows,
    and touching ZERO data files (the estimator never receives a
    DataFrame; it reads manifest JSON only)."""
    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.similarity import (
        ann_selectivity_from_stats,
    )

    root = str(tmp_path / "tab")
    df = spark.range(0, 300).select(
        F.col("id").cast("long").alias("vec_id"),
        (F.col("id") % 3).cast("int").alias("lbl"),
    )
    S.append(df.repartition(4), root, stats_cols=["lbl"])
    # point predicate on a 0..2 column: discrete form gives exactly 1/3
    assert ann_selectivity_from_stats(spark, root, "lbl", 1, 1) == pytest.approx(
        1.0 / 3.0, abs=1e-12
    )
    # full-range predicate saturates at 1; disjoint range at 0
    assert ann_selectivity_from_stats(spark, root, "lbl", 0, 2) == 1.0
    assert ann_selectivity_from_stats(spark, root, "lbl", 5, 9) == 0.0
    # a column without recorded bounds counts fully (upper-bound lean)
    assert ann_selectivity_from_stats(spark, root, "nope", 0, 1) == 1.0


def test_ann_sync_from_changes_netting_and_replay(spark, tmp_path):
    """CDF-driven index sync: per-id netting (a row inserted and then
    deleted INSIDE the synced range must not reach the index; an update
    nets to its last post-image), and a replayed range (crash before
    the high-water bump) cannot duplicate rows — delete-covers-
    duplicates."""
    import math

    from nagios_custom_etl_spark.operators import snapshots as S
    from nagios_custom_etl_spark.operators.similarity import (
        ann_load_index,
        ann_sync_from_changes,
        ann_write_index,
    )

    def unit(*xs):
        n = math.sqrt(sum(x * x for x in xs))
        return [x / n for x in xs]

    def vecs(ids):
        return spark.createDataFrame(
            [(i, unit(math.cos(i), math.sin(i), 1.0)) for i in ids],
            "vec_id long, embedding array<double>",
        )

    root, path = str(tmp_path / "tab"), str(tmp_path / "idx")
    S.set_change_feed(spark, root, True)
    S.append(vecs(range(20)), root, stats_cols=["vec_id"])  # v1
    assigned, centroids = ivf_build(
        S.read_snapshot(spark, root, 1), "embedding", "vec_id", n_cells=2,
        seed=5,
    )
    ann_write_index(path, assigned, centroids, "vec_id", "embedding")
    S.append(vecs([100, 101]), root, stats_cols=["vec_id"])  # v2
    S.mor_delete(
        spark.createDataFrame([(100,), (3,)], "vec_id long"), root,
        keys=["vec_id"],
    )  # v3: 100 was inserted at v2 -> nets to NOTHING; 3 nets to delete
    v = ann_sync_from_changes(spark, path, root)
    assert v == 3
    idx = ann_load_index(spark, path)
    ids = sorted(r.vec_id for r in idx.table.select("vec_id").collect())
    expect = sorted(set(range(20)) - {3} | {101})
    assert ids == expect
    # crash replay: reset the high-water mark, re-sync — no duplicates
    import json as _json

    from nagios_custom_etl_spark import fsio

    meta = _json.loads(fsio.read_text(spark, f"{path}/_ann_index_meta.json"))
    meta["synced_version"] = 0
    fsio.write_text(spark, f"{path}/_ann_index_meta.json", _json.dumps(meta))
    assert ann_sync_from_changes(spark, path, root) == 3
    idx = ann_load_index(spark, path)
    ids = sorted(r.vec_id for r in idx.table.select("vec_id").collect())
    assert ids == expect  # exactly once, no duplicates
    # and a no-op re-sync holds still
    assert ann_sync_from_changes(spark, path, root) == 3
