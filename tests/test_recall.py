"""ANN retrieval-quality floors (see tools/recall_sweep.py, RECALL.md).

The correctness oracles prove each ANN operator computes its contract
exactly; these tests pin the RECALL the approximate searchers deliver
against exact ground truth, so a tuning regression (broken bucket key,
wrong probe set, off-by-one band) shows up as a recall collapse even
when the operator still "computes something" deterministically.

The synthetic embeddings are ~uniform in 64-d — the WORST case for
space partitioning (no cluster structure to exploit), so absolute
recall at small nprobe is modest by nature; the floors assert the
measured values with safety margin, plus the two structural guarantees
that hold on ANY corpus: recall grows monotonically with nprobe, and
probing every list reproduces the exact result."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import table
from tools.recall_sweep import recall_at_k, _truth_sets


@pytest.fixture(scope="module")
def ann_setup(spark, sf_dir):
    from topic_store_spark.operators.similarity import (
        kmeans_centroids,
        topk_neighbors,
    )

    emb = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    queries = emb.filter(F.col("vec_id") < 30)
    truth = _truth_sets(topk_neighbors(emb, queries, k=10))
    centroids = (
        kmeans_centroids(emb, 16, max_iter=5)
        .select(F.col("cen_id").alias("vec_id"), "embedding")
        .persist()
    )
    centroids.count()
    yield emb, queries, truth, centroids
    emb.unpersist()
    centroids.unpersist()


def test_ivf_recall_floors_and_monotonicity(ann_setup):
    from topic_store_spark.operators.similarity import ivf_ann_neighbors

    emb, queries, truth, centroids = ann_setup
    r = {
        nprobe: recall_at_k(
            ivf_ann_neighbors(emb, queries, centroids, k=10, nprobe=nprobe),
            truth,
        )
        for nprobe in (2, 4, 8, 16)
    }
    # measured at sf0.001: 0.37 / 0.56 / 0.78 / 1.00 — floors with margin
    assert r[4] >= 0.40
    assert r[8] >= 0.60
    # probing every list IS the exact search
    assert r[16] == 1.0
    # more probes never lose recall (allow tiny tie-break jitter)
    assert r[2] <= r[4] + 1e-9 <= r[8] + 2e-9 <= r[16] + 3e-9


def test_ivf_pq_residual_recall_floor(ann_setup):
    """Residual encoding (IVF-ADC) must not lose recall vs raw-vector
    PQ at the same (m, codes, nprobe) — and must retain a floor fraction
    of plain IVF's recall at the same nprobe (plain IVF is the
    quantization-free ceiling of the same candidate set).  On this
    ~uniform corpus residuals are nearly as large as raw vectors (the
    centroid of uniform unit vectors is ~0), so the gain is small by
    nature — the clustered-corpus win is pinned separately in
    test_dedup_similarity.test_ivf_pq_residual_beats_raw_on_clustered_corpus."""
    from topic_store_spark.operators.similarity import (
        ivf_ann_neighbors,
        ivf_pq_ann_neighbors,
        ivf_residual_vectors,
        train_pq_codebooks,
    )

    emb, queries, truth, centroids = ann_setup
    res = ivf_residual_vectors(emb, centroids)
    raw_books = train_pq_codebooks(emb, m=8, k=16, max_iter=3)
    res_books = train_pq_codebooks(res, m=8, k=16, max_iter=3)
    r_ivf = recall_at_k(
        ivf_ann_neighbors(emb, queries, centroids, k=10, nprobe=4), truth
    )
    r_raw = recall_at_k(
        ivf_pq_ann_neighbors(
            emb, queries, centroids, raw_books, k=10, nprobe=4
        ),
        truth,
    )
    r_res = recall_at_k(
        ivf_pq_ann_neighbors(
            emb, queries, centroids, res_books, k=10, nprobe=4, residual=True
        ),
        truth,
    )
    # small jitter allowance: the two trainings quantize independently
    assert r_res >= r_raw - 0.05, (r_res, r_raw)
    # quantization keeps at least a third of the exact-candidate recall
    # even in the uniform worst case (measured ~0.5x at sf0.001)
    assert r_res >= 0.33 * r_ivf, (r_res, r_ivf)


def test_lsh_recall_floor(ann_setup):
    from topic_store_spark.operators.similarity import lsh_ann_neighbors

    emb, queries, truth, _ = ann_setup
    # 4 hyperplanes -> 16 buckets; ~n/16 candidates scored per query.
    # Uniform 64-d corpus: measured 0.126 at sf0.001 — assert a floor
    # well above the ~0.06 a random same-size candidate set would give.
    r = recall_at_k(lsh_ann_neighbors(emb, queries, k=10, planes=4), truth)
    assert r >= 0.08


def test_lsh_multiprobe_recall_monotone(ann_setup):
    """Multi-probe candidates are a SUPERSET of single-probe's (the own
    bucket is always probe 1), so recall must be non-decreasing in
    probes — and strictly better by a real margin at probes=8 on this
    corpus (measured ~4x at planes=6)."""
    from topic_store_spark.operators.similarity import lsh_ann_neighbors

    emb, queries, truth, _ = ann_setup
    r = {
        probes: recall_at_k(
            lsh_ann_neighbors(emb, queries, k=10, planes=6, probes=probes),
            truth,
        )
        for probes in (1, 4, 8)
    }
    assert r[1] <= r[4] + 1e-9 <= r[8] + 2e-9
    assert r[8] >= r[1] + 0.05, r


def test_residual_pq_holds_ivf_recall_on_clustered_corpus(spark):
    """On a CLUSTERED corpus (the real-embedding operating point —
    residuals genuinely smaller than raw vectors) residual ADC at the
    production-trainer configuration (m=32 2-d subspaces, 256 codes,
    32 bytes/vector) retains >=0.8x of plain IVF's recall at the same
    nprobe — plain IVF being the quantization-free ceiling of the
    identical candidate set (near-1.0 here, so the ratio isolates pure
    quantization loss; measured 0.90x at nprobe=2 on this seed).
    Fully seeded, deterministic; the sf0.1 curve lives in RECALL.md's
    clustered section."""
    from tools.recall_sweep import _clustered_corpus

    from topic_store_spark.operators.similarity import (
        ivf_ann_neighbors,
        ivf_pq_ann_neighbors,
        ivf_residual_vectors,
        kmeans_centroids,
        topk_neighbors,
        train_pq_codebooks,
    )

    emb = _clustered_corpus(spark, n=800, ncen=8).persist()
    queries = emb.filter(F.col("vec_id") < 20)
    truth = _truth_sets(topk_neighbors(emb, queries, k=10))
    centroids = kmeans_centroids(emb, 8, max_iter=4).select(
        F.col("cen_id").alias("vec_id"), "embedding"
    )
    res = ivf_residual_vectors(emb, centroids)
    res_books = train_pq_codebooks(res, m=32, k=256, max_iter=3)
    for nprobe in (2, 4):
        r_ivf = recall_at_k(
            ivf_ann_neighbors(emb, queries, centroids, k=10, nprobe=nprobe),
            truth,
        )
        r_res = recall_at_k(
            ivf_pq_ann_neighbors(
                emb, queries, centroids, res_books, k=10, nprobe=nprobe,
                residual=True,
            ),
            truth,
        )
        assert r_res >= 0.8 * r_ivf, (nprobe, r_res, r_ivf)
    emb.unpersist()
