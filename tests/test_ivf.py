"""IVF ANN recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.operators.similarity_search import (
    brute_force_topk,
    ivf_topk,
)


def test_ivf_recall_and_contract(spark, sf_smoke):
    emb = Catalog(spark, sf_smoke).embeddings
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(q, emb, k=5)
    approx = ivf_topk(q, emb, k=5, n_centroids=8, n_probe=4)
    assert exact.columns == approx.columns
    et = {(r.q_id, r.vec_id) for r in exact.collect()}
    at = {(r.q_id, r.vec_id) for r in approx.collect()}
    # probing half the centroids on structure-free vectors: loose floor
    assert len(at & et) >= 0.3 * len(et)
    # ranks are 1..k per query with no duplicates
    from collections import Counter

    per_q = Counter(qid for qid, _ in at)
    assert all(v <= 5 for v in per_q.values())


def test_ivf_deterministic(spark, sf_smoke):
    """Seeded quantizer -> identical output across runs (the property
    that lets q46 carry a hard DuckDB oracle)."""
    emb = Catalog(spark, sf_smoke).embeddings
    q = emb.filter(F.col("vec_id") % 50 == 0)
    a = sorted(map(tuple, ivf_topk(q, emb, k=5).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, k=5).collect()))
    assert a == b


def test_lloyd_trainer_deterministic_and_pluggable(spark, sf_smoke):
    """train_centroids_lloyd: bit-identical across calls on the same
    deterministic sample, and its centroids slot into ivf_topk."""
    from distributed_stream_processing_spark.operators.similarity_search import (
        train_centroids_lloyd,
    )

    emb = Catalog(spark, sf_smoke).embeddings
    sample = [
        r.embedding
        for r in emb.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    c1 = train_centroids_lloyd(sample, n_centroids=8, seed=7)
    c2 = train_centroids_lloyd(sample, n_centroids=8, seed=7)
    assert c1 == c2
    q = emb.filter(F.col("vec_id") % 50 == 0)
    out = ivf_topk(q, emb, k=5, n_probe=4, centroids=c1)
    exact = brute_force_topk(q, emb, k=5)
    et = {(r.q_id, r.vec_id) for r in exact.collect()}
    at = {(r.q_id, r.vec_id) for r in out.collect()}
    assert len(at & et) >= 0.3 * len(et)


def test_ivf_infers_dim_from_corpus(spark):
    """ADVICE r5: dim was hard-coded to 64; non-64-dim embeddings
    null-folded every centroid distance and silently collapsed
    bucketing. The quantizer dim now defaults to the corpus's
    measured width — 16-dim vectors must bucket and rank properly."""
    import numpy as np

    rng = np.random.RandomState(3)
    mat = rng.randn(120, 16)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(len(mat))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") % 40 == 0)
    exact = brute_force_topk(q, emb, k=5)
    approx = ivf_topk(q, emb, k=5, n_centroids=4, n_probe=2)
    et = {(r.q_id, r.vec_id) for r in exact.collect()}
    at = {(r.q_id, r.vec_id) for r in approx.collect()}
    assert len(at) > 0
    assert len(at & et) >= 0.3 * len(et)
    # buckets must actually PARTITION the corpus (the old null-fold
    # put every row in one bucket): probing 2/4 centroids on unit
    # gaussians should scan roughly half the corpus, so some exact
    # neighbors are missed OR the candidate sets differ from a full
    # scan; assert the plan at least produced k-capped ranked output
    from collections import Counter

    per_q = Counter(qid for qid, _ in at)
    assert all(v <= 5 for v in per_q.values())


def test_ivf_rejects_mismatched_embedding_width(spark):
    """A row whose embedding width differs from the quantizer dim
    must raise loudly at scan time, not degrade recall silently."""
    import pytest

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0])]  # 3-wide intruder
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0)
    with pytest.raises(Exception, match="embedding width"):
        ivf_topk(q, emb, k=2, n_centroids=2, n_probe=2).collect()
