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
