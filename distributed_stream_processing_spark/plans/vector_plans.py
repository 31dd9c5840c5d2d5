"""Embedding similarity-search queries (ANN baseline + scale paths)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.vectors import duck_cosine
from distributed_stream_processing_spark.operators.similarity_search import (
    brute_force_topk,
    embedding_near_pairs,
    lsh_topk,
)
from distributed_stream_processing_spark.plans.registry import query

_COS = duck_cosine("q.embedding", "c.embedding")


@query(
    "q26_ann_topk",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(q.vec_id AS BIGINT) AS q_id,
             CAST(c.vec_id AS BIGINT) AS vec_id,
             round({_COS}, 4) AS cos4
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id % 50 = 0
    )
    SELECT q_id, vec_id, cos4, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos4 DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    doc=(
        "Brute-force cosine top-5 per query vector (queries broadcast, "
        "corpus partition-parallel; double-precision fold is "
        "bit-identical to the DuckDB oracle)."
    ),
)
def q26_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return brute_force_topk(queries, emb, k=5)


@query(
    "q27_embedding_near_pairs",
    oracle=f"""
    SELECT CAST(q.vec_id AS BIGINT) AS a_id,
           CAST(c.vec_id AS BIGINT) AS b_id,
           round({_COS}, 4) AS cos4
    FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
    WHERE round({_COS}, 4) >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold 0.4 on this corpus).",
)
def q27_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return embedding_near_pairs(emb, 0.4)


@query(
    "q28_ann_lsh",
    oracle=None,  # approximate by construction; pytest checks recall
    doc=(
        "Hyperplane-LSH bucketed ANN top-5 (single probe) — the 100 TB "
        "path: score only same-bucket candidates."
    ),
)
def q28_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return lsh_topk(queries, emb, k=5)
