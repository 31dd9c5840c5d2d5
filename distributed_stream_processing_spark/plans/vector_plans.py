"""Embedding similarity-search queries (ANN baseline + scale paths)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.vectors import duck_cosine, duck_dot
from distributed_stream_processing_spark.operators.similarity_search import (
    brute_force_topk,
    lsh_near_pairs,
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
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # the single-file embeddings fixture scans as 1 partition — widen
    # the CORPUS side so the scoring seam runs session-wide (r19,
    # catalog.widen_small_scan; queries are collected driver-side)
    return brute_force_topk(queries, cat.widen_small_scan(emb), k=5)


@query(
    "q27_embedding_near_pairs",
    oracle=f"""
    WITH corpus AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT CAST(vec_id AS BIGINT) + 100000,
             list_prepend(CAST(embedding[1] AS DOUBLE) + 0.1,
                          list_transform(embedding[2:],
                                         x -> CAST(x AS DOUBLE)))
      FROM embeddings
    )
    SELECT q.vec_id AS a_id, c.vec_id AS b_id, round({_COS}, 4) AS cos4
    FROM corpus q JOIN corpus c ON q.vec_id < c.vec_id
    WHERE round({_COS}, 4) >= 0.95
    """,
    doc=(
        "Embedding-cosine near-duplicate pairs via banded sign-LSH "
        "candidates + exact verify. The raw corpus has no near-dups "
        "(max pairwise cosine ~0.51), so the query plants one "
        "deterministic perturbed twin per vector (coordinate 0 "
        "shifted by +0.1 on unit vectors -> cosine ~0.995-0.997) and "
        "joins at threshold 0.95 — the regime the LSH scale path is "
        "built for. The oracle is an exact all-pairs scan over the "
        "same constructed corpus, so the gate checks LSH recall "
        "exactly; the plan itself contains no CartesianProduct."
    ),
)
def q27_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # widen the 1-partition corpus scan (see q26)
    emb = cat.widen_small_scan(cat.embeddings)
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    twin = emb.select(
        (F.col("vec_id").cast("bigint") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0].cast("double") + F.lit(0.1)),
            F.expr(
                "transform(slice(embedding, 2, size(embedding) - 1),"
                " x -> cast(x as double))"
            ),
        ).alias("embedding"),
    )
    return lsh_near_pairs(base.unionByName(twin), 0.95)


def _lsh_oracle(k: int = 5, n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    """DuckDB twin of lsh_topk's multiprobe=1 path. The hyperplanes
    are seeded plan-time constants, so the bucketing is deterministic:
    embed them as double literals (repr round-trips exactly) and
    evaluate the identical left-to-right dot fold — sign bits, probe
    buckets, candidates, and cos4 all reproduce bit-exactly, making
    the 'approximate' ANN result an exactly-checkable function of its
    seed."""
    from distributed_stream_processing_spark.operators.similarity_search import (
        _hyperplanes,
    )

    planes = _hyperplanes(dim, n_planes, seed)

    def plane_lit(p):
        return "[" + ", ".join(repr(w) for w in p) + "]"

    bucket_terms = " + ".join(
        f"(CASE WHEN {duck_dot('embedding', plane_lit(p))} > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probe_buckets = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
    WITH b AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding,
             ({bucket_terms}) AS bucket
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id AS q_id, embedding AS q_vec,
             unnest([{probe_buckets}]) AS pbucket
      FROM b WHERE vec_id % 50 = 0
    ),
    cand AS (
      SELECT p.q_id, c.vec_id,
             round({duck_cosine("p.q_vec", "c.embedding")}, 4) AS cos4
      FROM probes p JOIN b c ON c.bucket = p.pbucket AND c.vec_id <> p.q_id
    )
    SELECT q_id, vec_id, cos4, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos4 DESC, vec_id) AS rk
      FROM cand
    ) WHERE rk <= {k}
    """


@query(
    "q28_ann_lsh",
    oracle=_lsh_oracle(),
    doc=(
        "Hyperplane-LSH bucketed ANN top-5 (multiprobe m=1) — the "
        "100 TB path: score only candidates within hamming<=1 of the "
        "query's bucket. HARD oracle since round 3: the seeded "
        "hyperplanes are plan-time constants, so bucket bits and "
        "scores are deterministic and the DuckDB twin reproduces them "
        "bit-exactly (was rows-only in rounds 1-2; recall-vs-exact "
        "remains pytest-checked)."
    ),
)
def q28_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # widen the 1-partition corpus scan (see q26)
    return lsh_topk(queries, cat.widen_small_scan(emb), k=5)
