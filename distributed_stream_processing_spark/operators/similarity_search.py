"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full corpus, ranked per query. At 100 TB the corpus
side stays partition-parallel with no shuffle: broadcast queries,
score, then a per-query top-k via ranking window on (query, score).

Scale path: LSH bucketing by random-hyperplane sign bits (cosine
LSH) — probe only matching buckets, multi-probe for recall. An IVF
variant (k-means coarse quantizer) would slot in the same shape; the
hyperplane variant keeps everything closed-form and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from distributed_stream_processing_spark.functions.vectors import cosine


def _scored(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    q = queries.select(
        F.col("vec_id").cast("bigint").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = corpus.select(
        F.col("vec_id").cast("bigint").alias("vec_id"), F.col("embedding").alias("c_vec")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("cos4", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k by (rounded) cosine per query, vec_id tie-break."""
    w = W.partitionBy("q_id").orderBy(F.col("cos4").desc(), F.col("vec_id"))
    return (
        _scored(queries, corpus)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos4", F.col("rk").cast("bigint").alias("rk"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _bucket(vec, planes: list[list[float]]):
    """Sign-bit bucket id of a vector against fixed hyperplanes."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("bigint"), i),
        ).otherwise(F.lit(0).cast("bigint"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in hyperplane
    buckets within hamming distance ``multiprobe`` of the query's
    bucket. Same output contract as brute_force_topk; recall trades
    against the scanned fraction (~C(n_planes,<=m)/2^n_planes).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    probe_masks = [0]
    if multiprobe >= 1:
        probe_masks += [1 << i for i in range(n_planes)]
    if multiprobe >= 2:
        probe_masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    q = queries.select(
        F.col("vec_id").cast("bigint").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.explode(
            F.array(
                *[
                    _bucket(F.col("embedding"), planes).bitwiseXOR(F.lit(m))
                    for m in probe_masks
                ]
            )
        ).alias("bucket"),
    )
    c = corpus.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("embedding").alias("c_vec"),
        _bucket(F.col("embedding"), planes).alias("bucket"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos4").desc(), F.col("vec_id"))
    return (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .dropDuplicates(["q_id", "vec_id"])
        .withColumn("cos4", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos4", F.col("rk").cast("bigint").alias("rk"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (pyspark.ml), corpus bucketed
    by nearest centroid, queries scored only against their ``n_probe``
    nearest centroids' buckets. Same output contract as
    brute_force_topk; recall < 1 (single-digit % of corpus scanned).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        F.col("vec_id"), array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(train)
    assigned = model.transform(train).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("prediction").alias("bucket"),
    )
    c = corpus.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("embedding").alias("c_vec"),
    ).join(assigned, "vec_id")

    # nearest n_probe centroids per query, computed driver-side (the
    # centroid table is tiny) and broadcast via the exploded probe rows
    import numpy as np

    centroids = [np.asarray(ctr) for ctr in model.clusterCenters()]
    qrows = queries.select("vec_id", "embedding").collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r.embedding, dtype=np.float64)
        dists = [float(np.linalg.norm(qv - ctr)) for ctr in centroids]
        for b in np.argsort(dists)[:n_probe]:
            probe_rows.append((int(r.vec_id), int(b)))
    spark = queries.sparkSession
    probes = spark.createDataFrame(probe_rows, "q_id long, bucket int")
    q = queries.select(
        F.col("vec_id").cast("bigint").alias("q_id"),
        F.col("embedding").alias("q_vec"),
    ).join(probes, "q_id")

    w = W.partitionBy("q_id").orderBy(F.col("cos4").desc(), F.col("vec_id"))
    return (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("cos4", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos4", F.col("rk").cast("bigint").alias("rk"))
    )


def embedding_near_pairs(vectors: DataFrame, min_cos4: float) -> DataFrame:
    """All pairs with rounded cosine >= threshold (exact, O(n^2) scan)."""
    a = vectors.select(
        F.col("vec_id").cast("bigint").alias("a_id"), F.col("embedding").alias("a_vec")
    )
    b = vectors.select(
        F.col("vec_id").cast("bigint").alias("b_id"), F.col("embedding").alias("b_vec")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos4", F.round(cosine(F.col("a_vec"), F.col("b_vec")), 4))
        .filter(F.col("cos4") >= min_cos4)
        .select("a_id", "b_id", "cos4")
    )
