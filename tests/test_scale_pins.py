"""Structural scale-parallelism pins (VERDICT r10 task 7).

Two r10 scale-killers only ever showed up at 100x data: (a) stress
fixtures written as ONE parquet row group, which Spark cannot split —
24 of 25 scan tasks ran empty while one held every row; (b) a
signature store built from a small scan arriving as one partition and
running candidate generation single-threaded. Both were found by
bench-time profiling; these tests make the structural property a
deterministic pytest failure instead (no timing, no contention
sensitivity): a deliberate de-parallelization — dropping the store
repartition (semi_stream_similarity.build_similarity_store) or the
fixture row_group_size bound (tools/gen_stress_sf1.ROW_GROUP_ROWS) —
fails here.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def test_stress_fixture_files_are_splittable(tmp_path):
    """Every fixture generator must write bounded row groups: a scan
    parallelizes across row groups, never inside one."""
    import numpy as np

    from tools.gen_stress_sf1 import (
        ROW_GROUP_ROWS,
        _splittable,
        gen_documents,
        gen_events,
    )

    ev = os.path.join(tmp_path, "events.parquet")
    gen_events(ev, np.random.RandomState(7), 3 * ROW_GROUP_ROWS)
    assert pq.ParquetFile(ev).metadata.num_row_groups >= 3
    assert _splittable(ev)
    # documents is the generator whose single-row-group form silently
    # single-threaded the 100x store build (r10)
    doc = os.path.join(tmp_path, "documents.parquet")
    gen_documents(doc, np.random.RandomState(7), 2 * ROW_GROUP_ROWS)
    assert pq.ParquetFile(doc).metadata.num_row_groups >= 2
    assert _splittable(doc)
    # the validator must also reject a deliberately unsplittable file
    # (the pre-r10 layout a stale host could still carry)
    bad = os.path.join(tmp_path, "bad.parquet")
    tbl = pq.read_table(doc)
    pq.write_table(tbl, bad, row_group_size=len(tbl))
    assert not _splittable(bad)


def test_similarity_store_build_is_fully_partitioned(spark):
    """build_similarity_store must round-robin the signature store to
    the session's shuffle parallelism: the probe join broadcasts the
    per-batch probe side and streams the store, so the store's own
    partitioning IS the parallelism of candidate generation — the
    pipeline's hottest stage. A store built from a small scan would
    otherwise arrive as 1 partition and run it single-threaded."""
    from fractions import Fraction

    from distributed_stream_processing_spark.operators.semi_stream_similarity import (
        build_similarity_store,
    )

    docs = spark.range(400).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 7) + 3),
            lambda i: F.concat(F.lit("w"), ((F.col("id") + i) % 40).cast("string")),
        ).alias("tokens"),
    )
    store = build_similarity_store(docs, Fraction(3, 4))
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert store.sig_store.rdd.getNumPartitions() == n_part, (
            "signature store lost its build-time repartition — candidate "
            "generation would run at scan width (1 task on small scans)"
        )
    finally:
        store.sig_store.unpersist()
        store.rep_store.unpersist()


def test_loaded_similarity_store_is_fully_partitioned(spark, tmp_path):
    """The save/load round trip must restore the same parallelism
    guarantee — a small saved store must not reload as one partition."""
    from fractions import Fraction

    from distributed_stream_processing_spark.operators.semi_stream_similarity import (
        SemiStreamSimilarityJoin,
        load_similarity_store,
        save_similarity_store,
    )

    docs = spark.range(200).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 5) + 3),
            lambda i: F.concat(F.lit("w"), ((F.col("id") + i) % 30).cast("string")),
        ).alias("tokens"),
    )
    j = SemiStreamSimilarityJoin(stored=docs, threshold=Fraction(3, 4))
    path = str(tmp_path / "store")
    save_similarity_store(j, path)
    j2 = load_similarity_store(spark, path, Fraction(3, 4))
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert j2.sig_store.rdd.getNumPartitions() == n_part
    finally:
        for df in (j.sig_store, j.rep_store, j.cache, j.lru,
                   j2.sig_store, j2.rep_store, j2.cache, j2.lru):
            df.unpersist()
