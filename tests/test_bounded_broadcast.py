"""Eviction-set broadcast gating (ADVICE r6): the semi-stream state
plans are compiled AQE-off, so a broadcast hint there has no runtime
fallback — it must be gated on a driver-known row bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_stream_processing_spark.operators.skew import bounded_broadcast


def _plan(df, keys):
    joined = df.join(keys, "k", "left_anti")
    return joined._jdf.queryExecution().executedPlan().toString()


def test_small_bound_broadcasts_large_bound_does_not(spark):
    left = spark.range(10_000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    keys = spark.range(100).select(F.col("id").alias("k"))
    # reproduce the state plans' compile environment: AQE off (like
    # lazy_local_checkpoint) and no size-based auto-broadcast, so the
    # ONLY broadcast decision left is the explicit hint under test
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        assert "BroadcastHashJoin" in _plan(left, bounded_broadcast(keys, 100))
        # mid tier: too big to broadcast, small enough for a
        # per-partition hash build -> shuffled hash join, no sorts
        mid = _plan(left, bounded_broadcast(keys, 5_000_000))
        assert "BroadcastHashJoin" not in mid
        assert "ShuffledHashJoin" in mid
        # top tier (ADVICE r10): a build side above the SHJ row bound
        # can OOM an executor (SHJ hash tables cannot spill) — the
        # join must be left unhinted so the spillable sort-merge runs
        huge = _plan(left, bounded_broadcast(keys, 500_000_000))
        assert "SortMergeJoin" in huge
        # unknown bound is maximally conservative: spillable SMJ
        unknown = _plan(left, bounded_broadcast(keys, None))
        assert "BroadcastHashJoin" not in unknown
        assert "SortMergeJoin" in unknown
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_pipeline_still_correct_with_gated_eviction(spark):
    """Force the no-hint path (bound above a zero max) through the
    cached equi-join pipeline: output must stay cache-transparent."""
    from distributed_stream_processing_spark.operators.semi_stream_join import (
        run_semi_stream_join,
    )
    from distributed_stream_processing_spark.streaming.cache_controller import (
        AdaptiveCacheController,
    )

    store = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("payload")
    )
    stream = spark.range(6_000).select(
        (F.col("id") % 2_000).alias("k"), F.col("id").alias("seq")
    )
    # window=2 with 4 batches forces real evictions mid-stream
    out = run_semi_stream_join(
        stream, store, "k", ["k", "seq", "payload"], n_batches=4,
        bucket_col="seq",
        controller=AdaptiveCacheController(window=2, min_window=2),
    )
    plain = stream.join(store, "k")
    assert out.count() == stream.count()
    assert out.exceptAll(plain.select("k", "seq", "payload")).count() == 0
