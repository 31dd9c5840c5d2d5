"""Streaming + semi-stream-join queries.

q33 is the engine's flagship DS-Join parity pipeline: a micro-batched
stream enriched through the adaptive cache. Its oracle is the PLAIN
stream x store join — the cache-transparency invariant from the
reference papers (output must not depend on cache state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.operators.semi_stream_join import (
    run_semi_stream_join,
)
from distributed_stream_processing_spark.plans.registry import query
from distributed_stream_processing_spark.sources.stream import (
    drain_stream,
    read_events_stream,
)


@query(
    "q33_semi_stream_cached_join",
    oracle="""
    SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
           CAST(l.l_partkey AS BIGINT) AS l_partkey,
           p.p_retailprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc=(
        "DS-Join end-to-end: lineitem replayed in 4 micro-batches "
        "through the cached semi-stream join (hit/miss split, batched "
        "store fetch, LRU eviction, adaptive window). Oracle = plain "
        "join: the cache is semantically transparent."
    ),
)
def q33_semi_stream_cached_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributed_stream_processing_spark.sources.fetcher import (
        AutoFetcher,
        parquet_clustered_on,
        path_bytes,
    )
    from distributed_stream_processing_spark.streaming.cache_controller import (
        AdaptiveCacheController,
    )

    cat = Catalog(spark, sf_dir)
    stream = cat.lineitem.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
    )
    store = cat.part.select("p_partkey", "p_retailprice").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    initial_cache = store.filter(F.col("p_retailprice") < 1200.0)
    # live fetch policy (r19, VERDICT r18 task 2): the measured
    # crossover rule picks the miss-fetch shape PER BATCH — the
    # store's physical facts (bytes, key-clustering) come from the
    # parquet footers, the expected miss volume from the controller's
    # last observed batch. At sf scale the store is memory-resident,
    # so warm batches with misses above the threshold keep the scan
    # semi-join; once the cache has warmed and misses collapse below
    # it, the fetch becomes the keyed pushdown (WHERE l_partkey IN
    # (...) reaching the scan as PushedFilters: In(p_partkey, ...)) —
    # the 100 TB-store shape, exercised in the declared path.
    ctl = AdaptiveCacheController()
    store_path = f"{cat.sf_dir}/part.parquet"
    fetcher = AutoFetcher(
        source=store,
        key="l_partkey",
        store_bytes=path_bytes(store_path),
        key_clustered=parquet_clustered_on(store_path, "p_partkey"),
        miss_signal=lambda: (
            ctl.history[-1].n_miss if ctl.history else None
        ),
    )
    return run_semi_stream_join(
        stream_table=stream,
        store=store,
        key="l_partkey",
        out_cols=["l_orderkey", "l_linenumber", "l_partkey", "p_retailprice"],
        n_batches=4,
        bucket_col="l_orderkey",
        initial_cache=initial_cache,
        controller=ctl,
        fetcher=fetcher,
    )


@query(
    "q34_stream_minute_rollup",
    oracle="""
    SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute_epoch,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "A REAL Structured Streaming job: events replayed as a 4-file "
        "stream, tumbling-minute aggregation, complete-mode memory "
        "sink. Must equal the batch rollup (streaming/batch parity)."
    ),
)
def q34_stream_minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = read_events_stream(spark, sf_dir, n_files=4)
    agg = sdf.groupBy(
        F.unix_timestamp(F.date_trunc("minute", F.col("ts"))).alias("minute_epoch"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return drain_stream(agg, f"minute_rollup_{tag}", "complete")


@query(
    "q60_stream_watermark_late_data",
    oracle="""
    WITH stats AS (SELECT max(ts) AS maxts, count(*) AS n FROM events),
    kept AS (
      SELECT ts, value FROM events, stats
      WHERE NOT (event_id % 101 = 7 AND event_id < n // 4)
    ),
    agg AS (
      SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS ws_epoch,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
      FROM kept GROUP BY 1
    )
    SELECT ws_epoch, n_events, value_cents
    FROM agg, stats
    WHERE ws_epoch + 300 <= epoch(maxts) - 600
    """,
    doc=(
        "W3 watermark/late-data END-TO-END (the capability the "
        "reference lacks — it is processing-time only): events "
        "replayed as 4 TIME-ORDERED micro-batches with a deterministic "
        "late subset (first-quarter rows, event_id % 101 == 7) moved "
        "into the last batch, far behind the 10-minute watermark the "
        "on-time batches advanced. Append-mode 5-minute tumbling "
        "windows must (a) DROP the late rows and (b) emit exactly the "
        "windows finalized by the final watermark — both reproduced "
        "in DuckDB from the same arithmetic (late set from event_id, "
        "watermark = max ts - 10 min, emission = window end <= "
        "watermark). Exact integer-cents sums, no float order slack."
    ),
)
def q60_stream_watermark_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from distributed_stream_processing_spark.sources.stream import (
        checkpoint_path,
        dir_bytes,
        stage_time_ordered_late,
        stream_session,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    glob = stage_time_ordered_late(spark, sf_dir, f"wm_late_{tag}")
    # size-derived state width on a cloned session (see stream_session
    # — same per-trigger state-partition overhead argument as q34; the
    # fresh checkpoint each run means no saved state-layout conflict)
    s = stream_session(spark, dir_bytes(os.path.dirname(glob)))
    stream = (
        s.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws_epoch"),
            "n_events",
            "value_cents",
        )
    )
    return drain_stream(
        agg,
        f"wm_late_{tag}",
        "append",
        checkpoint=checkpoint_path(f"ckpt_wm_late_{tag}"),
    )


@query(
    "q55_stream_user_totals_stateful",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 100 AS sum_value
    FROM events GROUP BY user_id
    """,
    doc=(
        "W4 applyInPandasWithState END-TO-END (gate row freed by "
        "retiring q06): events replayed as a 4-file stream drive "
        "per-user keyed running state through a REAL stateful "
        "streaming query (update mode, checkpointed); the LAST emitted "
        "update per user must equal the batch aggregate. The state "
        "accumulates exact scaled integers, so the totals are "
        "bit-reproducible in DuckDB — no float summation-order slack."
    ),
)
def q55_stream_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributed_stream_processing_spark.sources.stream import (
        checkpoint_path,
        stage_stream_files,
    )
    from distributed_stream_processing_spark.streaming.stateful import (
        running_user_stats,
    )

    ev = Catalog(spark, sf_dir).events.select("event_id", "user_id", "value")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = stage_stream_files(ev, f"stateful_totals_{tag}", 4, "event_id")
    # deliberately NOT on the narrow stream_session clone (r19): the
    # applyInPandasWithState stage is Python-worker-bound (per-user
    # pandas state updates), so the session's full width parallelizes
    # the workers — measured 3.5 s at 32 partitions vs 4.0 s at 8
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    updates = drain_stream(
        running_user_stats(stream),
        f"user_totals_{tag}",
        "update",
        checkpoint=checkpoint_path(f"ckpt_user_totals_{tag}"),
    )
    # n_events grows strictly per emission, so max(struct) = final state
    return (
        updates.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("m.n_events").cast("bigint").alias("n_events"),
            F.col("m.sum_value").alias("sum_value"),
        )
    )
