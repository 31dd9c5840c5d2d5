"""Interval-algebra + sliding-window queries (O6, W2 coverage)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.operators.interval import (
    interval_overlap_join,
    merge_intervals,
)
from distributed_stream_processing_spark.plans.registry import query


def _error_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[-5min, +5min] second-epoch intervals around error events."""
    ev = Catalog(spark, sf_dir).events
    sec = F.col("ts").cast("long")
    return ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        (sec - 300).alias("start"),
        (sec + 300).alias("end"),
    )


@query(
    "q39_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(epoch_us(ts) // 1000000 - 300 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000 + 300 AS BIGINT) AS e
      FROM events WHERE event_type = 'error'
    ),
    grouped AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_grp
      FROM iv
    ),
    gid AS (
      SELECT user_id, s, e,
             sum(new_grp) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS grp
      FROM grouped
    )
    SELECT user_id, CAST(min(s) AS BIGINT) AS start, CAST(max(e) AS BIGINT) AS "end",
           CAST(count(*) AS BIGINT) AS n_merged
    FROM gid GROUP BY user_id, grp
    """,
    doc=(
        "Interval coalescing (sortAndMergeIntervals parity, "
        "QueryEngine.java:506-609): +/-5min windows around error "
        "events merged per user via the running-max-end window plan."
    ),
)
def q39_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_intervals(_error_intervals(spark, sf_dir), "user_id")


@query(
    "q40_interval_overlap_join",
    oracle="""
    WITH err AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(epoch_us(ts) // 1000000 - 300 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000 + 300 AS BIGINT) AS e
      FROM events WHERE event_type = 'error'
    ), pur AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(epoch_us(ts) // 1000000 - 300 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000 + 300 AS BIGINT) AS e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id,
           CAST(count(*) AS BIGINT) AS n_overlaps
    FROM err a JOIN pur b ON a.user_id = b.user_id
    WHERE a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id
    """,
    doc=(
        "Interval overlap join (two-pointer intersect parity, "
        "QueryEngine.java:191-217): error windows x purchase windows "
        "per user, counted."
    ),
)
def q40_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    sec = F.col("ts").cast("long")

    def iv(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select(
            F.col("user_id").cast("bigint").alias("user_id"),
            (sec - 300).alias("start"),
            (sec + 300).alias("end"),
        )

    return (
        interval_overlap_join(iv("error"), iv("purchase"), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )


@query(
    "q41_sliding_window_rollup",
    oracle="""
    SELECT CAST(ws AS BIGINT) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (
      SELECT (epoch_us(ts) // 1000000 // 300) * 300 - k * 300 AS ws,
             event_type, value
      FROM events, unnest([0, 1]) AS t(k)
    )
    GROUP BY 1, 2
    """,
    doc=(
        "Sliding-window rollup (W2: stream.window parity): 10-minute "
        "windows sliding every 5 — each event lands in exactly two "
        "windows; F.window handles assignment JVM-side."
    ),
)
def q41_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q42_json_props_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS distinct_k
    FROM events GROUP BY event_type
    """,
    doc=(
        "Schema-on-read JSON (S5 parity, sqlContext.read.json -> "
        "from_json): parse the props JSON payload column, extract and "
        "aggregate a typed field."
    ),
)
def q42_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )
