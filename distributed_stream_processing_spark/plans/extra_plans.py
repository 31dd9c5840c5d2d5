"""As-of join + multimodal pipeline queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.operators.asof_join import asof_join
from distributed_stream_processing_spark.plans.registry import query
from distributed_stream_processing_spark.sources.multimodal import (
    decode_media,
    frame_sample,
    media_table,
    resize_media,
)


@query(
    "q36_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id,
             max(CASE WHEN value >= 50 THEN value END) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT CAST(p.event_id AS BIGINT) AS event_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
           CAST(c.click_event_id AS BIGINT) AS click_event_id,
           CAST(epoch_us(c.click_ts) AS BIGINT) AS click_us,
           c.click_value AS click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    doc=(
        "As-of join (J12 family): each purchase enriched with the "
        "user's latest at-or-before click, via the union-window plan "
        "(one shuffle, no range join). click_value is NULL on ~half "
        "the clicks, pinning the struct-carry property: a null column "
        "in the matched right row must surface as NULL, never as a "
        "stale value from an older row (what per-column "
        "last(ignorenulls) would return). Oracle: DuckDB native ASOF."
    ),
)
def q36_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "ts",
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .agg(
            F.max("event_id").cast("bigint").alias("click_event_id"),
            F.max(F.when(F.col("value") >= 50, F.col("value"))).alias(
                "click_value"
            ),
        )
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_event_id", "click_ts", "click_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "click_event_id",
        F.unix_micros("click_ts").alias("click_us"),
        "click_value",
    )


def _feature_bytes(feature_col) -> F.Column:
    """Serialize the 8-dim feature vector back to its digest bytes as a
    CSV string: f = (b-128)/128 exactly (power-of-two denominator), so
    f*128+128 recovers b bit-exactly. Arrays crash the driver gate's
    canonicalizer (round-1 q37/q38 failure), so every registered query
    emits this string instead of the raw array<float>."""
    return F.concat_ws(
        ",",
        F.transform(
            feature_col, lambda f: (f * 128 + 128).cast("bigint").cast("string")
        ),
    )


# DuckDB twin of _feature_bytes: sha256 hex -> first 8 bytes as CSV.
_DUCK_FEATURE_BYTES = "concat_ws(',', " + ", ".join(
    f"CAST(concat('0x', substr(hx, {2 * i + 1}, 2)) AS BIGINT)" for i in range(8)
) + ") AS feature_bytes"


@query(
    "q37_multimodal_decode",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             ['image/jpeg', 'image/png', 'audio/wav'][(doc_id % 3) + 1] AS media_type,
             sha256(text) AS hx
      FROM documents
    ), b AS (
      SELECT doc_id, media_type,
             CAST(concat('0x', substr(hx, 17, 2)) AS BIGINT) AS b8,
             CAST(concat('0x', substr(hx, 19, 2)) AS BIGINT) AS b9,
             {_DUCK_FEATURE_BYTES}
      FROM m
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           media_type,
           CAST(CASE WHEN media_type LIKE 'image/%' THEN 64 + b8 % 192 ELSE 0 END AS BIGINT) AS width,
           CAST(CASE WHEN media_type LIKE 'image/%' THEN 64 + b9 % 192 ELSE 0 END AS BIGINT) AS height,
           CAST(CASE WHEN media_type LIKE 'image/%' THEN 1 ELSE 1 + b8 % 16 END AS BIGINT) AS n_frames,
           CAST(CASE WHEN media_type LIKE 'image/%' THEN 0 ELSE 250 * (1 + b9 % 40) END AS BIGINT) AS duration_ms,
           feature_bytes
    FROM b
    """,
    doc=(
        "Multimodal pipeline: opaque binary payloads -> mapInPandas "
        "decode/feature-extract (stubbed deterministically) -> typed "
        "metadata + 8-dim feature vectors. The deterministic stub is "
        "sha256-derived, so the oracle reproduces metadata AND features "
        "(serialized to digest bytes — arrays crash the gate)."
    ),
)
def q37_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_media(media_table(spark, sf_dir))
    return decoded.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        "media_type",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.col("duration_ms").cast("bigint").alias("duration_ms"),
        _feature_bytes(F.col("feature")).alias("feature_bytes"),
    )


@query(
    "q38_multimodal_frame_sample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             ['image/jpeg', 'image/png', 'audio/wav'][(doc_id % 3) + 1] AS media_type,
             sha256(text) AS hx
      FROM documents
    ), a AS (
      SELECT doc_id, media_type,
             1 + CAST(concat('0x', substr(hx, 17, 2)) AS BIGINT) % 16 AS n_frames,
             {_DUCK_FEATURE_BYTES}
      FROM m WHERE media_type = 'audio/wav'
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           media_type,
           CAST(unnest(generate_series(0, n_frames - 1, 4)) AS BIGINT) AS frame_no,
           feature_bytes
    FROM a WHERE n_frames > 1
    """,
    doc=(
        "Frame sampling over decoded multi-frame media (JVM-side "
        "explode of a stride sequence); oracle unrolls the same stride "
        "with generate_series over the sha256-derived frame counts."
    ),
)
def q38_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(decode_media(media_table(spark, sf_dir)), every_n=4)
    return frames.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        "media_type",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        _feature_bytes(F.col("feature")).alias("feature_bytes"),
    )


@query(
    "q50_multimodal_metadata",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             ['image/jpeg', 'image/png', 'audio/wav'][(doc_id % 3) + 1] AS media_type,
             CAST(concat('0x', substr(sha256(text), 17, 2)) AS BIGINT) AS b8,
             CAST(concat('0x', substr(sha256(text), 19, 2)) AS BIGINT) AS b9
      FROM documents
    )
    , wh AS (
      SELECT doc_id, media_type,
             CASE WHEN media_type LIKE 'image/%' THEN 64 + b8 % 192 ELSE 0 END AS width,
             CASE WHEN media_type LIKE 'image/%' THEN 64 + b9 % 192 ELSE 0 END AS height,
             CASE WHEN media_type LIKE 'image/%' THEN 1 ELSE 1 + b8 % 16 END AS n_frames,
             CASE WHEN media_type LIKE 'image/%' THEN 0 ELSE 250 * (1 + b9 % 40) END AS duration_ms
      FROM m
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           media_type,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(duration_ms AS BIGINT) AS duration_ms,
           CAST(CASE WHEN media_type LIKE 'image/%'
                THEN greatest(1, CAST(floor(width * least(1.0, 64 / greatest(width, height))) AS INT))
                END AS BIGINT) AS new_width,
           CAST(CASE WHEN media_type LIKE 'image/%'
                THEN greatest(1, CAST(floor(height * least(1.0, 64 / greatest(width, height))) AS INT))
                END AS BIGINT) AS new_height
    FROM wh
    """,
    doc=(
        "Multimodal decode metadata + aspect-preserving resize "
        "geometry (max side 64), oracle-backed: the deterministic "
        "stub derives metadata from sha256(payload) bytes and the "
        "resize plan is pure column arithmetic, both reproduced "
        "exactly by DuckDB — gate-checks the mapInPandas decode "
        "plumbing and resize_media end-to-end (features stay in "
        "rows-only q37; audio rows carry NULL resize columns)."
    ),
)
def q50_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_media(media_table(spark, sf_dir))
    meta = decoded.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        "media_type",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.col("duration_ms").cast("bigint").alias("duration_ms"),
    )
    rs = resize_media(decoded, max_dim=64).select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("new_width").cast("bigint").alias("new_width"),
        F.col("new_height").cast("bigint").alias("new_height"),
    )
    return meta.join(rs, "media_id", "left")
