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
    resize_geometry,
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


# DuckDB twin of media_table + decode_media: _synth_payload
# (sources/multimodal.py) is pure doc_id arithmetic with dyadic-exact
# decoded features, so the oracle reproduces the REAL decode results —
# header dims, duration, per-chunk band-mean / RMS features — without
# touching any payload bytes:
#   k = doc_id % 4 -> {0: PPM, 1: PNG, 2: WAV, 3: JPEG}
#   PPM dims  w = 4*(2+id%17), h = 2*(1+id%5)
#   PNG dims  w = 8*(3+id%13), h = 2*(2+id%7)
#   JPEG dims w = 8*(2+id%9),  h = 16*(1+id%4)
#   WAV       duration_ms = 250*(1+id%8), n_frames = 1+id%8
#   PPM/PNG feature bytes [a x4, b x4], a = id%256, b = (id*7)%256
#   JPEG feature bytes    [a x4, b x4], a = 2*(id%128), b = 2*((id*7)%128)
#     (even levels + flat quant -> jpeg.py's bit-exact contract)
#   audio feature bytes  [m1+64 x4, m2+64 x4], m1 = id%97, m2 = (id*5)%97
#
# CORRUPT rows (doc_id % 13 == 7, r14): media_table plants recognized-
# magic-but-malformed payloads; _decode_one routes them to the pseudo-
# decode with decode_ok=false. The payload bytes are ASCII + escapable
# magic, so the oracle REBUILDS them as a BLOB literal and recomputes
# the pseudo features from sha256(lower(hex(payload))) — the exact
# digest transcript _fake_decode hashes. Pseudo-decode contract:
#   digest h = sha256 of the payload's lowercase hex; b_i = h[i]
#   feature bytes = h[0..7]; image: w = 64+h[8]%192, ht = 64+h[9]%192,
#   n_frames 1, dur 0; audio: w = ht = 0, n_frames = 1+h[8]%16,
#   dur = 250*(1+h[9]%40)


def _duck_digest_byte(i: int) -> str:
    """SQL for byte ``i`` of the corrupt row's sha256 digest (hex pair
    of the VARCHAR digest -> INT via strpos; DuckDB 1.0 has no
    hex-string-to-int cast)."""
    return (
        f"(16*(strpos('0123456789abcdef', substr(sha,{2 * i + 1},1))-1)"
        f" + strpos('0123456789abcdef', substr(sha,{2 * i + 2},1))-1)"
    )


_DUCK_FAKE_FEATURE = "concat_ws(',', {})".format(
    ", ".join(_duck_digest_byte(i) for i in range(8))
)
_B8, _B9 = _duck_digest_byte(8), _duck_digest_byte(9)

_DUCK_MEDIA_CTE = f"""
    m0 AS (
      SELECT doc_id, doc_id % 4 AS k, (doc_id % 13 = 7) AS bad,
             CASE WHEN doc_id % 13 = 7 THEN
               sha256(lower(hex(CASE doc_id % 4
                 WHEN 0 THEN ('P6 corrupt ' || doc_id)::BLOB
                 WHEN 1 THEN ('\\x89PNG\\x0D\\x0A\\x1A\\x0Acorrupt ' || doc_id)::BLOB
                 WHEN 2 THEN ('RIFFxxxxWAVEcorrupt ' || doc_id)::BLOB
                 ELSE ('\\xFF\\xD8corrupt ' || doc_id)::BLOB END)))
             END AS sha
      FROM documents
    ),
    m AS (
      SELECT doc_id, k,
             CASE k WHEN 0 THEN 'image/x-portable-pixmap'
                  WHEN 1 THEN 'image/png'
                  WHEN 3 THEN 'image/jpeg' ELSE 'audio/wav' END AS media_type,
             CASE WHEN bad THEN
                  CASE WHEN k <> 2 THEN 64 + {_B8} % 192 ELSE 0 END
                  ELSE CASE k WHEN 0 THEN 4 * (2 + doc_id % 17)
                       WHEN 1 THEN 8 * (3 + doc_id % 13)
                       WHEN 3 THEN 8 * (2 + doc_id % 9) ELSE 0 END
             END AS width,
             CASE WHEN bad THEN
                  CASE WHEN k <> 2 THEN 64 + {_B9} % 192 ELSE 0 END
                  ELSE CASE k WHEN 0 THEN 2 * (1 + doc_id % 5)
                       WHEN 1 THEN 2 * (2 + doc_id % 7)
                       WHEN 3 THEN 16 * (1 + doc_id % 4) ELSE 0 END
             END AS height,
             CASE WHEN bad THEN
                  CASE WHEN k = 2 THEN 1 + {_B8} % 16 ELSE 1 END
                  ELSE CASE WHEN k = 2 THEN 1 + doc_id % 8 ELSE 1 END
             END AS n_frames,
             CASE WHEN bad THEN
                  CASE WHEN k = 2 THEN 250 * (1 + {_B9} % 40) ELSE 0 END
                  ELSE CASE WHEN k = 2 THEN 250 * (1 + doc_id % 8) ELSE 0 END
             END AS duration_ms,
             CASE WHEN bad THEN {_DUCK_FAKE_FEATURE}
                  ELSE CASE k WHEN 2
                  THEN concat_ws(',', (doc_id % 97) + 64, (doc_id % 97) + 64,
                                 (doc_id % 97) + 64, (doc_id % 97) + 64,
                                 ((doc_id * 5) % 97) + 64, ((doc_id * 5) % 97) + 64,
                                 ((doc_id * 5) % 97) + 64, ((doc_id * 5) % 97) + 64)
                  WHEN 3
                  THEN concat_ws(',', 2 * (doc_id % 128), 2 * (doc_id % 128),
                                 2 * (doc_id % 128), 2 * (doc_id % 128),
                                 2 * ((doc_id * 7) % 128), 2 * ((doc_id * 7) % 128),
                                 2 * ((doc_id * 7) % 128), 2 * ((doc_id * 7) % 128))
                  ELSE concat_ws(',', doc_id % 256, doc_id % 256,
                                 doc_id % 256, doc_id % 256,
                                 (doc_id * 7) % 256, (doc_id * 7) % 256,
                                 (doc_id * 7) % 256, (doc_id * 7) % 256)
                  END
             END AS feature_bytes,
             NOT bad AS decode_ok
      FROM m0
    )
"""


@query(
    "q37_multimodal_decode",
    oracle=f"""
    WITH {_DUCK_MEDIA_CTE}
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           media_type,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(duration_ms AS BIGINT) AS duration_ms,
           feature_bytes,
           decode_ok
    FROM m
    """,
    doc=(
        "Multimodal pipeline: REAL encoded binary payloads (PPM/PNG/"
        "JPEG/WAV) -> mapInPandas real decode (header parse, PNG "
        "inflate+unfilter, JPEG Huffman+IDCT, PCM RMS) -> typed "
        "metadata + 8-dim features. The "
        "synthesized pixel/sample content yields dyadic-exact features, "
        "so the oracle reproduces the decode results from doc_id "
        "arithmetic alone (serialized to bytes — arrays crash the gate). "
        "The fixture seeds a deterministic corrupt minority (doc_id % "
        "13 == 7, recognized magic + malformed body): those rows must "
        "surface decode_ok=FALSE with the sha256 pseudo features, which "
        "the oracle recomputes from the rebuilt payload BLOB — the "
        "corrupt-payload guard is hash-gated on the card, both "
        "directions (r14; a guard regression that misroutes good rows "
        "OR fails corrupt rows breaks the hash)."
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
        "decode_ok",
    )


@query(
    "q38_multimodal_frame_sample",
    oracle=f"""
    WITH {_DUCK_MEDIA_CTE}
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           media_type,
           CAST(unnest(generate_series(0, n_frames - 1, 4)) AS BIGINT) AS frame_no,
           feature_bytes
    FROM m WHERE n_frames > 1
    """,
    doc=(
        "Frame sampling over decoded multi-frame media (JVM-side "
        "explode of a stride sequence); oracle unrolls the same stride "
        "with generate_series over the real WAV frame counts "
        "(1 + doc_id % 8 analysis windows of 250 ms)."
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
    oracle=f"""
    WITH {_DUCK_MEDIA_CTE}
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
                END AS BIGINT) AS new_height,
           decode_ok
    FROM m
    """,
    doc=(
        "Multimodal decode metadata + aspect-preserving resize "
        "geometry (max side 64), oracle-backed: real PPM/PNG header "
        "dims and WAV durations follow exact doc_id formulas and the "
        "resize plan is pure column arithmetic, both reproduced "
        "exactly by DuckDB — gate-checks the mapInPandas decode "
        "plumbing and resize_media end-to-end (features stay in "
        "rows-only q37; audio rows carry NULL resize columns)."
    ),
)
def q50_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one decode pass (r18 optimization round): the old shape selected
    # meta and resize_media branches off the same UNCACHED decoded
    # DataFrame and joined them back on media_id — the synth+decode
    # mapInPandas subtree (the query's whole cost) executed twice,
    # plus a join exchange. resize_media's geometry is pure column
    # arithmetic (resize_geometry — the shared expressions), so
    # compute it inline gated on the SAME image/% predicate it
    # filtered by (non-image rows got NULLs from the left join; the
    # when() reproduces them). q50 wall 9.5 s -> the single-decode
    # cost; plan diff: 2 MapInPandas chains -> 1, join Exchange ->
    # none. resize_media's DataFrame form stays the public operator
    # (equivalence pinned by test_resize_media_matches_q50_geometry).
    decoded = decode_media(media_table(spark, sf_dir))
    new_w, new_h = resize_geometry(max_dim=64)
    is_image = F.col("media_type").startswith("image/")
    return decoded.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        "media_type",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.col("duration_ms").cast("bigint").alias("duration_ms"),
        F.when(is_image, new_w).cast("bigint").alias("new_width"),
        F.when(is_image, new_h).cast("bigint").alias("new_height"),
        "decode_ok",
    )
