"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract (schema, partition-preserving mapInPandas
decode, Arrow batch shape, deterministic feature vectors) is real and
tested; the actual byte decoding is STUBBED because the image/audio
libraries are not in this container:

* with PIL/librosa importable, ``decode_media`` would decode
  real payloads — that branch raises NotImplementedError until the
  dependencies exist;
* without them it derives deterministic pseudo-metadata and features
  from a stable hash of the payload, so the full pipeline (decode ->
  feature extract -> frame sample -> ANN over features) is executable
  and reproducible in tests.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog

MEDIA_TYPES = ("image/jpeg", "image/png", "audio/wav")

DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "n_frames int, duration_ms int, feature array<float>"
)

_HAVE_REAL_DECODERS = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_REAL_DECODERS = True
except ImportError:
    pass


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque-binary media table from the documents
    corpus: payload bytes are the utf-8 text (stands in for encoded
    image/audio bytes), media_type cycles deterministically."""
    docs = Catalog(spark, sf_dir).documents
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"), F.col("n_chars").alias("payload_hint")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic pseudo-decode: metadata + an 8-dim feature vector
    derived from the payload digest (reproducible everywhere)."""
    h = hashlib.sha256(payload).digest()
    # exact binary values (b-128)/128 — power-of-two denominator, so
    # feature*128+128 recovers the digest byte exactly (q37's oracle)
    feat = [(b - 128) / 128.0 for b in h[:8]]
    if media_type.startswith("image/"):
        return {
            "width": 64 + h[8] % 192,
            "height": 64 + h[9] % 192,
            "n_frames": 1,
            "duration_ms": 0,
            "feature": feat,
        }
    return {
        "width": 0,
        "height": 0,
        "n_frames": 1 + h[8] % 16,
        "duration_ms": 250 * (1 + h[9] % 40),
        "feature": feat,
    }


def decode_media(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract each payload (mapInPandas, Arrow
    batches). Real decoding requires PIL/librosa — stubbed here."""
    if _HAVE_REAL_DECODERS:  # pragma: no cover
        raise NotImplementedError(
            "real media decoding not wired in this container; "
            "plug PIL/librosa decode into _fake_decode's slot"
        )

    def gen(batches):
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                d = _fake_decode(bytes(row["payload"]), row["media_type"])
                recs.append(
                    {"media_id": row["media_id"], "media_type": row["media_type"], **d}
                )
            yield pd.DataFrame(recs)

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def resize_media(decoded: DataFrame, max_dim: int = 64) -> DataFrame:
    """Aspect-preserving resize plan for image media: integer target
    dimensions such that max(new_w, new_h) == max_dim (never
    upscaled). The geometry is pure column arithmetic (JVM-side,
    SQL-reproducible — folded into q50's gate); the pixel resampling
    itself belongs in the decode UDF slot with PIL, which this
    container lacks (same stub contract as decode_media)."""
    longest = F.greatest("width", "height")
    scale = F.least(F.lit(1.0), F.lit(max_dim) / longest)
    return decoded.filter(F.col("media_type").startswith("image/")).select(
        "media_id",
        "media_type",
        "width",
        "height",
        # floor, minimum 1: a 1xN strip keeps at least one pixel
        F.greatest(F.lit(1), F.floor(F.col("width") * scale).cast("int")).alias(
            "new_width"
        ),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale).cast("int")).alias(
            "new_height"
        ),
    )


def frame_sample(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Sample every n-th frame of multi-frame media (video/audio):
    explode frame indexes JVM-side — no Python in the explode path."""
    return decoded.filter(F.col("n_frames") > 1).select(
        "media_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
        "feature",
    )
