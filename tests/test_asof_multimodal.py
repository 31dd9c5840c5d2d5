"""As-of join semantics + multimodal plumbing tests."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from distributed_stream_processing_spark.operators.asof_join import asof_join
from distributed_stream_processing_spark.sources.multimodal import (
    decode_media,
    frame_sample,
    media_table,
)


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),
            (2, 10, _ts("2024-01-01T12:00:00")),
            (3, 10, _ts("2024-01-01T09:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01T10:30:00")),
            (5, 30, _ts("2024-01-01T10:30:00")),  # key with no right rows
            (6, 10, _ts("2024-01-01T11:00:00")),  # exact tie with right ts
        ],
        "event_id long, key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:30:00"), 100),
            (10, _ts("2024-01-01T11:00:00"), 101),
            (20, _ts("2024-01-01T10:00:00"), 200),
        ],
        "key long, rts timestamp, rid long",
    )
    return left, right


def test_asof_semantics(spark, asof_fixture):
    left, right = asof_fixture
    out = {
        r.event_id: r.rid
        for r in asof_join(left, right, "key", "ts", "rts", ["rid"]).collect()
    }
    assert out == {
        1: 100,  # latest at-or-before 10:00 is 09:30
        2: 101,
        3: None,  # nothing before 09:00
        4: 200,
        5: None,  # key has no right rows
        6: 101,  # inclusive: tie at 11:00 matches
    }


def test_asof_row_count_preserved(spark, asof_fixture):
    left, right = asof_fixture
    assert asof_join(left, right, "key", "ts", "rts", ["rid"]).count() == left.count()


def test_asof_nullable_right_cols_stay_coherent(spark):
    """All right columns must come from the SAME matched right row:
    per-column last(ignorenulls) would backfill a null column from an
    older row (the struct-carry regression)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T12:00:00"))],
        "event_id long, key long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 100, "old"),
            # latest match has a NULL rid — must NOT mix with rid=100
            (10, _ts("2024-01-01T11:00:00"), None, "new"),
        ],
        "key long, rts timestamp, rid long, tag string",
    )
    row = asof_join(left, right, "key", "ts", "rts", ["rid", "tag"]).first()
    assert row.tag == "new" and row.rid is None


def test_media_decode_shapes(spark, sf_smoke):
    decoded = decode_media(media_table(spark, sf_smoke))
    rows = decoded.collect()
    assert len(rows) == 500
    for r in rows[:20]:
        assert len(r.feature) == 8
        if r.media_type.startswith("image/"):
            assert r.width >= 64 and r.height >= 64 and r.n_frames == 1
        else:
            assert r.duration_ms > 0 and r.n_frames >= 1


def test_media_decode_deterministic(spark, sf_smoke):
    a = sorted(map(tuple, decode_media(media_table(spark, sf_smoke)).collect()))
    b = sorted(map(tuple, decode_media(media_table(spark, sf_smoke)).collect()))
    assert a == b


def test_frame_sample_counts(spark, sf_smoke):
    decoded = decode_media(media_table(spark, sf_smoke))
    frames = frame_sample(decoded, every_n=4)
    n_multi = decoded.filter(F.col("n_frames") > 1).count()
    assert frames.select("media_id").distinct().count() == n_multi
    # frame_no stays within bounds and on the sampling grid
    bad = frames.filter(
        (F.col("frame_no") % 4 != 0) | (F.col("frame_no") < 0)
    ).count()
    assert bad == 0


def test_real_decoder_seam_guard(monkeypatch, spark, sf_smoke):
    """The _HAVE_REAL_DECODERS branch must fail LOUDLY (decode is not
    wired) rather than silently emitting stub features when a real
    image library appears in the environment."""
    from distributed_stream_processing_spark.sources import multimodal as mm

    monkeypatch.setattr(mm, "_HAVE_REAL_DECODERS", True)
    with pytest.raises(NotImplementedError):
        mm.decode_media(media_table(spark, sf_smoke))


def test_real_decoder_environment():
    """Skipped in this container (no PIL): when PIL exists, the flag
    must flip and the loud-failure contract above applies for real."""
    pytest.importorskip("PIL")
    from distributed_stream_processing_spark.sources import multimodal as mm

    assert mm._HAVE_REAL_DECODERS is True


def _ppm_bytes(w=4, h=2):
    raster = bytes(range(w * h * 3))
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + raster


def _wav_bytes(n=8000, rate=8000):
    """1-second 16-bit mono WAV written with the stdlib writer."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(
            b"".join(
                struct.pack("<h", int(12000 * math.sin(2 * math.pi * 440 * i / rate)))
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_real_ppm_decode():
    """REAL decode path (no media libs): a binary PPM's header fields
    come back exactly, not as digest pseudo-metadata."""
    from distributed_stream_processing_spark.sources.multimodal import _decode_ppm

    d = _decode_ppm(_ppm_bytes(5, 3))
    assert (d["width"], d["height"], d["n_frames"], d["duration_ms"]) == (5, 3, 1, 0)
    assert len(d["feature"]) == 8
    assert all(-1.0 <= v < 1.0 for v in d["feature"])
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(_ppm_bytes(5, 3)[:-4])


def test_real_wav_decode():
    from distributed_stream_processing_spark.sources.multimodal import _decode_wav

    d = _decode_wav(_wav_bytes(n=8000, rate=8000))
    assert d["duration_ms"] == 1000
    assert d["n_frames"] == 4  # 250 ms windows
    assert d["width"] == 0 and d["height"] == 0
    assert len(d["feature"]) == 8
    # a 440 Hz tone at amplitude 12000/32768 has RMS ~0.259 per chunk
    assert all(abs((v + 0.5) - 0.259) < 0.02 for v in d["feature"])


def test_real_decode_through_spark_pipeline(spark):
    """The mini-format decoders run through the SAME mapInPandas
    plumbing as the stub — mixed real/stub payloads in one frame."""
    from distributed_stream_processing_spark.sources.multimodal import decode_media

    rows = [
        (1, "image/x-portable-pixmap", bytearray(_ppm_bytes(6, 4))),
        (2, "audio/wav", bytearray(_wav_bytes(n=4000, rate=8000))),
        (3, "image/jpeg", bytearray(b"not a real jpeg")),  # stub path
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r.media_id: r for r in decode_media(media).collect()}
    assert (got[1].width, got[1].height) == (6, 4)
    assert got[2].duration_ms == 500 and got[2].n_frames == 2
    assert got[3].width != 0  # stub image metadata still flows
