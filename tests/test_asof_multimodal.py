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
