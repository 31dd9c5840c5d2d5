"""W3 (watermark/late data — a capability the reference lacks) and
X6 admission-filter tests."""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from distributed_stream_processing_spark.operators.semi_stream_join import (
    SemiStreamJoin,
)
from distributed_stream_processing_spark.streaming.cache_controller import (
    AdaptiveCacheController,
)

SCRATCH = "/root/repo/.tmp/wmtest"


def test_watermark_drops_late_rows(spark):
    """Append-mode windowed agg with a watermark must exclude a row
    arriving far behind the watermark (late-data semantics the
    reference never had — SURVEY §2.8 W3)."""
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)

    def write_batch(name: str, rows):
        spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{SCRATCH}/{name}")

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    # batch 1: on-time rows advancing the watermark to 12:59-10min
    write_batch("b1", [(t("2024-01-01T12:00:30"), 1), (t("2024-01-01T12:59:00"), 1)])

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{SCRATCH}/b*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.sum("v").alias("total"))
        .select(F.col("w.start").alias("ws"), "total")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", f"{SCRATCH}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one very late row (11:00, watermark already 12:49)
        # and one on-time row pushing the watermark past 12:59
        write_batch(
            "b2", [(t("2024-01-01T11:00:00"), 100), (t("2024-01-01T13:30:00"), 1)]
        )
        # file sources need a new file inside a watched dir; re-point:
        time.sleep(0.2)
        q.processAllAvailable()
        write_batch("b3", [(t("2024-01-01T14:00:00"), 1)])
        time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.ws: r.total for r in spark.table("wm_out").collect()}
    # the 12:00 window finalized WITHOUT the late 11:00 row ever counting
    assert out.get(t("2024-01-01T12:00:00")) == 1
    assert t("2024-01-01T11:00:00") not in out  # late row dropped


def test_admission_filter_keeps_hot_keys_out(spark):
    """X6 parity: keys recurring in >= admit_below_freq batches are
    never admitted to the cache, but results stay correct."""
    store = (
        spark.range(0, 200)
        .withColumnRenamed("id", "key")
        .withColumn("payload", F.col("key") * 10)
    )
    j = SemiStreamJoin(
        store=store,
        key="key",
        controller=AdaptiveCacheController(window=50),
        admit_below_freq=2,
    )
    hot = spark.range(0, 5).withColumnRenamed("id", "key")  # every batch
    outs = []
    for b in range(4):
        cold = (
            spark.range(50 + 20 * b, 60 + 20 * b).withColumnRenamed("id", "key")
        )
        outs.append(j.process_batch(hot.unionByName(cold), b))
    cached = {r.key for r in j.cache.select("key").collect()}
    assert cached.isdisjoint({0, 1, 2, 3, 4})  # hot keys never admitted
    assert len(cached) > 0  # cold keys are
    # correctness unaffected: every batch fully enriched
    assert outs[-1].count() == 15
    assert outs[-1].filter(F.col("payload").isNull()).count() == 0
