"""Streaming sources: deterministic file-stream replay of the test
tables (the engine's substitute for the reference's 4-16 socket feeds,
DS-Join streaming.scala:139-156 — file sources give reproducible
micro-batches; kafka/socket slot in via the same readStream API).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_stream_processing_spark.catalog import Catalog

_SCRATCH = "/root/repo/.tmp/streams"


def checkpoint_path(name: str) -> str:
    """Canonical scratch location for a stream's checkpoint dir —
    callers must not duplicate the _SCRATCH literal (ADVICE r12: the
    q60 plan hard-coded it and the two could drift apart)."""
    return f"{_SCRATCH}/{name}"


def stage_stream_files(
    df: DataFrame, name: str, n_files: int, order_col: str
) -> str:
    """Write ``df`` as ``n_files`` parquet files so a file-source
    stream with maxFilesPerTrigger=1 replays it in n deterministic
    micro-batches (bucketed by pmod(order_col, n))."""
    path = f"{_SCRATCH}/{name}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    (
        df.withColumn("_b", F.pmod(F.col(order_col), F.lit(n_files)))
        .repartition(n_files, "_b")
        .drop("_b")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def stage_time_ordered_late(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_files: int = 4,
    late_mod: int = 101,
    late_rem: int = 7,
) -> str:
    """Stage events as ``n_files`` TIME-ORDERED parquet file groups
    (event_id order == ts order in the fixture), with a deterministic
    LATE subset — first-quarter rows with
    ``event_id % late_mod == late_rem`` — moved into the LAST file:
    the replay shape watermark semantics need (on-time batches advance
    the watermark, then genuinely late rows arrive behind it).

    The file source orders new files by MODIFICATION TIME, not path,
    so each group's files get strictly increasing mtimes; returns the
    glob to readStream."""
    # cache for the staging loop: the count + n_files filtered writes
    # otherwise re-scan the events table once each (n_files+1 scans —
    # the build-shape lesson from build_kv_index applies to staging
    # too)
    ev = Catalog(spark, sf_dir).events.select("event_id", "ts", "value").cache()
    try:
        n = ev.count()
        q = max(1, n // n_files)
        path = f"{_SCRATCH}/{name}"
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        late = (F.col("event_id") % late_mod == late_rem) & (
            F.col("event_id") < q
        )
        bucket = F.least(F.lit(n_files - 1), F.floor(F.col("event_id") / q))
        for k in range(n_files):
            part = ev.filter((bucket == k) & ~late)
            if k == n_files - 1:
                part = part.unionByName(ev.filter(late))
            part.coalesce(1).write.mode("overwrite").parquet(f"{path}/f{k}")
    finally:
        ev.unpersist()
    base = time.time() - 10 * n_files
    for k in range(n_files):
        d = f"{path}/f{k}"
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (base + 10 * k, base + 10 * k))
    return f"{path}/f*"


def stream_session(spark: SparkSession, staged_bytes: int) -> SparkSession:
    """CLONED session for a bounded file-replay stream, with the
    state/shuffle width derived from the input size instead of the
    session's batch width (r19, guide §2.1 + VERDICT r18 task 4).

    A streaming aggregation's state store is partitioned by
    ``spark.sql.shuffle.partitions`` at query start, and every
    micro-batch pays a per-partition task + state-commit cost: at the
    bench's replay sizes (a few MB per trigger) 32 state partitions
    are pure overhead (measured q34 stream 2.5 s -> 1.44 s at 8).
    Width = input_bytes/16 MB, floored at min(8, session width) so
    tiny fixtures keep multicore aggregation, capped at the session
    width so a cluster-scale input uses the cluster's width.

    ``newSession()`` shares the SparkContext but isolates the SQL
    conf, so the override can't leak into concurrently planned batch
    queries (the ADVICE r18 concern about session-global mutation)."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(
        min(8, n_part), min(n_part, -(-staged_bytes // (16 << 20)))
    )
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", str(parts))
    return s


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def read_events_stream(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Structured-Streaming view of the events table (ts normalized to
    a proper timestamp), staged as a deterministic file stream. The
    stream runs on a size-width cloned session (stream_session)."""
    ev = Catalog(spark, sf_dir).events
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = stage_stream_files(ev, f"events_{tag}", n_files, "event_id")
    schema = ev.schema
    s = stream_session(spark, dir_bytes(path))
    return (
        s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def read_live_stream(
    spark: SparkSession,
    source: str = "rate",
    host: str = "localhost",
    port: int = 9999,
    rows_per_second: int = 100,
) -> DataFrame:
    """Live-source twin of read_events_stream: the same
    (event_id, ts, value) shape from a real readStream source, for
    parity with the reference's socket feeds (DS-Join
    streaming.scala:139-156, socketTextStream per feed).

    ``source="socket"`` parses `event_id,value` lines from a TCP feed
    (arrival time becomes ts, like the reference's receiver clock);
    ``source="rate"`` uses Spark's built-in load generator (events at
    ``rows_per_second``, value derived deterministically) — the
    no-network smoke path. Downstream plans are source-agnostic: any
    of these or the file replay plug into the same transformations.
    """
    if source == "socket":
        lines = (
            spark.readStream.format("socket")
            .option("host", host)
            .option("port", port)
            .option("includeTimestamp", "true")
            .load()
        )
        parts = F.split(F.col("value"), ",")
        return lines.select(
            parts.getItem(0).cast("bigint").alias("event_id"),
            F.col("timestamp").alias("ts"),
            parts.getItem(1).cast("double").alias("value"),
        )
    if source == "rate":
        rows = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
        return rows.select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            F.pmod(F.col("value") * 37 + 11, F.lit(49000)).cast("double")
            .alias("value"),
        )
    raise ValueError(f"unknown live source {source!r}")


def drain_stream(
    sdf: DataFrame,
    query_name: str,
    output_mode: str,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink and
    return the final result as a batch DataFrame. Stateful operators
    (applyInPandasWithState) require a ``checkpoint`` location.

    ``available_now=True`` (default) runs with Trigger.AvailableNow:
    the source plans ALL currently-available input up front (still
    honoring per-trigger read limits like maxFilesPerTrigger, so the
    micro-batch sequence is identical) and the query terminates itself
    when that snapshot is drained. Per-trigger polling/listing waits —
    which made the q34 bench number measure trigger pacing instead of
    engine work, swinging 2x across hosts with sub-0.4 s spreads
    (VERDICT r10 task 4) — never happen. Pass ``available_now=False``
    for unbounded sources that don't support the trigger (socket,
    rate), drained via processAllAvailable + stop instead."""
    spark = sdf.sparkSession
    w = sdf.writeStream.outputMode(output_mode).format("memory").queryName(
        query_name
    )
    if checkpoint is not None:
        shutil.rmtree(checkpoint, ignore_errors=True)
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    try:
        if available_now:
            q.awaitTermination()
        else:
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
