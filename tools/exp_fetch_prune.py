"""[HISTORICAL — written against the r13 v3 (g,seg,sig)-keyed layout;
the measurements below justified the r14 sk/kv redesign. Not rerunnable
as-is on the v4 layout.]

Round-14 experiment: what does the q48 per-batch miss-fetch cost,
and can a bucket filter prune the cached signature-store scan?

Measures, against the saved 100x store (.stressdata/stress100x):
  1. probe/missed key counts of a steady batch (the k that decides
     whether bucket pruning can work at all);
  2. the raw full-store LeftSemi fetch time (the 8.6 s floor);
  3. cached-batch stats pruning: filter on a bucket column with
     In / InSet / OR-of-ranges predicates over a bkt-sorted cached
     store, timed vs the full scan.

Scratch tool — numbers feed the r14 design, kept for reproducibility.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from distributed_stream_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    from fractions import Fraction

    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )

    spark = get_spark("exp-fetch-prune")
    d100 = os.path.join(REPO, ".stressdata", "stress100x")
    t = Fraction(3, 4)
    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    base = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))
    probes = [
        base.filter((F.col("id") % 10 < 3) & (F.col("id") % 1000 == k))
        for k in (0, 1, 501)
    ]
    t0 = time.monotonic()
    j = sss.load_similarity_store(spark, os.path.join(d100, "q48store"), t)
    n_store = j.sig_store.count()
    print(f"store load: {time.monotonic()-t0:.1f}s rows={n_store}", flush=True)

    # --- batch 0 primes the cache; batch 1 is the steady batch -----
    j.process_batch(probes[0], 0).write.mode("overwrite").format("noop").save()
    j.flush_attribution()

    # steady batch, instrumented by hand (same joins as process_batch)
    probe = j._probe_rows(probes[1]).cache()
    t0 = time.monotonic()
    n_probe_rows = probe.count()
    print(f"probe rows: {n_probe_rows} ({time.monotonic()-t0:.1f}s)", flush=True)
    probe_keys = probe.select(*sss._KEY).distinct().cache()
    n_keys = probe_keys.count()
    missed = probe_keys.join(
        F.broadcast(j.lru.select(*sss._KEY)), sss._KEY, "left_anti"
    ).cache()
    n_miss = missed.count()
    print(f"probe keys: {n_keys}  missed: {n_miss}", flush=True)

    # raw fetch cost (the thing we're trying to kill)
    for _ in range(2):
        t0 = time.monotonic()
        nf = j.sig_store.join(F.broadcast(missed), sss._KEY, "left_semi").count()
        print(f"full-scan fetch: {time.monotonic()-t0:.2f}s rows={nf}", flush=True)

    # how many of the missed keys even EXIST in the store?
    t0 = time.monotonic()
    n_present = (
        j.sig_store.select(*sss._KEY)
        .join(F.broadcast(missed), sss._KEY, "left_semi")
        .select(*sss._KEY)
        .distinct()
        .count()
    )
    print(
        f"missed keys present in store: {n_present} "
        f"({time.monotonic()-t0:.2f}s)",
        flush=True,
    )

    # --- bucket-filter pruning experiment ---------------------------
    for n_bkt, batch_rows in ((4096, 10000), (16384, 4096), (65536, 1024)):
        spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", str(batch_rows))
        bkt = F.pmod(F.xxhash64("g", "seg", "sig"), F.lit(n_bkt)).cast("int")
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        store_b = (
            j.sig_store.withColumn("bkt", bkt)
            .repartition(n_part, "bkt")
            .sortWithinPartitions("bkt")
            .cache()
        )
        t0 = time.monotonic()
        store_b.count()
        print(
            f"\nN_BKT={n_bkt} batchSize={batch_rows} "
            f"(re-cluster {time.monotonic()-t0:.1f}s)",
            flush=True,
        )
        # the batch's bucket set, driver-side
        t0 = time.monotonic()
        bkts = sorted(
            r[0]
            for r in missed.select(
                F.pmod(F.xxhash64("g", "seg", "sig"), F.lit(n_bkt))
                .cast("int")
                .alias("bkt")
            )
            .distinct()
            .collect()
        )
        print(
            f"  bucket set: {len(bkts)}/{n_bkt} "
            f"({time.monotonic()-t0:.2f}s driver)",
            flush=True,
        )
        # full scan baseline on this layout
        t0 = time.monotonic()
        store_b.join(F.broadcast(missed), sss._KEY, "left_semi").count()
        print(f"  full semi scan: {time.monotonic()-t0:.2f}s", flush=True)
        # isin filter (big list -> InSet)
        t0 = time.monotonic()
        nf = (
            store_b.filter(F.col("bkt").isin(bkts))
            .join(F.broadcast(missed), sss._KEY, "left_semi")
            .count()
        )
        print(
            f"  isin({len(bkts)}) filter semi: {time.monotonic()-t0:.2f}s "
            f"rows={nf}",
            flush=True,
        )
        # OR-of-ranges filter (merged contiguous buckets)
        ranges = []
        lo = prev = bkts[0]
        for b in bkts[1:]:
            if b == prev + 1:
                prev = b
                continue
            ranges.append((lo, prev))
            lo = prev = b
        ranges.append((lo, prev))
        print(f"  merged ranges: {len(ranges)}", flush=True)
        if len(ranges) <= 600:
            pred = None
            for lo, hi in ranges:
                c = (
                    (F.col("bkt") == lo)
                    if lo == hi
                    else (F.col("bkt") >= lo) & (F.col("bkt") <= hi)
                )
                pred = c if pred is None else (pred | c)
            t0 = time.monotonic()
            nf = (
                store_b.filter(pred)
                .join(F.broadcast(missed), sss._KEY, "left_semi")
                .count()
            )
            print(
                f"  or-ranges filter semi: {time.monotonic()-t0:.2f}s "
                f"rows={nf}",
                flush=True,
            )
        store_b.unpersist()

    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "10000")


if __name__ == "__main__":
    main()
