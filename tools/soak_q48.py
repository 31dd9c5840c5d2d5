"""12-batch soak of the semi-stream similarity pipeline at the 100x
store: 5 real ~500-doc probe batches interleaved with EMPTY batches,
one session (VERDICT r13 task + r15 task 2).

What it evidences:
* real-batch walls stay FLAT while cache/LRU state grows — per-batch
  cost tracks batch volume, not accumulated state (the bounded-state
  requirement for unbounded streams);
* EMPTY-batch walls are the pipeline's per-batch fixed floor. r14
  measured 2.0-4.3 s (the unconditional O(state) rewrite +
  checkpoint); r15's deferred compaction targets <= ~1 s, with the
  amortized O(state) fold visible as a spike on the compaction batch
  (cadence = min(compact_every, controller window)).

Usage: PYTHONPATH=/root/repo python3 tools/soak_q48.py
Prints one line per batch: kind, wall, out rows, pending deltas, and
whether that batch compacted; then a summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from fractions import Fraction

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )
    from distributed_stream_processing_spark.session import get_spark
    from distributed_stream_processing_spark.streaming.checkpoint import (
        RELEASE_STATS,
    )
    from tools.gen_stress_sf1 import ensure_dedup_100x

    spark = get_spark("soak-q48")
    d100 = ensure_dedup_100x()
    t = Fraction(3, 4)
    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    base = docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("tokens")
    )
    store_path = os.path.join(d100, "q48store")
    if os.path.isdir(os.path.join(store_path, "groups")):
        j = sss.load_similarity_store(spark, store_path, t)
    else:
        stored = base.filter(F.col("id") % 10 >= 3)
        j = sss.SemiStreamSimilarityJoin(
            stored=None,
            threshold=t,
            artifacts=sss.build_similarity_store(stored, t),
        )
    # 5 real ~500-doc batches (planted-dup classes) interleaved with
    # empty batches: real/empty/real/empty/... (12 total)
    real_classes = [0, 1, 501, 50, 550]
    batches = []
    for i, cls in enumerate(real_classes):
        batches.append(
            (
                "real",
                base.filter(
                    (F.col("id") % 10 < 3) & (F.col("id") % 1000 == cls)
                ),
            )
        )
        batches.append(("empty", base.filter(F.lit(False))))
    while len(batches) < 12:
        batches.append(("empty", base.filter(F.lit(False))))
    sc = spark.sparkContext._jsc.sc()

    def n_persisted() -> int:
        # RDD-level storage registry: checkpoint leaves live here, not
        # in the CacheManager — the count the r16 release path bounds
        # (ADVICE r15: unpersist was a no-op on leaves and storage on
        # long streams floated with GC lag)
        return len(sc.getRDDStorageInfo())

    walls: dict[str, list[float]] = {"real": [], "empty": []}
    compact_walls: list[float] = []
    persisted: list[int] = []
    for b, (kind, batch) in enumerate(batches):
        pend_before = len(j._pend)
        t0 = time.monotonic()
        n = j.process_batch(batch, b).count()
        j.flush_attribution()
        w = round(time.monotonic() - t0, 2)
        compacted = len(j._pend) == 0 and pend_before > 0
        if compacted:
            compact_walls.append(w)
        else:
            walls[kind].append(w)
        persisted.append(n_persisted())
        print(
            f"batch {b:2d} {kind:5s}: {w:6.2f}s out {n:6d} "
            f"pend {pend_before}->{len(j._pend)} rdds {persisted[-1]}"
            + (" COMPACTION" if compacted else ""),
            flush=True,
        )
    # state size at the end (one extra job, outside the walls)
    n_cache = j.cache.count()
    n_lru = j.lru.count()
    j.close()
    time.sleep(2)  # release is async (unpersist blocking=False)
    rdds_after_close = n_persisted()
    # boundedness check: persisted-RDD count must not grow past the
    # structural budget (batch outputs accumulate one leaf each — the
    # caller owns those — plus base state + pending deltas bounded by
    # the compaction cadence); a leak reads as monotone growth beyond
    # outputs+state
    budget = len(batches) + 2 * 3 + 8  # outputs + bases + deltas + slack
    assert max(persisted) <= budget, (
        f"persisted RDDs grew past the structural budget: {persisted}"
    )
    # release accounting (VERDICT r16 item 4): the boundedness check
    # above would pass for a while on GC luck even with a broken
    # _ckpt_jrdd handle; the counters fail it deterministically. The
    # soak swaps state every real batch, so releases MUST have run.
    assert RELEASE_STATS["attempted"] > 0, (
        "no checkpoint releases attempted — the release path is dead"
    )
    assert RELEASE_STATS["succeeded"] == RELEASE_STATS["attempted"], (
        f"checkpoint releases failing silently: {RELEASE_STATS} "
        "(broken _ckpt_jrdd handle reverts state to leak-by-GC)"
    )
    print(
        json.dumps(
            {
                "real_walls": walls["real"],
                "empty_walls": walls["empty"],
                "compaction_walls": compact_walls,
                "cache_rows_final": n_cache,
                "lru_rows_final": n_lru,
                "persisted_rdds": persisted,
                "rdds_after_close": rdds_after_close,
                "ckpt_releases": [
                    RELEASE_STATS["succeeded"],
                    RELEASE_STATS["attempted"],
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
