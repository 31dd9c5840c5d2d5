"""Semi-stream equi-join with an adaptive distributed cache
(DS-Join parity: SURVEY §3.1).

The reference's per-batch dataflow — cogroup stream x cache, hit
join, miss detect, per-partition remote fetch, LRU upsert, eviction,
cache swap, hand-rolled threads (streaming.scala:211-617) — becomes
ONE DataFrame program per batch:

* hit   = batch ⋈ cache          (inner; broadcast when cache small)
* miss  = batch ⟕̸ cache          (left_anti)
* fetch = store ⋉ missed-keys    (left_semi on a broadcast key set —
          the JDBC/connector analogue is WHERE key IN (...) pushdown)
* out   = hit ∪ (miss ⋈ fetch)
* state: LRU last-seen upsert, eviction of keys older than the
  adaptive window, cache rebuild = (cache ∖ evicted) ∪ fetch

Spark schedules the formerly-threaded stages from one DAG; the cache
and LRU DataFrames are swapped per batch, localCheckpoint'ed (constant
plan depth — the reference's X8) and coalesced (bounded partition
width) on every swap.

Semantic invariant (tested): output == plain stream ⋈ store for every
cache state — the cache is transparent.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_stream_processing_spark.streaming.cache_controller import (
    AdaptiveCacheController,
    BatchTimings,
)
from distributed_stream_processing_spark.streaming.plan_timing import (
    DeferredObservation,
    PlanTimeAttributor,
)
from distributed_stream_processing_spark.operators.skew import bounded_broadcast
from distributed_stream_processing_spark.streaming.checkpoint import (
    lazy_local_checkpoint,
)


@dataclass
class SemiStreamJoin:
    store: DataFrame  # full stored dimension (stand-in for the remote DB)
    key: str  # join key column name, shared by stream and store
    initial_cache: DataFrame | None = None
    controller: AdaptiveCacheController = field(default_factory=AdaptiveCacheController)
    # frequency-based admission (DSim's filter(freq < 50),
    # DS_SimJoin_stream.scala:838): keys seen in >= this many batches
    # are NOT admitted to the cache (ultra-hot keys would bloat it and
    # are cheap to refetch); None disables
    admit_below_freq: int | None = None
    cache: DataFrame | None = None
    lru: DataFrame | None = None  # (key, last_seen)
    freq: DataFrame | None = None  # (key, n_batches_seen)

    def __post_init__(self):
        spark = self.store.sparkSession
        self.cache = (
            self.initial_cache
            if self.initial_cache is not None
            else self.store.limit(0)
        ).cache()
        self.lru = (
            self.cache.select(F.col(self.key), F.lit(0).alias("last_seen"))
        ).cache()
        self.freq = self.cache.select(
            F.col(self.key), F.lit(0).alias("n_batches_seen")
        ).limit(0).cache()
        self._spark = spark
        self._attributor = PlanTimeAttributor()
        self._deferred = DeferredObservation()
        # driver-known row bounds for the eviction-set broadcast gates
        # (bounded_broadcast): refreshed from each batch's combined
        # count action. An initial cache is counted ONCE at setup —
        # one tiny job, never per batch.
        self._lru_rows: int = (
            0 if self.initial_cache is None else self.initial_cache.count()
        )
        self._freq_rows: int = 0

    def process_batch(self, batch: DataFrame, batch_id: int) -> DataFrame:
        """Join one micro-batch against store-through-cache; maintain
        state; return the enriched output (hit ∪ miss-fetched).

        The previous batch's attribution walk (background, diagnostics
        only) is joined just before this batch launches its FIRST job
        (the AQE-planned output localCheckpoint, whose stages execute
        at call time) — the latest point that keeps the walk's
        accumulator reads race-free from this batch's execution while
        still overlapping the previous batch's tail and this batch's
        hit/miss plan construction (ADVICE r10/r11). Callers that read
        ``controller.history`` directly after a bare process_batch
        must call :meth:`flush_attribution`."""
        k = self.key
        cache, lru = self.cache, self.lru

        hit = batch.join(cache, k, "inner")
        miss = batch.join(cache, k, "left_anti")

        # join the previous batch's background walk NOW — before this
        # batch's FIRST job. The output localCheckpoint below is
        # planned with AQE on, which executes its shuffle stages as
        # real jobs at call time; those jobs update the shared
        # cached-relation SQL-metric accumulators the walk reads, so
        # flushing any later races the walk against this batch's
        # execution and contaminates the deltas the controller
        # consumes (ADVICE r11). The walk still overlaps the previous
        # batch's tail + this batch's hit/miss plan construction.
        self._deferred.flush()

        t0 = time.monotonic()
        missed_keys = miss.select(k).distinct()
        fetched = self.store.join(F.broadcast(missed_keys), k, "left_semi").cache()

        # the output is checkpointed per batch (plain lazy
        # localCheckpoint: its joins lean on AQE's runtime broadcast
        # decisions, so it must NOT be planned AQE-off) and
        # materialized by the combined action's 'o' branch — the
        # caller's eventual evaluation scans pinned blocks instead of
        # recomputing hit/miss/fetch through by-then-released state
        out = hit.unionByName(miss.join(fetched, k, "inner")).localCheckpoint(
            eager=False
        )

        # ---- state maintenance (X4-X6) ----
        # key-set joins carry explicit broadcast hints: these plans go
        # through lazy_local_checkpoint (AQE-off planning), where an
        # unhinted join against the checkpointed state (unknown stats)
        # would compile to a sort-merge join shuffling the whole
        # cache/LRU every batch. batch_keys is genuinely micro-batch-
        # sized (unconditional hint); the EVICTION sets (stale, hot)
        # are only usually small — after a workload shift stale can be
        # the whole cache — so their hints are gated on the tracked
        # state sizes (bounded_broadcast), falling back to a shuffled
        # join rather than an unbounded driver collect.
        batch_keys = batch.select(k).distinct()
        new_lru = (
            lru.join(F.broadcast(batch_keys), k, "left_anti")
            .unionByName(batch_keys.withColumn("last_seen", F.lit(batch_id)))
        )
        admitted = fetched
        # first controller read of this batch — the walk was joined
        # above (pre-job), so the window reflects the previous batch
        window = self.controller.window
        stale = new_lru.filter(F.col("last_seen") < batch_id - window).select(k)
        new_freq = None
        if self.admit_below_freq is not None:
            # per-key batch frequency (admission only): maintained —
            # one groupBy + checkpoint + union branch per batch — only
            # when admission is enabled; the pipeline is latency-bound
            # on small sequential stages, so dead state costs real time
            new_freq = (
                self.freq.unionByName(
                    batch_keys.withColumn("n_batches_seen", F.lit(1))
                )
                .groupBy(k)
                .agg(F.sum("n_batches_seen").alias("n_batches_seen"))
            )
            # a key only reveals itself as hot after repeat batches, so
            # the filter both blocks admission AND evicts already-cached
            # keys that crossed the threshold
            hot = new_freq.filter(
                F.col("n_batches_seen") >= self.admit_below_freq
            ).select(k)
            # hot ⊆ the maintained freq table's keys (a new key's
            # count is 1 < threshold), so last batch's freq row count
            # bounds it
            admitted = fetched.join(
                bounded_broadcast(hot, self._freq_rows), k, "left_anti"
            )
            stale = stale.unionByName(hot)
            stale_bound = self._lru_rows + self._freq_rows
        else:
            stale_bound = self._lru_rows
        # stale ⊆ prior-LRU keys (this batch's keys carry last_seen ==
        # batch_id, never stale) ∪ hot keys — both tracked counts
        stale = bounded_broadcast(stale, stale_bound)
        new_cache = cache.join(stale, k, "left_anti").unionByName(admitted)
        new_lru = new_lru.join(stale, k, "left_anti")

        # checkpoint + bound every batch (constant plan depth, bounded
        # partition width — the union adds the fetch's partitions each
        # batch otherwise), then ONE combined action: a single job
        # materializes the fetch cache, all three state checkpoints,
        # and the controller's key counts (round 2 ran five actions
        # per batch, rounds 3-4 ran two with the fetch serialized
        # ahead of maintenance; this runs one).
        n_part = int(self._spark.conf.get("spark.sql.shuffle.partitions"))
        new_cache = lazy_local_checkpoint(new_cache.coalesce(n_part))
        new_lru = lazy_local_checkpoint(new_lru.coalesce(n_part))
        tagged = (
            missed_keys.select(F.lit("m").alias("t"))
            .unionAll(batch_keys.select(F.lit("k").alias("t")))
            .unionAll(fetched.select(F.lit("x").alias("t")))
            .unionAll(new_cache.select(F.lit("c").alias("t")))
            .unionAll(new_lru.select(F.lit("l").alias("t")))
            .unionAll(out.select(F.lit("o").alias("t")))
        )
        branch_phases = ["fetch", "join", "fetch", "maintain", "maintain", "join"]
        branch_tags = ["m", "k", "x", "c", "l", "o"]
        walk_order = [1, 2, 0, 3, 4, 5]
        if new_freq is not None:
            new_freq = lazy_local_checkpoint(new_freq.coalesce(n_part))
            tagged = tagged.unionAll(new_freq.select(F.lit("f").alias("t")))
            walk_order.append(len(branch_phases))
            branch_phases.append("maintain")
            branch_tags.append("f")
        counts_df = tagged.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
        counts = {r.t: r.n for r in counts_df.collect()}
        n_miss = int(counts.get("m", 0))
        n_keys = int(counts.get("k", 0))
        # refresh the eviction-broadcast row bounds from the same
        # combined action (no extra job)
        self._lru_rows = int(counts.get("l", 0))
        self._freq_rows = int(counts.get("f", 0))
        total_s = time.monotonic() - t0

        cache.unpersist()
        lru.unpersist()
        # the combined action materialized the output checkpoint and
        # the new cache (which absorbed the fetched rows) — the
        # per-batch fetch cache is dead weight from here (bounded
        # CacheManager on unbounded streams)
        fetched.unpersist()
        if new_freq is not None:
            self.freq.unpersist()
            self.freq = new_freq
        self.cache, self.lru = new_cache, new_lru
        # MEASURED per-phase split recovered from the combined action's
        # SQL metrics (DS-Join's controller compares measured phase
        # times, streaming.scala:486-520): branch k owns the batch key
        # scan (join context), m + x the miss detect + store fetch,
        # c/l/f the state rebuild; x is walked before c so the shared
        # cached fetch is attributed to the fetch phase. The walk is
        # py4j-round-trip-bound, so it runs in the background and is
        # joined at the next batch's entry (DeferredObservation).
        attributor, controller = self._attributor, self.controller

        def _attribute_and_observe():
            phases = attributor.attribute(
                counts_df,
                phases=branch_phases,
                tags=branch_tags,
                walk_order=walk_order,
            )
            if phases is not None:
                fetch_s, maintain_s = phases["fetch"], phases["maintain"]
                join_s, measured = phases["join"], True
            else:
                # fallback: miss-fraction attribution (DSim's
                # rule-based policy,
                # ds_join/DS_SimJoin_stream.scala:645-667)
                miss_frac = n_miss / n_keys if n_keys else 0.0
                fetch_s = total_s * miss_frac
                maintain_s = total_s - fetch_s
                join_s, measured = 0.0, False
            controller.observe(
                BatchTimings(
                    batch_id=batch_id,
                    n_miss=n_miss,
                    store_fetch_s=fetch_s,
                    cache_maintain_s=maintain_s,
                    join_s=join_s,
                    measured=measured,
                )
            )

        self._deferred.submit(_attribute_and_observe)
        return out

    def flush_attribution(self) -> None:
        """Join the pending background attribution walk — required
        before reading ``controller.history`` after the last batch."""
        self._deferred.flush()


def replay_in_batches(
    df: DataFrame, n_batches: int, bucket_col: str
) -> list[tuple[int, DataFrame]]:
    """Deterministic micro-batch replay of a static table: batch i =
    rows with pmod(bucket_col, n_batches) == i (the test harness's
    replacement for socket feeds — SURVEY §7 'what's hard' #5)."""
    return [
        (i, df.filter(F.pmod(F.col(bucket_col), F.lit(n_batches)) == i))
        for i in range(n_batches)
    ]


def run_semi_stream_join(
    stream_table: DataFrame,
    store: DataFrame,
    key: str,
    out_cols: list[str],
    n_batches: int = 4,
    bucket_col: str | None = None,
    initial_cache: DataFrame | None = None,
    controller: AdaptiveCacheController | None = None,
    admit_below_freq: int | None = None,
) -> DataFrame:
    """Replay ``stream_table`` through the cached semi-stream join and
    return the union of per-batch outputs (cache-transparent: equals
    the plain stream ⋈ store join)."""
    j = SemiStreamJoin(
        store=store,
        key=key,
        initial_cache=initial_cache,
        controller=controller or AdaptiveCacheController(),
        admit_below_freq=admit_below_freq,
    )
    outs = []
    for batch_id, batch in replay_in_batches(
        stream_table, n_batches, bucket_col or key
    ):
        outs.append(j.process_batch(batch, batch_id).select(*out_cols))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    # the last batch's background attribution must land before anyone
    # reads the controller history off the diagnostics seam
    j.flush_attribution()
    # per-invocation diagnostics seam (bench.py publishes the
    # measured/estimated regime split): carried on the result, not a
    # module global, so interleaved pipelines can't cross-report
    result._controller = j.controller
    return result
