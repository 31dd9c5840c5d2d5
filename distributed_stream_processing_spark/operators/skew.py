"""Skew-aware join: salting for hot keys.

The reference balanced hot signatures with a hand-built load-aware
partitioner (ds_join/SimilarityQueryPartitioner.scala:36-57). Spark's
AQE skew-join splitting covers most cases; this explicit salted join
is the fallback for extreme single-key skew (one key larger than an
executor), and documents the pattern:

left rows get a deterministic salt in [0, n); the (small) right side
is replicated n times; the join key becomes (key, salt), splitting a
hot key's rows across n tasks. Semantically identical to the plain
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join with the left side salted across ``n_salt`` buckets.

    ``salt_on``: a left column whose hash picks the salt (defaults to
    the whole row being nondeterministic-free: uses key + a stable
    hash of all left columns).
    """
    salt_src = F.col(salt_on) if salt_on else F.struct(*[F.col(c) for c in left.columns])
    l = left.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salt)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l.join(r, [key, "_salt"], how).drop("_salt")


def bounded_broadcast(
    df: DataFrame,
    approx_rows: int | None,
    max_rows: int = 1_000_000,
    shj_max_rows: int = 64_000_000,
) -> DataFrame:
    """Broadcast hint gated on a driver-known row bound, with a
    three-tier fallback ladder.

    The semi-stream state plans are compiled AQE-off (see
    streaming/checkpoint.lazy_local_checkpoint), so a broadcast hint
    there is UNCONDITIONAL — no runtime fallback if the set turns out
    huge. Eviction key sets are usually tiny, but stale = every cached
    key untouched for `window` batches, which after a workload shift
    can be the entire cache; at cluster scale forcing that through a
    driver-collected broadcast is an OOM (ADVICE r6). The ladder:

    * rows <= ``max_rows``: broadcast. ~1M narrow key rows (a long,
      or the 3-int signature key) is tens of MB serialized — inside
      executor broadcast capacity with margin.
    * rows <= ``shj_max_rows``: SHUFFLE_HASH hint. Static planning
      compiles an unhinted unknown-stats join to a sort-merge join
      (both sides shuffled AND sorted — r10's plan-invariant tests
      caught exactly that on q48's miss-detect); a shuffled hash join
      shuffles the same bytes, builds per-partition hash tables on
      this (key-set) side, and skips both sorts. The hash table CANNOT
      SPILL, so this tier is itself row-bounded (ADVICE r10): 64M
      narrow key rows / shuffle-partition count ≈ a few hundred MB of
      per-task build at the session's 32-plus partitions — resident
      with margin, and at cluster scale partition counts grow with
      the data.
    * above ``shj_max_rows``, or bound unknown (None): NO hint. The
      sort-merge join is the only strategy whose build side spills;
      paying its sorts beats an executor OOM on a cache-sized set.
    """
    if approx_rows is None:
        return df
    if approx_rows <= max_rows:
        return F.broadcast(df)
    if approx_rows <= shj_max_rows:
        return df.hint("shuffle_hash")
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism,
    for a stage of HEAVY PER-ROW COMPUTE whose input would otherwise
    arrive under-partitioned.

    Two sources of under-partitioning that byte-based planning cannot
    see past: a small file scan (one task per file) and AQE partition
    coalescing (merges exchanges to ~64 MB chunks by SIZE — correct
    for byte-bound stages, wrong when each row costs far more to
    process than to store, e.g. a 64-permutation MinHash fold over a
    token array). The explicit REPARTITION_BY_NUM exchange is exempt
    from AQE coalescing, so the downstream compute runs at full
    width; the shuffled payload is the operator's (small) row set,
    paid once. At cluster scale shuffle partitions are sized 2-3x
    total cores (session.py), so this widens, never narrows.
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n_part)
