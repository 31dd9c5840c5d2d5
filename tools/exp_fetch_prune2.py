"""[HISTORICAL — written against the r13 v3 (g,seg,sig)-keyed layout;
the measurements below justified the r14 sk/kv redesign. Not rerunnable
as-is on the v4 layout.]

Round-14 experiment 2: constant-factor surgery on the q48 fetch.

The first experiment killed bucket pruning for 500-doc batches (21k
missed keys cover 4069/4096 buckets). This one measures the reachable
floor of the scan itself:

  a. baseline: flat 74M-row store, 3-col key LeftSemi (current path)
  b. flat store keyed by a single xxhash64 key column (sk)
  c. sk-GROUPED key directory (27M rows, one per distinct key) semi
     + explode of the matched groups (the fetch output)
  d. (c) with columnar compression off
  e. small-batch regime (10 / 50-doc probes): bucket-set isin filter
     over a bkt-sorted grouped directory — the reference's own
     fixed-small-batch scaling axis.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from distributed_stream_processing_spark.session import get_spark  # noqa: E402


def timed(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        r = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label}: {best:.2f}s  ({r})", flush=True)
    return best


def main() -> None:
    from fractions import Fraction

    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )

    spark = get_spark("exp-fetch-prune2")
    d100 = os.path.join(REPO, ".stressdata", "stress100x")
    t = Fraction(3, 4)
    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    base = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))
    j = sss.load_similarity_store(spark, os.path.join(d100, "q48store"), t)
    print(f"store rows={j.sig_store.count()}", flush=True)

    probe_batch = base.filter((F.col("id") % 10 < 3) & (F.col("id") % 1000 == 1))
    probe = j._probe_rows(probe_batch).cache()
    missed = probe.select(*sss._KEY).distinct().cache()
    print(f"missed keys: {missed.count()}", flush=True)

    # a. baseline
    timed(
        "a. flat 3-col-key semi (74M)",
        lambda: j.sig_store.join(F.broadcast(missed), sss._KEY, "left_semi").count(),
    )

    # b. flat, single sk key
    sk = F.xxhash64("g", "seg", "sig").alias("sk")
    flat_sk = j.sig_store.select(sk, "b_id", "b_sz", "b_kind").cache()
    flat_sk.count()
    missed_sk = missed.select(sk).distinct().cache()
    n_missed_sk = missed_sk.count()
    print(f"missed sk: {n_missed_sk}", flush=True)
    timed(
        "b. flat sk-key semi (74M)",
        lambda: flat_sk.join(F.broadcast(missed_sk), "sk", "left_semi").count(),
    )

    # c. grouped key directory
    kv = (
        flat_sk.groupBy("sk")
        .agg(F.collect_list(F.struct("b_id", "b_sz", "b_kind")).alias("rows"))
        .repartition(32)
        .cache()
    )
    print(f"kv rows: {kv.count()}", flush=True)
    timed(
        "c. kv semi (27M) only",
        lambda: kv.join(F.broadcast(missed_sk), "sk", "left_semi").count(),
    )
    timed(
        "c2. kv semi + explode (fetch output)",
        lambda: kv.join(F.broadcast(missed_sk), "sk", "left_semi")
        .select("sk", F.explode("rows").alias("r"))
        .select("sk", "r.b_id", "r.b_sz", "r.b_kind")
        .count(),
    )
    # c3. inner join broadcast (vs semi)
    timed(
        "c3. kv inner-bcast + explode",
        lambda: kv.join(F.broadcast(missed_sk), "sk")
        .select("sk", F.explode("rows").alias("r"))
        .count(),
    )

    # d. compression off
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    kv2 = (
        flat_sk.groupBy("sk")
        .agg(F.collect_list(F.struct("b_id", "b_sz", "b_kind")).alias("rows"))
        .repartition(32)
        .cache()
    )
    kv2.count()
    timed(
        "d. kv semi, uncompressed cache",
        lambda: kv2.join(F.broadcast(missed_sk), "sk", "left_semi").count(),
    )
    kv2.unpersist()
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")

    # e. small-batch regime over a bkt-sorted directory
    N_BKT = 4096
    kvs = (
        flat_sk.groupBy("sk")
        .agg(F.collect_list(F.struct("b_id", "b_sz", "b_kind")).alias("rows"))
        .withColumn("bkt", F.pmod("sk", F.lit(N_BKT)).cast("int"))
        .repartition(32, "bkt")
        .sortWithinPartitions("bkt", "sk")
        .cache()
    )
    kvs.count()
    for n_docs, k in ((10, 13), (50, 17)):
        small = base.filter((F.col("id") % 10 < 3)).limit(n_docs)
        sp = j._probe_rows(small).select(sk).distinct().cache()
        nk = sp.count()
        bkts = sorted(r[0] for r in sp.select(F.pmod("sk", F.lit(N_BKT)).cast("int").alias("b")).distinct().collect())
        print(f"  small batch {n_docs} docs: {nk} keys, {len(bkts)}/{N_BKT} buckets", flush=True)
        timed(
            f"e. {n_docs}-doc full kv semi",
            lambda sp=sp: kvs.join(F.broadcast(sp), "sk", "left_semi").count(),
        )
        timed(
            f"e. {n_docs}-doc bkt-isin kv semi",
            lambda sp=sp, bkts=bkts: kvs.filter(F.col("bkt").isin(bkts))
            .join(F.broadcast(sp), "sk", "left_semi")
            .count(),
        )
        sp.unpersist()


if __name__ == "__main__":
    main()
