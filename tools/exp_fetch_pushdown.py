"""Round-17 experiment (VERDICT r16 task 4): the miss-fetch crossover
at the 100x store — when does the O(misses) keyed PUSHDOWN fetch beat
the O(store) scan the pipelines default to?

Four fetch variants, same missed-key sets (sampled from a REAL ~500-doc
probe batch's misses at the 350k-doc store), each timed min-of-2 with
noop writes and bracketed by the bench CPU/IO/load probes:

  a. kv-mem semi   — the DEFAULT: in-session CACHED key directory
     (~27M grouped rows), broadcast semi-join + explode. O(store) per
     batch but the store is memory-resident (the cluster-resident
     posture both pipelines assume).
  b. sigs-fs semi  — SemiScanFetcher posture against the ON-DISK flat
     signature collection (~75M rows parquet): what the default decays
     to when the store no longer fits the cluster. O(store-on-disk).
  c. sigs-fs isin  — PushdownKeyedFetcher against the same parquet,
     UNSORTED (1 row group per file, sk min/max spans everything): the
     pushed In filter reaches the scan but prunes nothing — measures
     pushdown WITHOUT physical clustering.
  d. sigs-sorted isin — the same pushdown against an sk-RANGE-
     PARTITIONED copy (built once beside the store, gitignored): file
     min/max now prune, so the scan reads only the files the keys
     land in — the indexed-external-store shape (the reference's
     Mongo signature collection with its key index,
     ds_join/DS_SimJoin_stream.scala:774-832).

Usage: PYTHONPATH=/root/repo python3 tools/exp_fetch_pushdown.py
Prints per-(size, variant) rows and one summary JSON line for
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

KEY_SIZES = [10, 100, 1_000, 10_000]  # plus the full real miss set


def _timed_noop(df, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from fractions import Fraction

    import bench  # probes shared with the bench protocol
    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )
    from distributed_stream_processing_spark.session import get_spark
    from distributed_stream_processing_spark.sources.fetcher import (
        PushdownKeyedFetcher,
    )
    from tools.gen_stress_sf1 import ensure_dedup_100x

    spark = get_spark("exp-fetch-pushdown")
    d100 = ensure_dedup_100x()
    store_path = os.path.join(d100, "q48store")
    t = Fraction(3, 4)
    j = sss.load_similarity_store(spark, store_path, t)
    probes_open = [
        round(bench._cpu_probe(), 2),
        round(bench._io_probe(), 3),
        round(bench._loadavg(), 1),
    ]
    print(f"# probes open (cpu/io/load): {probes_open}", flush=True)

    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    base = docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("tokens")
    )
    # the same real fresh-miss batch shape the bench's q48_100x times
    batch = base.filter((F.col("id") % 10 < 3) & (F.col("id") % 1000 == 1))
    real_keys = sorted(
        r.sk
        for r in j._probe_rows(batch).select("sk").distinct().collect()
    )
    print(f"# real batch miss keys: {len(real_keys)}", flush=True)

    # on-disk flat signature collection (the external-store source)
    sigs_fs = spark.read.parquet(os.path.join(store_path, "sigs")).select(
        "sk", "b_id", "b_sz", "b_kind"
    )
    # sk-range-partitioned copy: built ONCE beside the store — file
    # min/max becomes a coarse sk index, the physical property a real
    # keyed external store provides
    sorted_path = os.path.join(d100, "q48store_sorted_sk")
    if not os.path.isdir(sorted_path):
        t0 = time.monotonic()
        (
            sigs_fs.repartitionByRange(64, "sk")
            .sortWithinPartitions("sk")
            .write.mode("overwrite")
            .parquet(sorted_path)
        )
        print(
            f"# built sk-sorted copy in {time.monotonic() - t0:.1f}s",
            flush=True,
        )
    sigs_sorted = spark.read.parquet(sorted_path)

    def kv_mem_fetch(keys_df):
        # the pipelines' default directory fetch (in-session, cached)
        return (
            j.kv_store.join(F.broadcast(keys_df), "sk", "left_semi")
            .select("sk", F.explode("rows").alias("r"))
            .select("sk", "r.b_id", "r.b_sz", "r.b_kind")
        )

    def scan_semi_fetch(keys_df):
        return sigs_fs.join(F.broadcast(keys_df), "sk", "left_semi")

    results: dict[str, dict[str, float]] = {}
    rows_fetched: dict[str, int] = {}
    all_sizes = KEY_SIZES + [len(real_keys)]
    # the on-disk scan-semi's cost is O(store), key-count-independent
    # — timing it at every size just repeats a ~20 s full-store read
    # (the first attempt timed out doing exactly that); two sizes
    # bracket it
    scan_semi_sizes = {100, len(real_keys)}
    for n in all_sizes:
        keys = real_keys[:n]
        label = str(n)
        keys_df = spark.createDataFrame([(k,) for k in keys], "sk long")
        pd_unsorted = PushdownKeyedFetcher(sigs_fs, "sk")
        pd_sorted = PushdownKeyedFetcher(sigs_sorted, "sk")
        variants = {
            "kv_mem_semi": kv_mem_fetch(keys_df),
            "sigs_fs_isin": pd_unsorted.fetch(keys_df),
            "sigs_sorted_isin": pd_sorted.fetch(keys_df),
        }
        if n in scan_semi_sizes:
            variants["sigs_fs_semi"] = scan_semi_fetch(keys_df)
        results[label] = {}
        for name, df in variants.items():
            results[label][name] = _timed_noop(df)
        rows_fetched[label] = variants["sigs_sorted_isin"].count()
        # sanity: the pushdown variants fetch the same signature rows
        # as the in-memory directory fetch
        n_kv = kv_mem_fetch(keys_df).count()
        assert n_kv == rows_fetched[label], (
            f"{label}: kv={n_kv} pushdown={rows_fetched[label]}"
        )
        plan = (
            variants["sigs_sorted_isin"]
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        pushed = "PushedFilters: [In(sk" in plan or "In(sk" in plan
        print(
            f"# {label} keys -> rows {rows_fetched[label]}: "
            + " ".join(f"{k}={v}s" for k, v in results[label].items())
            + f" pushed_in={pushed}",
            flush=True,
        )
    probes_close = [
        round(bench._cpu_probe(), 2),
        round(bench._io_probe(), 3),
        round(bench._loadavg(), 1),
    ]
    print(f"# probes close (cpu/io/load): {probes_close}", flush=True)
    print(
        json.dumps(
            {
                "exp": "fetch_pushdown_100x",
                "store_rows": sigs_fs.count(),
                "real_miss_keys": len(real_keys),
                "rows_fetched": rows_fetched,
                "timings_s": results,
                "probes": {"open": probes_open, "close": probes_close},
            }
        )
    )


if __name__ == "__main__":
    main()
