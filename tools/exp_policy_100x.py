"""One measured batch at the 100x store THROUGH THE LIVE FETCH POLICY
(VERDICT r18 task 2, last deliverable): the AutoFetcher — wired with
the sk-range-sorted flat signature collection, parquet-footer
clustering check, and the controller's miss signal — must (a) pick
the kv-directory SCAN for a steady ~500-doc batch (its ~20k misses
are over the crossover threshold and the ~1 GB store is
memory-resident: pushdown would collect 20k keys per batch for
nothing) and (b) flip to the keyed PUSHDOWN for a reference-regime
small batch (~tens of docs, <= 1k misses), with output identical to
the default pipeline either way.

Usage: PYTHONPATH=/root/repo python3 tools/exp_policy_100x.py
Prints one JSON line for BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from fractions import Fraction

    import bench
    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )
    from distributed_stream_processing_spark.session import get_spark
    from distributed_stream_processing_spark.sources.fetcher import (
        AutoFetcher,
        parquet_clustered_on,
        path_bytes,
    )
    from distributed_stream_processing_spark.streaming.cache_controller import (
        AdaptiveCacheController,
    )
    from tools.gen_stress_sf1 import ensure_dedup_100x

    spark = get_spark("exp-policy-100x")
    d100 = ensure_dedup_100x()
    store_path = os.path.join(d100, "q48store")
    sorted_path = os.path.join(d100, "q48store_sorted_sk")
    t = Fraction(3, 4)

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
    stored = base.filter(F.col("id") % 10 >= 3)

    t0 = time.monotonic()
    if os.path.isdir(os.path.join(store_path, "groups")):
        arts = sss.load_similarity_artifacts(spark, store_path, t)
        built = False
    else:
        arts = sss.build_similarity_store(stored, t)
        sss.save_similarity_artifacts(arts, store_path)
        arts = sss.load_similarity_artifacts(spark, store_path, t)
        built = True
    load_s = round(time.monotonic() - t0, 1)
    print(f"# store {'build+save' if built else 'load'}: {load_s}s", flush=True)

    if not os.path.isdir(sorted_path):
        sigs_fs = spark.read.parquet(os.path.join(store_path, "sigs")).select(
            "sk", "b_id", "b_sz", "b_kind"
        )
        (
            sigs_fs.repartitionByRange(64, "sk")
            .sortWithinPartitions("sk")
            .write.mode("overwrite")
            .parquet(sorted_path)
        )
    sigs_sorted = spark.read.parquet(sorted_path)

    def batch(cls: int, small: bool = False):
        b = base.filter((F.col("id") % 10 < 3) & (F.col("id") % 1000 == cls))
        if small:
            b = b.filter(F.col("id") % 20000 == cls)  # ~reference regime
        return b

    ctl = AdaptiveCacheController()
    fetcher = AutoFetcher(
        source=sigs_sorted,
        key="sk",
        store_bytes=path_bytes(sorted_path),
        key_clustered=parquet_clustered_on(sorted_path, "sk"),
        miss_signal=lambda: (ctl.history[-1].n_miss if ctl.history else None),
        scan_declines=True,
    )
    j_pol = sss.SemiStreamSimilarityJoin(
        stored=None, threshold=t, artifacts=arts, fetcher=fetcher,
        controller=ctl,
    )
    j_def = sss.SemiStreamSimilarityJoin(stored=None, threshold=t, artifacts=arts)

    res: dict = {"store_load_s": load_s, "probes_open": probes_open}
    walls: dict = {}
    for bid, (cls, small, tag) in enumerate(
        [(0, False, "warm"), (1, False, "steady_scan"), (2, True, "small_pushdown")]
    ):
        b = batch(cls, small)
        t0 = time.monotonic()
        out_p = j_pol.process_batch(b, bid)
        out_p.write.mode("overwrite").format("noop").save()
        w_pol = round(time.monotonic() - t0, 2)
        j_pol.flush_attribution()
        t0 = time.monotonic()
        out_d = j_def.process_batch(b, bid)
        out_d.write.mode("overwrite").format("noop").save()
        w_def = round(time.monotonic() - t0, 2)
        same = sorted(out_p.collect()) == sorted(out_d.collect())
        walls[tag] = {"policy": w_pol, "default": w_def, "identical": same}
        print(f"# {tag}: policy {w_pol}s default {w_def}s identical={same}",
              flush=True)
        assert same, f"{tag}: policy output diverged from default"
    res["walls"] = walls
    res["chosen"] = [list(c) for c in fetcher.chosen]
    res["pushed_counts"] = list(fetcher._pushdown.pushed_counts)
    res["miss_history"] = [tt.n_miss for tt in ctl.history]
    j_pol.close()
    j_def.close()
    res["probes_close"] = [
        round(bench._cpu_probe(), 2),
        round(bench._io_probe(), 3),
        round(bench._loadavg(), 1),
    ]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
