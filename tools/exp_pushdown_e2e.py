"""End-to-end PushdownKeyedFetcher batch at the 100x store (VERDICT
r17 task 4, final piece): the r17 experiment timed fetch VARIANTS
standalone and the transparency test runs at unit scale — nothing had
run a full pipeline batch at the 100x store THROUGH the pushdown
seam. This does exactly that:

* loads the saved 350k-doc similarity store (the q48_100x fixture);
* runs the same fresh-miss ~500-doc steady batch through TWO
  pipelines: the default (in-session kv-directory scan fetch) and one
  wired with ``PushdownKeyedFetcher`` over the sk-range-partitioned
  flat signature collection (built by tools/exp_fetch_pushdown.py —
  the key-clustered external-store shape, the reference's indexed
  Mongo ``in()`` path, ds_join/DS_SimJoin_stream.scala:774-832);
* asserts the two outputs are IDENTICAL (seam transparency at scale);
* times both batches (warm-up batch first per engine), prints the
  pushed key counts, probe-bracketed.

Usage: PYTHONPATH=/root/repo python3 tools/exp_pushdown_e2e.py
Prints one summary JSON line for BASELINE.md.
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


def _probes() -> list:
    import bench

    return [
        round(bench._cpu_probe(), 2),
        round(bench._io_probe(), 3),
        round(bench._loadavg(), 1),
    ]


def main() -> None:
    from fractions import Fraction

    import bench
    from distributed_stream_processing_spark.functions.text import tokens
    from distributed_stream_processing_spark.operators import (
        semi_stream_similarity as sss,
    )
    from distributed_stream_processing_spark.session import get_spark
    from distributed_stream_processing_spark.sources.fetcher import (
        PushdownKeyedFetcher,
    )
    from tools.gen_stress_sf1 import ensure_dedup_100x

    spark = get_spark("exp-pushdown-e2e")
    d100 = ensure_dedup_100x()
    store_path = os.path.join(d100, "q48store")
    sorted_path = os.path.join(d100, "q48store_sorted_sk")
    t = Fraction(3, 4)

    opens = _probes()
    print(f"# probes open (cpu/io/load): {opens}", flush=True)

    t0 = time.monotonic()
    arts = sss.load_similarity_artifacts(spark, store_path, t)
    load_s = round(time.monotonic() - t0, 3)
    print(f"# store load: {load_s}s", flush=True)

    # the sk-clustered external source (built once beside the store by
    # the r17 experiment; rebuild if missing)
    if not os.path.isdir(sorted_path):
        sigs_fs = spark.read.parquet(os.path.join(store_path, "sigs")).select(
            "sk", "b_id", "b_sz", "b_kind"
        )
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

    docs = spark.read.parquet(os.path.join(d100, "documents.parquet"))
    base = docs.select(
        F.col("doc_id").alias("id"), tokens("text").alias("tokens")
    )

    def batch(cls: int, lo: int = 0):
        return base.filter(
            (F.col("id") % 10 < 3)
            & (F.col("id") % 1000 == cls)
            & (F.col("id") >= lo)
        )

    results: dict[str, dict] = {}
    outs: dict[str, list] = {}
    for name in ("default_scan", "pushdown_clustered"):
        fetcher = (
            PushdownKeyedFetcher(sigs_sorted, "sk")
            if name == "pushdown_clustered"
            else None
        )
        j = sss.SemiStreamSimilarityJoin(
            stored=None, threshold=t, artifacts=arts, fetcher=fetcher
        )
        try:
            # warm-up batch (fresh-miss class ≡0): primes JIT + the
            # attributor baseline, same as the bench point
            j.process_batch(batch(0), 0).write.mode("overwrite").format(
                "noop"
            ).save()
            j.flush_attribution()
            # timed steady batch: the bench's primary fresh-miss class
            t0 = time.monotonic()
            out = j.process_batch(batch(1, lo=10_000), 1)
            rows = out.collect()
            j.flush_attribution()
            wall = round(time.monotonic() - t0, 3)
            outs[name] = sorted(tuple(r) for r in rows)
            results[name] = {"batch_s": wall, "out_rows": len(rows)}
            if fetcher is not None:
                results[name]["pushed_keys"] = fetcher.pushed_counts
            print(f"# {name}: {results[name]}", flush=True)
        finally:
            # cache/LRU state released per engine; the SHARED corpus
            # artifacts stay cached for the second engine (the
            # process exits at the end — no unpersist needed)
            j.close()

    identical = outs["default_scan"] == outs["pushdown_clustered"]
    assert identical, (
        "pushdown pipeline output DIVERGED from the default at the "
        f"100x store: {len(outs['default_scan'])} vs "
        f"{len(outs['pushdown_clustered'])} rows"
    )
    closes = _probes()
    print(f"# probes close (cpu/io/load): {closes}", flush=True)
    print(
        json.dumps(
            {
                "exp": "pushdown_e2e_100x",
                "store_load_s": load_s,
                "results": results,
                "output_identical": identical,
                "probes": {"open": opens, "close": closes},
            }
        )
    )


if __name__ == "__main__":
    main()
