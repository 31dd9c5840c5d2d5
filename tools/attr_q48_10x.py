"""Attribution re-run for ratio_10x q48 (VERDICT r17 task 1 / item 1).

BENCH_r17 published ratio_10x q48 = 1.01 with the same window shape
this protocol diagnosed for q21-r16: the 1x leg (min 13.972 s) sits
ABOVE the committed r14 stress-1x range [11.85, 13.32] while the 10x
leg (14.094 s) sits BELOW the 10x range [14.58, 21.27] — an inflated
denominator under a best-case numerator reads as impossibly clean
scaling. This is the exact q21 treatment that produced the in-band
2.21 in r17: a clean-window re-run, >=4 runs per scale on the same
disk-backed stress fixtures, all three probes (cpu/io/loadavg)
bracketing, raw runs printed for BASELINE.md.

Protocol per scale: pre-warm the memoized similarity store OUTSIDE
the timed window (tools/../bench._q48_split — the same pre-warm the
stress loop uses), then 4 timed noop-write runs with a GC+settle
between them. The published ratio is steady-min(10x)/steady-min(1x).

Usage: PYTHONPATH=/root/repo python3 tools/attr_q48_10x.py [runs] [scale...]
(scale: stress1x / stress10x; default both. A single-scale re-run
prints that scale's block only — no ratio.)
Prints per-run lines and one summary JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402

QUERY = "q48_semi_stream_similarity"


def _probes() -> list:
    return [
        round(bench._cpu_probe(), 2),
        round(bench._io_probe(), 3),
        round(bench._loadavg(), 1),
    ]


def main() -> None:
    from distributed_stream_processing_spark.session import get_spark
    from tools.gen_stress_sf1 import ensure_stress

    runs_per_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scales = tuple(sys.argv[2:]) or ("stress1x", "stress10x")
    spark = get_spark("attr-q48-10x")
    specs = bench.load_all()
    dirs = ensure_stress()

    opens = _probes()
    print(f"# probes open (cpu/io/load): {opens}", flush=True)

    out: dict[str, dict] = {}
    mid_probes: dict[str, list] = {}
    for scale in scales:
        d = dirs[scale]
        # pre-warm the memoized store outside the timed window (the
        # stress loop's own rule — VERDICT r13 task 8)
        try:
            bench._q48_split(spark, d)
        except Exception as e:
            print(f"# {scale} store pre-warm failed: {e}", flush=True)
        times: list[float] = []
        for i in range(runs_per_scale):
            time.sleep(2)
            bench._gc_level(spark)
            times.append(bench._run_noop(spark, specs, QUERY, d))
            print(
                f"# {scale} run {i + 1}/{runs_per_scale}: "
                f"{times[-1]:.3f}s",
                flush=True,
            )
        out[scale] = {
            "min": round(min(times), 3),
            "runs": [round(x, 2) for x in times],
            # steady = min of the last two runs (cold/warm-up effects
            # front-load; the stress loop's convergence retry exists
            # for the same reason)
            "steady": round(min(times[-2:]), 3),
        }
        mid_probes[scale] = _probes()
        print(f"# probes after {scale}: {mid_probes[scale]}", flush=True)

    closes = _probes()
    print(f"# probes close (cpu/io/load): {closes}", flush=True)
    summary = {
        "exp": "attr_q48_10x",
        "query": QUERY,
        "scales": out,
        "probes": {"open": opens, "mid": mid_probes, "close": closes},
    }
    if "stress1x" in out and "stress10x" in out:
        summary["ratio_10x_min"] = round(
            out["stress10x"]["min"] / out["stress1x"]["min"], 2
        )
        summary["ratio_10x_steady"] = round(
            out["stress10x"]["steady"] / out["stress1x"]["steady"], 2
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
