"""Measure driver-side plan-CONSTRUCTION time per registered query.

VERDICT r11 task 7: q21's headline creep was py4j expression
construction (~1.7 s of a 2.9 s run) and was fixed by memoizing the
Columns (operators/dedup.py:_lsh_exprs). This tool measures the same
axis for any query: wall time of ``specs[name].fn(spark, sf_dir)``
alone (no action), second call after the first (memo warm), so a
query whose plan build still dominates shows up as a candidate for
the memo pattern. Queries whose fn() itself runs jobs (stats
collection, drained pipelines) are flagged by job-count delta so a
"build" number isn't misread as pure py4j cost.

Usage: PYTHONPATH=/root/repo python3 tools/prof_plan_build.py q54 q47
"""

from __future__ import annotations

import sys
import time

from distributed_stream_processing_spark.plans import load_all
from distributed_stream_processing_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    prefixes = tuple(sys.argv[1:]) or ("q54", "q47")
    spark = get_spark("prof_plan_build")
    sc = spark.sparkContext
    specs = load_all()
    tracker = sc.statusTracker()
    for name in specs:
        if not name.startswith(prefixes):
            continue
        for label in ("cold", "warm"):
            jobs0 = len(tracker.getJobIdsForGroup() or [])
            t0 = time.monotonic()
            df = specs[name].fn(spark, SF_DIR)
            build_s = time.monotonic() - t0
            # force analysis (not execution): schema resolution is
            # part of what a per-batch caller pays
            _ = df.schema
            analyzed_s = time.monotonic() - t0
            jobs1 = len(tracker.getJobIdsForGroup() or [])
            print(
                f"{name} [{label}]: fn {build_s:.3f}s, +analysis "
                f"{analyzed_s:.3f}s, jobs during build: {jobs1 - jobs0}"
            )


if __name__ == "__main__":
    main()
