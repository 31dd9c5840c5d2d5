"""Optimization-round measurement sweep (guide §1): time EVERY
registered query at $SPARK_GRAFT_SF_DIR with the noop sink and dump
each one's .explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

The headline bench times 10 queries; the optimization rounds owe a
measured number and a committed plan for all 50. One warm + N timed
runs per query in a single session (the driver's own session shape),
jobs labeled for the UI.

Usage:
  PYTHONPATH=/root/repo python3 tools/opt_measure.py [suffix] [only,csv]
  (suffix: 'before'/'after' -> plans/r18/<q>_<suffix>.txt; default none
   = timings only)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from distributed_stream_processing_spark.plans import load_all  # noqa: E402
from distributed_stream_processing_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(
    REPO, "plans", os.environ.get("OPT_PLANS_ROUND", "r19")
)


def explain_str(df) -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else ""
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("OPT_MEASURE_RUNS", "2"))
    spark = get_spark("opt_measure")
    specs = load_all()
    if suffix:
        os.makedirs(PLANS_DIR, exist_ok=True)
    out: dict[str, dict] = {}
    for name in specs:
        if only and not name.startswith(tuple(only)):
            continue
        sc = spark.sparkContext
        times = []
        try:
            for i in range(runs + 1):  # first run = warm-up, not timed
                sc.setJobDescription(f"{name} run{i}")
                t0 = time.monotonic()
                df = specs[name].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = time.monotonic() - t0
                if i > 0:
                    times.append(round(dt, 3))
                elif suffix:
                    with open(
                        os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w"
                    ) as f:
                        f.write(explain_str(df))
        except Exception as e:  # keep sweeping; record the failure
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        finally:
            sc.setJobDescription(None)
        out[name] = {"min": min(times), "runs": times}
        print(f"# {name}: {min(times)}s {times}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()
