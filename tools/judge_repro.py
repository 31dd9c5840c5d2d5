"""One-command judge reproduction (VERDICT r15 task 7).

Reruns the round's quotable evidence with the same isolation the
bench protocol uses and prints one comparison table:

* host probes (CPU instruction rate + warm page-cache IO) before and
  after every section, against the committed envelopes;
* a headline subset (fresh warm-session timings, min-of-2);
* the 100x points (q33_100x, q48_100x — saved stores, probe-
  bracketed; dedup_100x — fresh isolated subprocess with the r18
  partial-checkpoint salvage);
* the engine-parity A/B of a chosen query vs the previous round's
  verdict commit (tools/ab_prev.py — interleaved prev,cur,prev legs).

Usage:
    PYTHONPATH=/root/repo python3 tools/judge_repro.py            # everything
    PYTHONPATH=/root/repo python3 tools/judge_repro.py --quick    # headline + probes
    PYTHONPATH=/root/repo python3 tools/judge_repro.py --ab q48_semi_stream_similarity

Every number is also echoed as one JSON line at the end for diffing
against BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402  (probes + 100x sections)

HEADLINE_SUBSET = [
    "q01_pricing_summary",
    "q16_similarity_self_join",
    "q26_ann_topk",
    "q29_subseq_match_ed",
    "q33_semi_stream_cached_join",
    "q48_semi_stream_similarity",
]


def _probes() -> dict:
    return {
        "cpu": round(bench._cpu_probe(), 3),
        "io": round(bench._io_probe(), 3),
        "load": round(bench._loadavg(), 1),
    }


def main() -> None:
    args = sys.argv[1:]
    quick = "--quick" in args
    ab_q = None
    if "--ab" in args:
        ab_q = args[args.index("--ab") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict = {"probes": {"open": _probes()}}
    print(
        f"# envelopes: cpu {bench.CPU_IDLE_S}s, io {bench.IO_IDLE_S}s, "
        f"cal {bench.CAL_IDLE_S}s",
    )
    print(f"# open probes: {out['probes']['open']}")

    from distributed_stream_processing_spark.plans import load_all
    from distributed_stream_processing_spark.session import get_spark

    spark = get_spark("judge-repro")
    specs = load_all()

    # headline subset, min-of-2 after one warm-up (the bench's steady
    # protocol at reduced run count — this is a repro, not the record)
    rows = []
    for name in HEADLINE_SUBSET:
        bench._gc_level(spark)
        bench._run_noop(spark, specs, name, sf_dir)
        t = min(
            bench._run_noop(spark, specs, name, sf_dir),
            bench._run_noop(spark, specs, name, sf_dir),
        )
        rows.append((name, round(t, 3)))
        print(f"# {name}: {t:.3f}s (warm min-of-2)")
    out["headline"] = dict(rows)
    out["probes"]["post_headline"] = _probes()
    print(f"# post-headline probes: {out['probes']['post_headline']}")

    if not quick:
        try:
            out["q33_100x"] = bench._q33_100x(spark)
            print(f"# q33_100x: {out['q33_100x']}")
        except Exception as e:
            print(f"# q33_100x failed: {e}")
        out["probes"]["post_q33"] = _probes()
        try:
            from tools.gen_stress_sf1 import ensure_dedup_100x

            out["q48_100x"] = bench._q48_100x(spark, ensure_dedup_100x())
            print(f"# q48_100x: {out['q48_100x']}")
        except Exception as e:
            print(f"# q48_100x failed: {e}")
        out["probes"]["post_q48"] = _probes()
        print(f"# post-100x probes: {out['probes']['post_q48']}")
        # dedup_100x — the axis starved since r15; same fresh-process
        # isolation + cap + r18 partial-checkpoint salvage the bench
        # uses, so a cap kill still reports what the window measured
        try:
            out["dedup_100x"] = bench._dedup_100x_isolated(200) or {
                "attempted": 1,
                "timeout": 1,
            }
            print(f"# dedup_100x: {out['dedup_100x']}")
        except Exception as e:
            print(f"# dedup_100x failed: {e}")
        out["probes"]["post_dedup"] = _probes()
        print(f"# post-dedup probes: {out['probes']['post_dedup']}")

    if ab_q or not quick:
        try:
            from tools.ab_prev import prev_round_rev, run_ab

            n, rev = prev_round_rev()
            if rev:
                q = ab_q or "q48_semi_stream_similarity"
                out["ab"] = {"q": q, "prev_round": n, **run_ab(q, rev, sf_dir, runs=1)}
                print(f"# ab vs r{n}: {out['ab']}")
        except Exception as e:
            print(f"# ab failed: {e}")

    out["probes"]["close"] = _probes()
    print(f"# close probes: {out['probes']['close']}")

    # comparison vs the latest recorded bench line
    try:
        import glob
        import re

        latest = max(
            glob.glob(os.path.join(REPO, "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        with open(latest) as f:
            rec = json.load(f)
        rec = rec.get("parsed", rec)
        print(f"\n# vs {os.path.basename(latest)}:")
        print(f"# {'query':<34}{'repro':>9}{'record':>9}")
        for name, t in out["headline"].items():
            r = (rec.get("queries") or {}).get(name)
            print(f"# {name:<34}{t:>9.3f}{(r if r is not None else float('nan')):>9.3f}")
    except Exception as e:
        print(f"# record comparison skipped: {e}")
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
