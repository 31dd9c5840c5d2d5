"""Engine-parity A/B for headline movers (VERDICT r14 task 5).

When a headline query moves >10% beyond its published spread between
rounds, the question is always the same: did the ENGINE move, or the
host window? r14 answered it with an ad-hoc same-session A/B that
lived as prose in BASELINE.md; this makes it a reproducible artifact:

* the previous round's engine is materialized as a git worktree of
  that round's last commit (``--grep "round N:"`` — the verdict
  commit, i.e. the tree the judge graded);
* BOTH engines run the mover in fresh subprocess sessions,
  back-to-back on the same host window (warm-up run + timed runs,
  min published) — same isolation as bench.py's closing calibration;
* bench.py invokes this automatically (budget allowing) and
  publishes ``ab: {q, prev, cur, rev}`` in the JSON line; the judge
  can re-run it by hand:

    PYTHONPATH=/root/repo python3 tools/ab_prev.py q48_semi_stream_similarity
    PYTHONPATH=/root/repo python3 tools/ab_prev.py q33_semi_stream_cached_join <rev>

A prev/cur pair within mutual noise says "host window, engine
parity"; a pair that reproduces the move says "engine" — either way
the attribution is a number in the round's artifact, not archaeology.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _time_in_subprocess(
    tree: str, query: str, sf_dir: str, runs: int = 2, timeout: float = 240
) -> float:
    """min-of-``runs`` seconds for one registered query executed from
    ``tree`` in a fresh subprocess session (one extra warm-up run
    absorbs session JIT + memoized store builds)."""
    code = (
        "import sys,time;"
        f"sys.path.insert(0,{tree!r});"
        "from distributed_stream_processing_spark.plans import load_all;"
        "from distributed_stream_processing_spark.session import get_spark;"
        "spark=get_spark('bench-ab');specs=load_all();"
        f"fn=specs[{query!r}].fn;d={sf_dir!r};"
        "fn(spark,d).write.mode('overwrite').format('noop').save();"
        "ts=[]\n"
        f"for _ in range({runs}):\n"
        "    t0=time.monotonic()\n"
        "    fn(spark,d).write.mode('overwrite').format('noop').save()\n"
        "    ts.append(time.monotonic()-t0)\n"
        "print('AB_S=%.3f'%min(ts))"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=dict(os.environ),
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("AB_S="):
            return float(ln.split("=", 1)[1])
    raise RuntimeError(
        f"no AB_S from {tree} (rc={r.returncode}): {(r.stderr or '')[-300:]}"
    )


def prev_round_rev() -> tuple[int | None, str | None]:
    """(round, commit) of the latest recorded round: round from the
    newest BENCH_r{N}.json, commit from the last log entry mentioning
    'round N:' (the round's verdict commit — the graded tree)."""
    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    if not ns:
        return None, None
    n = max(ns)
    out = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H", "-1", f"--grep=round {n}:"],
        capture_output=True,
        text=True,
    )
    rev = out.stdout.strip().splitlines()[0] if out.stdout.strip() else None
    return n, rev


def run_ab(
    query: str,
    rev: str,
    sf_dir: str = "/root/testdata/sf0.1",
    runs: int = 2,
    timeout: float = 240,
) -> dict:
    """Time ``query`` on the previous engine (worktree of ``rev``) and
    the current tree, fresh subprocess each, same host window."""
    wt = tempfile.mkdtemp(prefix="abprev_")
    shutil.rmtree(wt)  # worktree add requires a nonexistent path
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, rev],
        check=True,
        capture_output=True,
    )
    try:
        prev_s = _time_in_subprocess(wt, query, sf_dir, runs, timeout)
        cur_s = _time_in_subprocess(REPO, query, sf_dir, runs, timeout)
        return {"prev": round(prev_s, 3), "cur": round(cur_s, 3), "rev": rev[:8]}
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        # a worktree of an old rev leaves a stale registration if the
        # directory was already gone; prune is idempotent
        subprocess.run(
            ["git", "-C", REPO, "worktree", "prune"], capture_output=True
        )


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    query = sys.argv[1]
    if len(sys.argv) > 2:
        rev = sys.argv[2]
    else:
        n, rev = prev_round_rev()
        if rev is None:
            print("no previous round found", file=sys.stderr)
            sys.exit(1)
        print(f"# previous round r{n} -> {rev[:8]}", file=sys.stderr)
    print(json.dumps({"q": query, **run_ab(query, rev)}))


if __name__ == "__main__":
    main()
