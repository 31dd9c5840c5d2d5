"""Engine-parity A/B for headline movers (VERDICT r14 task 5, r15 task 1).

When a headline query moves >10% beyond its published spread between
rounds, the question is always the same: did the ENGINE move, or the
host window? r15's answer was taken in an unflagged degraded window
and overstated the round's win ~3x (VERDICT r15), so the protocol is
now drift-resistant by construction:

* the previous round's engine is materialized as a git worktree of
  that round's verdict commit (the tree the judge graded);
* the legs run INTERLEAVED and SYMMETRIC — prev, cur, prev, cur —
  ≥2 legs per ENGINE, each a fresh subprocess session (warm-up +
  timed runs, min published). r16's asymmetric (prev, cur, prev)
  shape carried ONE cur leg: both prev legs could land in calm
  phases while the middle leg ate a slow phase, producing a
  false no-drift "regression" (BENCH_r16's q33 block read 7.0 vs
  13.0 s; three judge re-runs read -7%/+24%/parity — VERDICT r16
  item 1). Now a cross-engine verdict is published ONLY when each
  engine's own legs agree internally within 30%; otherwise the
  pair carries ``drift: 1`` and ``verdict: "window"`` (raw legs
  always included);
* every leg is bracketed by the CPU-speed probe (instruction rate)
  AND the IO/page-cache probe (timed warm re-read of a fixed file) —
  the two host-regime dimensions r15 established can degrade
  independently of each other and of steal accounting;
* bench.py invokes this automatically and publishes the compact
  ``ab`` block in the JSON line; the judge re-runs it by hand:

    PYTHONPATH=/root/repo python3 tools/ab_prev.py q48_semi_stream_similarity
    PYTHONPATH=/root/repo python3 tools/ab_prev.py q33_semi_stream_cached_join <rev>

``verdict: "parity"`` says the engines are indistinguishable inside
this host's demonstrated window noise; ``"cur_slower"/"cur_faster"``
is an engine claim that reproduced on both of each engine's legs;
``"window"`` says the host moved mid-A/B — either way the attribution
is numbers in the round's artifact, not archaeology.
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
) -> list[float]:
    """Timed seconds for ``runs`` executions of one registered query
    from ``tree`` in a fresh subprocess session (one extra warm-up run
    absorbs session JIT + memoized store builds). Returns the raw run
    list (caller publishes min AND the runs)."""
    code = (
        "import sys,time,json;"
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
        "    ts.append(round(time.monotonic()-t0,3))\n"
        "print('AB_RUNS='+json.dumps(ts))"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=dict(os.environ),
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("AB_RUNS="):
            return json.loads(ln.split("=", 1)[1])
    raise RuntimeError(
        f"no AB_RUNS from {tree} (rc={r.returncode}): {(r.stderr or '')[-300:]}"
    )


def prev_round_rev() -> tuple[int | None, str | None]:
    """(round, commit) of the newest round whose verdict commit exists
    in the log. Scans DOWN from max BENCH_r{N}: in post-round contexts
    the driver has already written BENCH_r{N}.json but the 'round N:'
    verdict commit doesn't exist yet (the judge hit exactly this —
    VERDICT r15 item 2), so the previous graded tree is the largest N
    whose commit IS in the log."""
    ns = sorted(
        {
            int(m.group(1))
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        },
        reverse=True,
    )
    for n in ns:
        out = subprocess.run(
            ["git", "-C", REPO, "log", "--format=%H", "-1", f"--grep=round {n}:"],
            capture_output=True,
            text=True,
        )
        if out.stdout.strip():
            return n, out.stdout.strip().splitlines()[0]
    return None, None


def adjudicate(
    prev_legs: list[float], cur_legs: list[float]
) -> tuple[bool, str]:
    """(drift, verdict) for a symmetric leg set. A cross-engine claim
    requires BOTH engines' own legs to agree internally within 30%
    (max-min over min leg); otherwise the window moved mid-A/B →
    ``(True, "window")``. With both engines internally steady, a
    min-leg delta >30% is an engine claim ("cur_slower"/"cur_faster");
    <=30% is "parity" — inside this host's demonstrated window noise
    (judge q33 re-runs spanned -7%..+24% on identical trees,
    VERDICT r16 item 1)."""

    def _agree(xs: list[float]) -> bool:
        return len(xs) >= 2 and max(xs) - min(xs) <= 0.3 * min(xs)

    if not (_agree(prev_legs) and _agree(cur_legs)):
        return True, "window"
    delta = (min(cur_legs) - min(prev_legs)) / min(prev_legs)
    if abs(delta) <= 0.3:
        return False, "parity"
    return False, "cur_slower" if delta > 0 else "cur_faster"


def run_ab(
    query: str,
    rev: str,
    sf_dir: str = "/root/testdata/sf0.1",
    runs: int = 2,
    timeout: float = 240,
    deadline: float | None = None,
) -> dict:
    """SYMMETRIC interleaved A/B of ``query``: prev, cur, prev, cur —
    two legs per ENGINE (worktree of ``rev`` vs the current tree),
    fresh subprocess each, same host window, the whole sequence
    bracketed by the CPU/IO/load probes with per-leg CPU+load
    readings between legs.

    Published numbers: min over each engine's legs, every raw leg,
    the probe series, per-engine internal leg agreement, and a
    ``verdict``: "parity" / "cur_slower" / "cur_faster" ONLY when
    BOTH engines' own legs agree internally within 30% (min-leg
    delta >30% between engines = a claim; <=30% = parity inside this
    host's demonstrated window noise); otherwise ``drift: 1`` and
    ``verdict: "window"`` — the window moved mid-A/B and the pair is
    context, not evidence. The r16 protocol's single cur leg could
    not make this distinction (VERDICT r16 item 1).

    ``deadline`` (r18, ADVICE r17): on a throttled host 4 legs x
    (startup + per-leg timeout) can run past 2x the caller's
    reservation and squeeze every section behind the A/B. Once the
    deadline passes AND at least one leg per engine has run, the
    remaining legs are dropped and the pair publishes ``partial: 1``
    with ``verdict: "window"`` — an asymmetric leg set is context,
    never an engine claim (the r16 lesson)."""
    import time as _time

    import bench  # repo-root module; probes shared with the JSON line

    wt = tempfile.mkdtemp(prefix="abprev_")
    shutil.rmtree(wt)  # worktree add requires a nonexistent path
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, rev],
        check=True,
        capture_output=True,
    )
    try:
        cpu: list[float] = [round(bench._cpu_probe(), 2)]
        io: list[float] = [round(bench._io_probe(), 3)]
        lavg: list[float] = [round(bench._loadavg(), 1)]
        legs: list[tuple[str, list[float]]] = []
        partial = False
        for engine, tree in (
            ("prev", wt),
            ("cur", REPO),
            ("prev", wt),
            ("cur", REPO),
        ):
            if (
                deadline is not None
                and _time.monotonic() > deadline
                and len(legs) >= 2  # >=1 leg per engine (prev, cur, ...)
            ):
                partial = True
                break
            legs.append(
                (engine, _time_in_subprocess(tree, query, sf_dir, runs, timeout))
            )
            cpu.append(round(bench._cpu_probe(), 2))
            lavg.append(round(bench._loadavg(), 1))
        io.append(round(bench._io_probe(), 3))
        prev_legs = [min(t) for e, t in legs if e == "prev"]
        cur_legs = [min(t) for e, t in legs if e == "cur"]
        if partial:
            # a truncated, asymmetric leg set can't support a claim
            drift, verdict = True, "window"
        else:
            drift, verdict = adjudicate(prev_legs, cur_legs)
        return {
            "prev": round(min(prev_legs), 3),
            "cur": round(min(cur_legs), 3),
            "verdict": verdict,
            "legs": [[e] + t for e, t in legs],
            "cpu": cpu,
            "io": io,
            "load": lavg,
            **({"drift": 1} if drift else {}),
            **({"partial": 1} if partial else {}),
            "rev": rev[:8],
        }
    finally:
        # a PREV-engine leg built from a pre-r18 rev persists its q48
        # index beside the driver's parquet inputs (the os.access(W_OK)
        # bug fixed in olap_plans this round runs as root, where the
        # check is always true) — sweep it so an A/B invocation leaves
        # no cross-run precomputation under the data dir
        for leftover in ("q48store",) + tuple(
            n
            for n in (os.listdir(sf_dir) if os.path.isdir(sf_dir) else ())
            if n.startswith(("q48store.tmp.", "q48store.stale."))
        ):
            shutil.rmtree(os.path.join(sf_dir, leftover), ignore_errors=True)
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
