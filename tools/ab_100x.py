"""Same-window, same-saved-store engine A/B at the q48 100x point
(VERDICT r15 task 1 — the axis whose r15 table did not reproduce).

Runs the q48_100x steady-batch measurement on N git revs (worktrees)
plus the current tree, INTERLEAVED (first rev repeated last, so
mid-A/B window drift is visible), each leg a fresh subprocess loading
the SAME saved v5 store; every leg bracketed by the CPU and IO
probes. Prints one JSON line with all raw legs.

    PYTHONPATH=/root/repo python3 tools/ab_100x.py 7b9b950 8372e28
    # -> legs: [r14, r15, CUR, r14] in that order

The per-leg protocol mirrors bench._q48_100x's committed shape: load
the saved store, one warm-up batch (id class 0), two timed steady
batches (classes 1 >= 10k and 501 — planted exact dups, all fresh
misses), then the b10 reference-regime batch (class 1 < 10k). APIs
used (load_similarity_store / process_batch / flush_attribution)
exist unchanged since r14, so any r14+ rev is comparable.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

STORE = os.path.join(REPO, ".stressdata", "stress100x")

_LEG_CODE = """
import sys, time, json
sys.path.insert(0, {tree!r})
from fractions import Fraction
from pyspark.sql import functions as F
from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.functions.text import tokens
from distributed_stream_processing_spark.operators import semi_stream_similarity as sss
spark = get_spark('ab100x')
t = Fraction(3, 4)
t0 = time.monotonic()
j = sss.load_similarity_store(spark, {store!r} + '/q48store', t)
load_s = round(time.monotonic() - t0, 3)
docs = spark.read.parquet({store!r} + '/documents.parquet')
base = docs.select(F.col('doc_id').alias('id'), tokens('text').alias('tokens'))
def probe(cls, lo=0):
    return base.filter((F.col('id') % 10 < 3) & (F.col('id') % 1000 == cls)
                       & (F.col('id') >= lo))
t0 = time.monotonic()
j.process_batch(probe(0), 0).count()
j.flush_attribution()
warm_s = round(time.monotonic() - t0, 3)
runs, outs = [], []
for b, (cls, lo) in enumerate(((1, 10_000), (501, 0)), start=1):
    t0 = time.monotonic()
    outs.append(j.process_batch(probe(cls, lo), b).count())
    j.flush_attribution()
    runs.append(round(time.monotonic() - t0, 3))
small = base.filter((F.col('id') % 10 < 3) & (F.col('id') % 1000 == 1)
                    & (F.col('id') < 10_000))
t0 = time.monotonic()
b10_out = j.process_batch(small, 3).count()
j.flush_attribution()
b10_s = round(time.monotonic() - t0, 3)
assert min(outs) > 0 and b10_out > 0
print('AB100X=' + json.dumps({{'load': load_s, 'warm': warm_s, 'runs': runs,
                               'batch': min(runs), 'b10': b10_s,
                               'out': min(outs), 'b10_out': b10_out}}))
"""


def _leg(tree: str, timeout: float = 900) -> dict:
    code = _LEG_CODE.format(tree=tree, store=STORE)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout,
        env=dict(os.environ),
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("AB100X="):
            return json.loads(ln.split("=", 1)[1])
    raise RuntimeError(
        f"no AB100X from {tree} (rc={r.returncode}): {(r.stderr or '')[-400:]}"
    )


def main() -> None:
    import bench

    revs = sys.argv[1:]
    if not revs:
        print(__doc__)
        sys.exit(2)
    trees: list[tuple[str, str]] = []
    wts = []
    try:
        for rev in revs:
            wt = tempfile.mkdtemp(prefix=f"ab100x_{rev[:7]}_")
            shutil.rmtree(wt)
            subprocess.run(
                ["git", "-C", REPO, "worktree", "add", "--detach", wt, rev],
                check=True, capture_output=True,
            )
            wts.append(wt)
            trees.append((rev[:8], wt))
        trees.append(("CUR", REPO))
        trees.append((revs[0][:8] + "#2", wts[0]))  # drift detector
        legs = []
        for label, tree in trees:
            probes = {
                "cpu": round(bench._cpu_probe(), 2),
                "io": round(bench._io_probe(), 3),
                "load": round(bench._loadavg(), 1),
            }
            res = _leg(tree)
            legs.append({"rev": label, **probes, **res})
            print(f"# {label}: {legs[-1]}", file=sys.stderr)
        print(json.dumps({"point": "q48_100x", "legs": legs}))
    finally:
        for wt in wts:
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", wt],
                capture_output=True,
            )
        subprocess.run(["git", "-C", REPO, "worktree", "prune"],
                       capture_output=True)


if __name__ == "__main__":
    main()
