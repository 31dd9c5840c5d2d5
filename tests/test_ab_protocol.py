"""Pins for the symmetric engine-A/B adjudication (VERDICT r16 task 1).

BENCH_r16's asymmetric (prev, cur, prev) interleave published a
no-drift 1.86x q33 "regression" that three judge re-runs could not
reproduce (-7%/+24%/parity): with ONE cur leg, both prev legs landing
in calm phases while the middle leg eats a slow phase is
indistinguishable from an engine regression. The r17 protocol is
symmetric — >=2 legs per engine — and a cross-engine verdict requires
each engine's own legs to agree internally within 30%. These tests
pin the adjudication table, including the exact r16 failure shape.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.ab_prev import adjudicate  # noqa: E402


def test_parity_when_both_engines_steady_and_close():
    drift, verdict = adjudicate([7.0, 7.5], [7.2, 7.6])
    assert (drift, verdict) == (False, "parity")


def test_engine_regression_requires_internal_agreement_on_both_sides():
    # both engines internally steady, cur min 2x prev min -> a claim
    drift, verdict = adjudicate([7.0, 7.2], [14.0, 14.5])
    assert (drift, verdict) == (False, "cur_slower")
    drift, verdict = adjudicate([14.0, 14.5], [7.0, 7.2])
    assert (drift, verdict) == (False, "cur_faster")


def test_r16_failure_shape_reads_window_not_regression():
    # the exact BENCH_r16 q33 block, completed with the second cur leg
    # the old protocol never ran: had cur's legs disagreed (slow phase
    # on one leg), the pair must adjudicate as window drift — not the
    # no-drift 1.86x regression r16 committed
    drift, verdict = adjudicate([7.586, 7.017], [13.033, 7.4])
    assert (drift, verdict) == (True, "window")


def test_prev_leg_disagreement_still_flags_drift():
    drift, verdict = adjudicate([7.0, 12.0], [8.0, 8.1])
    assert (drift, verdict) == (True, "window")


def test_boundary_thirty_percent_is_parity_not_claim():
    # delta exactly 30% stays parity (claims need to EXCEED the
    # demonstrated window-noise band)
    drift, verdict = adjudicate([10.0, 10.0], [13.0, 13.0])
    assert (drift, verdict) == (False, "parity")


def _fat_payload() -> dict:
    return {
        "metric": "headline_queries_total",
        "queries": {f"q{i:02d}_{'x' * 22}": 1.234 for i in range(10)},
        "spread_s": {f"q{i:02d}": 0.123 for i in range(10)},
        "cal": [2.3, 2.1], "cpu": [0.14, 0.15],
        "io": [0.01, 0.01], "load": [2.0, 9.1],
        "ab": {
            "q": "q33", "prev": 6.068, "cur": 5.773, "verdict": "parity",
            "legs": [["prev", 6.58], ["cur", 6.68], ["prev", 6.92],
                     ["cur", 7.88]],
            "cpu": [0.17, 0.13, 0.13, 0.14, 0.14],
            "io": [0.009, 0.008],
            "load": [0.8, 1.4, 4.7, 3.4, 3.0], "rev": "abcd1234",
        },
        "sf": 0.1, "runs": 3, "rot": 1,
        "ctl": {"q33": "3/4", "q48": "2/3"},
        "sf1_stress": {
            "queries": {
                q: {"1x": {"min": 5.3, "runs": [5.3, 6.9]},
                    "10x": {"min": 6.2, "runs": [7.4, 6.2, 6.3]}}
                for q in ("q21", "q29", "q48")
            },
            "data_ratio": 10.0,
            "ratio_10x": {"q21": 2.7, "q29": 1.4, "q48": 1.3},
            "q48_cand_1x_10x": [7789, 206930],
            "q48_pairs_1x_10x": [79, 785],
            "scheme_audit": {"pairs_chosen": 7789, "pairs_eq": 273149,
                             "eq_over_chosen": 35.07,
                             "probe_rows_raw": 107824,
                             "probe_rows_chosen": 64867},
            "q48_100x": {"load_s": 47.6, "batch_s": 15.3,
                         "batch_runs": [15.3, 19.2], "b10_s": 6.1,
                         "b10_runs": [6.2, 6.1], "cand": 67139,
                         "out_rows": 490, "stored_docs": 350000,
                         "probe_docs": 490},
            "q33_100x": {"load_s": 9.0, "batch_s": 5.1,
                         "batch_runs": [5.5, 5.1], "fetch_share": 0.29},
            "dedup_100x": {"pairs_s": 136.5,
                           "pairs_runs": [136.5, 162.1],
                           "cluster_s": 11.0,
                           "n_pairs": 10969, "rounds": 3,
                           "kept": 489242, "isolated": 1,
                           "partial": 1},
        },
    }


def test_line_self_trims_under_budget_and_keeps_quotables():
    """The bench JSON line must fit the driver's tail capture even
    when a rotation round carries every 100x section plus the 4-leg
    ab block (r6 lost the round's headline to an oversized line).
    The trim must drop only raw-runs/probe detail — every quotable
    number (mins, verdict, counts, ratios) survives."""
    import json

    from bench import LINE_BUDGET, _shrink_line

    payload = _fat_payload()
    assert len(json.dumps(payload, separators=(",", ":"))) > LINE_BUDGET
    line, full = _shrink_line(payload)
    assert full is not None and len(full) > LINE_BUDGET
    assert len(line) <= LINE_BUDGET
    out = json.loads(line)
    assert out["trim"]  # records what was dropped
    # quotables intact
    assert out["ab"]["verdict"] == "parity"
    assert out["ab"]["prev"] == 6.068 and out["ab"]["cur"] == 5.773
    assert out["sf1_stress"]["ratio_10x"] == {"q21": 2.7, "q29": 1.4,
                                              "q48": 1.3}
    assert out["sf1_stress"]["q48_100x"]["batch_s"] == 15.3
    assert out["sf1_stress"]["dedup_100x"]["pairs_s"] == 136.5
    # the salvage tags survive the trim; only raw runs drop
    assert out["sf1_stress"]["dedup_100x"]["partial"] == 1
    assert "pairs_runs" not in out["sf1_stress"]["dedup_100x"]
    assert out["sf1_stress"]["q33_100x"]["batch_s"] == 5.1
    for q in ("q21", "q29", "q48"):
        assert out["sf1_stress"]["queries"][q]["10x"]["min"]


def test_line_under_budget_is_untouched():
    from bench import _shrink_line

    small = {"metric": "headline_queries_total", "queries": {"q01": 1.0}}
    line, full = _shrink_line(small)
    assert full is None and "trim" not in line


def test_run_ab_deadline_publishes_partial_window(monkeypatch):
    """ADVICE r17: 4 legs x (startup + leg timeout) can exceed 2x the
    caller's reservation on a throttled host. With a deadline, run_ab
    drops remaining legs once >=1 leg per engine has run and the pair
    publishes partial/window — never an engine claim."""
    import time

    import tools.ab_prev as ab_prev

    calls = []

    def fake_leg(tree, query, sf_dir, runs, timeout):
        calls.append(tree)
        return [1.0]

    monkeypatch.setattr(ab_prev, "_time_in_subprocess", fake_leg)
    out = ab_prev.run_ab(
        "q48_semi_stream_similarity", "HEAD", runs=1,
        deadline=time.monotonic() - 1,  # already exhausted
    )
    assert len(calls) == 2, "must still run one leg per engine"
    assert out["partial"] == 1 and out["verdict"] == "window"
    assert out.get("drift") == 1
    assert len(out["legs"]) == 2


def test_run_ab_without_deadline_runs_all_legs(monkeypatch):
    import tools.ab_prev as ab_prev

    calls = []
    monkeypatch.setattr(
        ab_prev,
        "_time_in_subprocess",
        lambda tree, q, d, r, t: (calls.append(tree) or [2.0]),
    )
    out = ab_prev.run_ab("q48_semi_stream_similarity", "HEAD", runs=1)
    assert len(calls) == 4 and "partial" not in out
    assert out["verdict"] == "parity"


def test_trim_records_only_steps_that_removed_payload():
    """ADVICE r17: a payload with NO ab block and NO 100x sections
    must not publish 'ab_probes'/'ab_legs'/'100x_runs' in its trim
    key — the artifact would claim detail was dropped that never
    existed."""
    import json

    from bench import LINE_BUDGET, _shrink_line

    # oversized via stress runs only: no ab block, no 100x sections
    payload = {
        "metric": "headline_queries_total",
        "queries": {f"q{i:02d}_{'y' * 30}": 1.234 for i in range(14)},
        "sf1_stress": {
            "queries": {
                f"q{i}": {
                    "1x": {"min": 5.3, "runs": [5.312, 6.918, 5.402]},
                    "10x": {"min": 6.2, "runs": [7.403, 6.201, 6.317]},
                }
                for i in range(12)
            },
            "ratio_10x": {f"q{i}": 1.2 for i in range(12)},
        },
    }
    assert len(json.dumps(payload, separators=(",", ":"))) > LINE_BUDGET
    line, full = _shrink_line(payload)
    assert full is not None
    out = json.loads(line)
    trims = out.get("trim", [])
    assert "stress_runs" in trims
    for phantom in ("ab_probes", "ab_legs", "100x_runs"):
        assert phantom not in trims, f"phantom trim step: {trims}"


def test_stress_point_bad_window_gets_one_retry(monkeypatch):
    """VERDICT r17 task 7: a stress point whose bracketing probes were
    bad is re-run ONCE at the queue tail; a clean retry replaces the
    point's verdict so one degraded phase no longer nulls the whole
    ratio_10x axis (two of three ratios were null in BENCH_r17)."""
    import time as _time

    import bench

    # scripted probe series: opening probe + one per point. The 5th
    # reading (after the first 10x point) is BAD — it brackets both
    # that point and the next, so BOTH get retried with clean probes.
    seq = iter([1.0, 1.0, 1.0, 1.0, 50.0] + [1.0] * 20)
    probe_calls = []

    def fake_probe(spark, specs, sf_dir):
        p = next(seq)
        probe_calls.append(p)
        return p

    def fake_run_noop(spark, specs, name, d):
        return 8.0 if "10x" in d else 5.0

    monkeypatch.setattr(bench, "_probe", fake_probe)
    monkeypatch.setattr(bench, "_run_noop", fake_run_noop)
    monkeypatch.setattr(bench, "_gc_level", lambda s: None)
    monkeypatch.setattr(bench, "_q48_split", lambda s, d: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    import tools.gen_stress_sf1 as gen

    monkeypatch.setattr(
        gen, "ensure_stress",
        lambda base_dir=None: {"stress1x": "/tmp/f1x", "stress10x": "/tmp/f10x"},
    )
    monkeypatch.setattr(bench, "_CAL0", None)

    skipped, reasons = [], []
    out = bench._run_stress(
        None, None, "/tmp/sf", _time.monotonic() + 1000, skipped, reasons
    )
    # every ratio publishes: the bad window's two points were retried
    # under clean probes and their verdicts replaced
    assert all(v is not None for v in out["ratio_10x"].values()), (
        out["ratio_10x"], reasons,
    )
    assert not [r for r in reasons if r.startswith("win:")], reasons
    assert out["_strict_bad"] == set()
    # exactly two retries happened (the two points the bad probe
    # bracketed): 1 opening + 6 points + 2 retries = 9 probe calls
    assert len(probe_calls) == 9, probe_calls


def test_100x_sections_are_reexports_not_forks():
    """r18 extracted the three 100x measurement procedures into
    tools/bench_100x.py with bench re-exporting them so
    ``bench._q48_100x`` stays the stable entry point for
    tools/judge_repro.py and the isolated-subprocess code strings.
    Pin the aliasing: if a future edit redefines one inside bench.py,
    the two copies would silently diverge."""
    import bench
    from tools import bench_100x

    for name in ("_q48_100x", "_q33_100x", "_dedup_100x", "_dedup_100x_isolated"):
        assert getattr(bench, name) is getattr(bench_100x, name), name


def test_ab_defers_only_for_owed_points_in_flagged_open_window():
    """r18: the engine A/B runs first (r15 task 1) unless this
    artifact OWES a starved 100x point AND the opening probes flagged
    the window — then the owed points outrank it and the A/B runs at
    the tail under its hard deadline. Per-section flags appended later
    (win:/spread:) must not trigger deferral."""
    import bench

    assert bench._defer_ab(True, ["cal_start"])
    assert bench._defer_ab(True, ["load_high", "win:q21_1x"])
    assert not bench._defer_ab(True, [])  # calm open window: A/B first
    assert not bench._defer_ab(False, ["cal_start", "io_slow"])  # nothing owed
    assert not bench._defer_ab(True, ["win:q21_1x", "spread:q34"])


def test_owed_dedup_skips_doomed_full_attempt():
    """r18 dry run: with ~60s of stress budget left, the FULL isolated
    dedup subprocess launched with an internal deadline of +15s — a
    guaranteed timeout that burned the whole window. An OWED point now
    goes straight to the reduced fallback below the viability floor;
    non-priority rounds keep the old clamp-bounded behavior."""
    import bench

    assert not bench._dedup_full_attempt_viable(60, priority=True)
    assert bench._dedup_full_attempt_viable(
        bench.DEDUP_FULL_FLOOR_S + 1, priority=True
    )
    assert bench._dedup_full_attempt_viable(60, priority=False)


def test_dedup_stdout_parse_last_checkpoint_wins():
    """r18 timeout salvage: the dedup subprocess emits a flushed
    DEDUP_JSON checkpoint after every completed timed run; the parser
    takes the LAST complete line (most-complete point), tolerates
    bytes output (subprocess.TimeoutExpired captures raw bytes even
    under text=True), and skips a line truncated by the kill."""
    from tools.bench_100x import _parse_dedup_stdout

    out = (
        "noise\n"
        'DEDUP_JSON={"pairs_s": 30.0, "partial": 1, "reduced": 1}\n'
        'DEDUP_JSON={"pairs_s": 26.5, "partial": 1, "reduced": 1}\n'
    )
    assert _parse_dedup_stdout(out)["pairs_s"] == 26.5
    assert _parse_dedup_stdout(out.encode())["pairs_s"] == 26.5
    truncated = out + 'DEDUP_JSON={"pairs_s": 25.'
    assert _parse_dedup_stdout(truncated)["pairs_s"] == 26.5
    assert _parse_dedup_stdout(None) is None
    assert _parse_dedup_stdout("no markers here") is None


def test_dedup_isolated_salvages_partial_on_timeout(monkeypatch):
    """A cap kill must not discard measurements the subprocess already
    took (the r18 dry runs lost a finished pairs run twice): on
    TimeoutExpired, the wrapper returns the last emitted checkpoint."""
    import subprocess

    from tools import bench_100x

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(
            cmd="x",
            timeout=130,
            output=b'DEDUP_JSON={"pairs_s": 28.1, "pairs_runs": [28.1],'
            b' "n_pairs": 10969, "n_docs": 500000, "partial": 1,'
            b' "reduced": 1}\n',
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench_100x._dedup_100x_isolated(130, reduced=True)
    assert out is not None and out["pairs_s"] == 28.1 and out["partial"] == 1
