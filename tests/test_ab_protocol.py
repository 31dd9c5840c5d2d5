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
