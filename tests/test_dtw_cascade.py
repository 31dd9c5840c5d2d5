"""DTW lower-bound cascade (LB_Kim -> query Keogh -> data Keogh ->
banded DTW with cumulative-bound abandon; DtwUtils.java:149-338
parity): admissibility property tests + pruning-power counters.

Driver-side numpy tests — the distributed path is covered by
test_subsequence_match.py (bit-equality vs brute force) and the q31
oracle gate, which runs UNPRUNED DTW on every window, so any
inadmissible bound would hash-mismatch there too.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_stream_processing_spark.operators.subsequence_match import (
    _keogh_contrib,
    _lb_keogh,
    _lb_kim,
    dtw_cascade_dist,
)


def dtw_ref(x: np.ndarray, q: np.ndarray, rho: int) -> float:
    """Unpruned banded DTW (the q31 oracle's recurrence)."""
    m = len(q)
    D = np.full((m + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, m + 1):
        for j in range(max(1, i - rho), min(m, i + rho) + 1):
            d = (x[i - 1] - q[j - 1]) ** 2
            D[i, j] = d + min(D[i - 1, j], D[i - 1, j - 1], D[i, j - 1])
    return math.sqrt(D[m, m])


def envelopes(q: np.ndarray, rho: int) -> tuple[np.ndarray, np.ndarray]:
    m = len(q)
    lo = np.array([q[max(0, j - rho) : j + rho + 1].min() for j in range(m)])
    hi = np.array([q[max(0, j - rho) : j + rho + 1].max() for j in range(m)])
    return lo, hi


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    m=st.integers(2, 24),
    rho=st.integers(0, 4),
    eps=st.floats(0.1, 6.0),
)
def test_cascade_admissible(seed: int, m: int, rho: int, eps: float):
    """A window with true banded DTW <= eps is NEVER pruned, and any
    finite cascade distance equals the unpruned DP exactly."""
    rng = np.random.RandomState(seed)
    n = m + 20
    arr = np.round(rng.randn(n).cumsum(), 2)
    q = arr[5 : 5 + m].copy()
    lo_env, hi_env = envelopes(q, rho)
    eps2 = eps * eps
    for s in range(n - m + 1):
        x = arr[s : s + m]
        w_lo, w_hi = envelopes(x, rho)
        got = dtw_cascade_dist(x, q, rho, eps2, lo_env, hi_env, w_lo, w_hi)
        want = dtw_ref(x, q, rho)
        if want <= eps:
            assert math.isfinite(got), (s, want, eps)
            assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)
        if math.isfinite(got):
            assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000), m=st.integers(6, 20), rho=st.integers(0, 4))
def test_lb_kim_and_keogh_are_lower_bounds(seed: int, m: int, rho: int):
    rng = np.random.RandomState(seed)
    x = rng.randn(m) * 2
    q = rng.randn(m) * 2
    true = dtw_ref(x, q, rho) ** 2
    assert _lb_kim(x, q, np.inf) <= true + 1e-9
    lo_env, hi_env = envelopes(q, rho)
    assert _lb_keogh(x, lo_env, hi_env) <= true + 1e-9
    # data-side: q against the window's envelope
    w_lo, w_hi = envelopes(x, rho)
    assert float(_keogh_contrib(q, w_lo, w_hi).sum()) <= true + 1e-9


def _run_cascade(arr: np.ndarray, q: np.ndarray, rho: int, eps: float):
    """Cascade over every window of ``arr`` with the production
    chunk-style data envelope; returns (survivors, counters,
    keogh_only_evals) where keogh_only_evals is the DTW count the
    round-3/4 engine (query-side Keogh only) would have paid."""
    n, m = len(arr), len(q)
    eps2 = eps * eps
    lo_env, hi_env = envelopes(q, rho)
    ser = pd.Series(arr)
    u_env_c = ser.rolling(2 * rho + 1, min_periods=1, center=True).max().to_numpy()
    l_env_c = ser.rolling(2 * rho + 1, min_periods=1, center=True).min().to_numpy()
    counters: dict = {}
    survivors = {}
    keogh_only_evals = 0
    for s in range(n - m + 1):
        x = arr[s : s + m]
        if _lb_keogh(x, lo_env, hi_env) <= eps2:
            keogh_only_evals += 1
        d = dtw_cascade_dist(
            x, q, rho, eps2, lo_env, hi_env,
            l_env_c[s : s + m], u_env_c[s : s + m], counters=counters,
        )
        if d * d <= eps2:
            survivors[s] = round(d, 6)
    return survivors, counters, keogh_only_evals


def test_cascade_on_planted_random_walk():
    """Planted-pattern fixture (test_subsequence_match's shape):
    identical survivors, no extra DTW evaluations, and LB_Kim kills
    the bulk of windows in O(1) before any O(m) bound runs."""
    rng = random.Random(5)
    vals, xacc = [], 0.0
    n, m = 3000, 60
    for _ in range(n):
        xacc += rng.gauss(0, 1)
        vals.append(round(xacc, 2))
    for i in range(m):
        vals[2000 + i] = round(vals[500 + i] + rng.gauss(0, 0.05), 2)
    arr = np.array(vals)
    q = arr[500 : 500 + m].copy()
    survivors, counters, keogh_only = _run_cascade(arr, q, rho=3, eps=4.0)
    assert {500, 2000} <= set(survivors)
    assert counters["dtw_evals"] <= keogh_only
    # O(1) LB_Kim carries ~99% of the pruning on this shape
    assert counters["kim_pruned"] > 0.9 * (n - m + 1 - keogh_only)


def test_batch_cascade_matches_scalar_for_single_point_query():
    """m == 1 endpoint guard (ADVICE r18): the batched LB_Kim summed
    (x0-q0)^2 twice for a one-point query — a window with
    eps2/2 < d2 <= eps2 was falsely pruned while the scalar cascade
    (via _lb_kim's m < 2 -> 0.0) kept it. Batch must equal scalar for
    every window at m in {1, 2}."""
    from distributed_stream_processing_spark.operators.subsequence_match import (
        dtw_cascade_batch,
    )

    rng = np.random.RandomState(11)
    arr = np.round(rng.randn(50), 2)
    for m in (1, 2):
        q = arr[3 : 3 + m].copy()
        rho, eps = 0, 1.0
        eps2 = eps * eps
        lo_env, hi_env = envelopes(q, rho)
        X = np.lib.stride_tricks.sliding_window_view(arr, m)
        ser = pd.Series(arr)
        u_env = ser.rolling(2 * rho + 1, min_periods=1, center=True).max().to_numpy()
        l_env = ser.rolling(2 * rho + 1, min_periods=1, center=True).min().to_numpy()
        WL = np.lib.stride_tricks.sliding_window_view(l_env, m)
        WU = np.lib.stride_tricks.sliding_window_view(u_env, m)
        got = dtw_cascade_batch(
            np.ascontiguousarray(X), q, rho, eps2, lo_env, hi_env, WL, WU
        )
        for s in range(len(X)):
            want = dtw_cascade_dist(
                X[s], q, rho, eps2, lo_env, hi_env, WL[s], WU[s]
            )
            if math.isfinite(want):
                assert got[s] == want, (m, s)
            else:
                assert not math.isfinite(got[s]), (m, s)
        # the regression shape itself: at m=1 a window with
        # eps2/2 < (x-q)^2 <= eps2 must survive
        if m == 1:
            mid = np.flatnonzero(
                ((X[:, 0] - q[0]) ** 2 > eps2 / 2)
                & ((X[:, 0] - q[0]) ** 2 <= eps2)
            )
            assert len(mid) > 0 and np.isfinite(got[mid]).all()


def test_cascade_prunes_more_than_keogh_alone():
    """Strictly fewer full-DTW evaluations than query-side LB_Keogh
    alone: near-constant windows sit inside an oscillating query's
    envelope (query-side bound 0) while the query exits the window's
    narrow envelope (data-side bound huge) — the regime the
    reference's lbKeoghDataCumulative (DtwUtils.java:238-267) exists
    for."""
    rng = np.random.RandomState(7)
    n, m, rho, eps = 2000, 60, 3, 4.0
    # short-period sine: rolling +-rho envelope spans the full
    # amplitude everywhere, so in-band constants pass query-side Keogh
    q = 2.0 * np.sin(2 * np.pi * np.arange(m) / 6.0)
    arr = np.empty(n)
    walk = rng.randn(600).cumsum() * 3 + 50
    arr[:600] = walk                      # far away: LB_Kim kills in O(1)
    arr[600:1200] = rng.randn(600) * 0.01  # near-constant: data-Keogh kills
    arr[1200:] = rng.randn(800).cumsum() * 3 - 50
    arr[1500 : 1500 + m] = q              # planted exact match
    survivors, counters, keogh_only = _run_cascade(arr, q, rho, eps)
    assert 1500 in survivors and survivors[1500] == 0.0
    assert counters.get("keogh_d_pruned", 0) > 0
    assert counters["dtw_evals"] < keogh_only
