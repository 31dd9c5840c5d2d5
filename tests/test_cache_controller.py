"""Window-policy unit tests on synthetic traces (no Spark)."""

from __future__ import annotations

from distributed_stream_processing_spark.streaming.cache_controller import (
    AdaptiveCacheController,
    BatchTimings,
)


def _t(i, miss, fetch, maintain, measured=True):
    return BatchTimings(
        batch_id=i, n_miss=miss, store_fetch_s=fetch,
        cache_maintain_s=maintain, measured=measured,
    )


def test_grow_on_fetch_dominated_shrink_on_maintain_dominated():
    c = AdaptiveCacheController(window=8)
    for i in range(3):
        c.observe(_t(i, 10, fetch=5.0, maintain=1.0))
    assert c.window == 11
    for i in range(3, 9):
        c.observe(_t(i, 10, fetch=0.1, maintain=5.0))
    assert c.window < 11
    c2 = AdaptiveCacheController(window=8, max_window=10)
    for i in range(5):
        c2.observe(_t(i, 0, 0.0, 0.1))  # no misses -> grow, clamped
    assert c2.window == 10


def test_observe_is_bounded_and_regime_flip_isolated():
    """observe() must not scan unbounded history (O(n^2) over a long
    stream, ADVICE r6), and flipping measured<->estimated must not
    average the other regime's magnitudes into the comparison."""
    c = AdaptiveCacheController(window=8, smoothing=3)
    # long measured stream: smoothing state stays at the deque caps
    for i in range(5000):
        c.observe(_t(i, 5, fetch=2.0, maintain=1.0))
    assert len(c._recent[True]) == 3
    assert len(c.history) == 1024  # bounded diagnostics buffer
    w_before = c.window
    # fallback (wall-clock) batches with the OPPOSITE balance: the
    # decision must follow the fallback numbers alone
    for i in range(5000, 5003):
        c.observe(_t(i, 5, fetch=0.1, maintain=3.0, measured=False))
    assert c.window < w_before
    assert len(c._recent[False]) == 3
