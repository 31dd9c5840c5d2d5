"""Adaptive caching-window controller (DS-Join's core novelty).

The reference sizes an LRU eviction window from wall-clock feedback:
grow when the remote-store fetch dominates, shrink when cache
maintenance dominates, clamp to bounds
(DS-Join/DS_join_step4/src/main/scala/streaming.scala:462-540; the
rule-based DSim variant ds_join/DS_SimJoin_stream.scala:645-667).

Re-specified here as a pure, injectable-clock-free policy over
per-batch timing observations, so it is unit-testable on synthetic
traces (SURVEY §7 'what's hard' #2) and driveable from
StreamingQueryProgress in production.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field


@dataclass
class BatchTimings:
    batch_id: int
    n_miss: int
    store_fetch_s: float  # time joining/fetching missed keys from the store
    cache_maintain_s: float  # time rebuilding cache + LRU state
    join_s: float = 0.0  # hit-join time (context only)
    # True when the phase split was MEASURED from the combined action's
    # SQL metrics (plan_timing.PlanTimeAttributor) rather than
    # estimated from the miss fraction; measured values are aggregate
    # task times, which is fine — the policy only compares magnitudes
    measured: bool = False


@dataclass
class AdaptiveCacheController:
    """Sizes the LRU caching window (in batches) from timing feedback.

    Policy: no misses -> grow (cache is paying off; keep entries
    longer). Misses present -> compare smoothed store-fetch cost vs
    cache-maintenance cost: fetch-dominated -> grow by ``step``,
    maintenance-dominated -> shrink. Always clamp to [min_window,
    max_window].
    """

    window: int = 8
    min_window: int = 2
    max_window: int = 128
    step: int = 1
    smoothing: int = 3  # batches averaged
    # recent observations for diagnostics/tests; bounded — an
    # unbounded stream must not grow driver memory per batch
    history: deque = field(default_factory=lambda: deque(maxlen=1024))

    def __post_init__(self):
        # per-unit smoothing windows (measured task-CPU vs fallback
        # wall-clock), appended in observe(): O(1) per batch, and a
        # regime flip never averages in arbitrarily old same-unit
        # observations from before the other regime's run (ADVICE r6
        # — the full-history scan was O(n^2) over a long stream)
        self._recent: dict[bool, deque] = {
            True: deque(maxlen=self.smoothing),
            False: deque(maxlen=self.smoothing),
        }

    def observe(self, t: BatchTimings) -> int:
        self.history.append(t)
        self._recent[t.measured].append(t)
        if t.n_miss == 0:
            self.window = min(self.window + self.step, self.max_window)
            return self.window
        # smooth only over observations in the SAME unit as the
        # latest: measured splits are aggregate task-CPU seconds,
        # fallback splits are wall-clock — averaging across the two
        # lets whichever unit is larger swamp the comparison when a
        # batch drops to the fallback mid-stream
        recent = list(self._recent[t.measured])
        fetch = sum(r.store_fetch_s for r in recent) / len(recent)
        maintain = sum(r.cache_maintain_s for r in recent) / len(recent)
        if fetch > maintain:
            self.window = min(self.window + self.step, self.max_window)
        elif maintain > fetch:
            self.window = max(self.window - self.step, self.min_window)
        return self.window
