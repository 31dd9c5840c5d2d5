"""Streaming metrics: a StreamingQueryListener that records per-batch
progress and can drive the adaptive cache controller from real
durations (the reference's running `time|...` log counters,
ds_join/DS_SimJoin_stream.scala:927-946, as a first-class bridge).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    batch_id: int
    num_input_rows: int
    duration_ms: dict[str, int]


class ProgressRecorder(StreamingQueryListener):
    """Collects QueryProgressEvent rows; `summary()` gives running
    averages like the reference's end-of-run report."""

    def __init__(self) -> None:
        self.batches: list[BatchProgress] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            BatchProgress(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=dict(p.durationMs or {}),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict:
        n = len(self.batches)
        if n == 0:
            return {"n_batches": 0}
        total_rows = sum(b.num_input_rows for b in self.batches)
        avg_trigger = (
            sum(b.duration_ms.get("triggerExecution", 0) for b in self.batches) / n
        )
        return {
            "n_batches": n,
            "total_rows": total_rows,
            "avg_trigger_ms": round(avg_trigger, 1),
        }
