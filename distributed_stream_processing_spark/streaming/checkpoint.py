"""Truly-lazy local checkpointing for per-batch state swaps.

``Dataset.localCheckpoint(eager=False)`` is not lazy under AQE: it
resolves the FINAL physical plan at call time, and adaptive planning
resolves a final plan by actually EXECUTING every intermediate query
stage (shuffles, subplan jobs). For a state DataFrame containing
joins this is a hidden eager action — the semi-stream pipelines'
"one combined job per batch" silently became several, with the
state compute running serially at the checkpoint call and the
combined action merely re-scanning it (observed as
'localCheckpoint'-callsite stages with multi-CPU-second cost at the
start of every batch).

``lazy_local_checkpoint`` plans the checkpoint with AQE disabled, so
the call just builds an RDD and the state materializes inside the
batch's single combined action, sharing the cluster with the output
verify as designed (X8 lineage truncation, one action per batch).
The state subplans lose nothing from static planning: every join in
them carries an explicit broadcast hint, and their output
partitioning is pinned by coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def lazy_local_checkpoint(df: DataFrame) -> DataFrame:
    """NOT safe under concurrent planning on the same session (the
    conf toggle is session-scoped); the semi-stream pipelines run
    batches sequentially on the driver, which is the intended use.
    Only checkpoint plans whose joins carry explicit broadcast hints
    — static planning picks sort-merge for unhinted joins with
    unknown stats."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        return df.localCheckpoint(eager=False)
    finally:
        spark.conf.set(key, prev)
