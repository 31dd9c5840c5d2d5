"""Interval algebra: merge and overlap-join of position/time ranges.

The reference does this driver-side over candidate position lists
(sortAndMergeIntervals / two-pointer intersect,
kvmatch/QueryEngine.java:506-609,191-217); here both are DataFrame
programs so they distribute:

* merge   = the classic window trick (new group when start exceeds
  the running max end) — one shuffle per key;
* overlap = keyed equi-join + overlap predicate (per-key hash join
  with a residual filter; at extreme per-key cardinality bucket the
  range dimension first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str | list[str],
    start: str = "start",
    end: str = "end",
    merge_gap: int = 0,
) -> DataFrame:
    """Coalesce overlapping/near [start, end] intervals per key.

    Output: (key..., start, end, n_merged) — an interval joins the
    open group when its start <= running max end + ``merge_gap``
    (gap=1 also merges integer-adjacent runs); otherwise a new group
    opens.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = W.partitionBy(*keys).orderBy(start, end)
    prev_max_end = F.max(end).over(w.rowsBetween(W.unboundedPreceding, -1))
    grouped = df.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull() | (F.col(start) > prev_max_end + merge_gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_grp", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (
        grouped.groupBy(*keys, "_grp")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_grp")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Pairs of overlapping intervals per key: [s,e] x [s,e] with
    a.start <= b.end AND b.start <= a.end."""
    sa, sb = suffixes
    a = left.select(
        F.col(key),
        F.col("start").alias(f"start{sa}"),
        F.col("end").alias(f"end{sa}"),
    )
    b = right.select(
        F.col(key),
        F.col("start").alias(f"start{sb}"),
        F.col("end").alias(f"end{sb}"),
    )
    return a.join(b, key).filter(
        (F.col(f"start{sa}") <= F.col(f"end{sb}"))
        & (F.col(f"start{sb}") <= F.col(f"end{sa}"))
    )
