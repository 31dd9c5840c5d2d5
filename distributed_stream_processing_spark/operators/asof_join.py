"""As-of join: for each left row, the latest right row at-or-before
its timestamp, per key.

The reference's J12 is a point as-of fetch (matched offset -> future
points, kvscala/s3m.scala:109-118); generalized here to the standard
time-series enrich operator. Spark has no native as-of join; the
scalable plan is the union-window trick:

    union(right{tag=0}, left{tag=1})
    -> window per key ordered by (ts, tag)
    -> last(right_cols, ignorenulls) carries the most recent right row
    -> keep left rows

One shuffle on the key, no range join, no per-group pandas
(pd.merge_asof would cap each group at one task). Right side must be
unique per (key, ts) — pre-aggregate to enforce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join (inclusive: right.ts <= left.ts, ties -> right
    row visible). Returns all left columns plus ``right_cols`` (null
    when the key has no prior right row).

    All right columns are carried as ONE struct through a single
    last(ignorenulls) so they always come from the same right row —
    per-column last would mix rows when a right column is null.
    """
    lcols = left.columns
    from pyspark.sql.types import StructField, StructType

    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r = right.select(
        *[
            F.col(c).alias(c) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*right_cols).alias("_r"),
    )
    w = (
        W.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    return (
        l.unionByName(r)
        .select(
            *lcols,
            "_tag",
            *[carried[c].alias(c) for c in right_cols],
        )
        .filter(F.col("_tag") == 1)
        .drop("_tag")
    )
