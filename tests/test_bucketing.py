"""X1 parity at scale: bucketed tables co-locate joins (no exchange).

The reference pinned HashPartitioner on every RDD to avoid per-batch
shuffles (DS-Join streaming.scala:172,201,206); the engine-native
equivalent for stored tables is bucketing: both sides bucketed on the
join key let Catalyst plan a SortMergeJoin with NO Exchange.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog


def test_bucketed_join_has_no_exchange(spark, sf_smoke):
    cat = Catalog(spark, sf_smoke)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS part_bucketed")
    (
        cat.lineitem.select("l_orderkey", "l_partkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_partkey")
        .sortBy("l_partkey")
        .saveAsTable("li_bucketed")
    )
    (
        cat.part.select(F.col("p_partkey").alias("l_partkey"), "p_retailprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_partkey")
        .sortBy("l_partkey")
        .saveAsTable("part_bucketed")
    )
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("part_bucketed").hint("merge"), "l_partkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        # and it still computes the right thing
        assert joined.count() == cat.lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS part_bucketed")
        shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)
