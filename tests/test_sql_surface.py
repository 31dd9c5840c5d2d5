"""SQL-view surface (Catalog.register_views + spark.sql) and
multi-source stream union (S2: the reference unions 4 socket feeds,
DS-Join streaming.scala:139-156)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.sources.stream import (
    drain_stream,
    stage_stream_files,
)


def test_sql_over_registered_views(spark, sf_smoke):
    Catalog(spark, sf_smoke).register_views()
    df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    rows = df.collect()
    assert len(rows) == 6 and all(r.revenue > 0 for r in rows)
    # events view exposes the normalized timestamp type
    assert (
        spark.sql("SELECT min(ts) FROM events").first()[0].year == 2024
    )


def test_union_of_multiple_stream_sources(spark, sf_smoke):
    """Two independent file-stream sources unioned into one streaming
    query — the engine form of the reference's unioned socket feeds."""
    ev = Catalog(spark, sf_smoke).events.select("event_id", "user_id", "value")
    left = ev.filter(F.col("event_id") % 2 == 0)
    right = ev.filter(F.col("event_id") % 2 == 1)
    p1 = stage_stream_files(left, "union_left", 2, "event_id")
    p2 = stage_stream_files(right, "union_right", 2, "event_id")
    s1 = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(p1)
    s2 = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(p2)
    unioned = s1.unionByName(s2)
    # countDistinct is unsupported on streams: group per user instead
    agg = unioned.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    out = drain_stream(agg, "union_out", "complete")
    assert out.agg(F.sum("n")).first()[0] == ev.count()
    assert out.count() == ev.select("user_id").distinct().count()
