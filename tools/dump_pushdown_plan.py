"""Commit-able plan evidence for the live fetch policy (VERDICT r18
task 2): drive a small-miss batch through the equi pipeline with an
AutoFetcher over the sf0.1 part table and dump the PUSHDOWN batch's
fetch plan — the missed keys must reach the parquet scan as
PushedFilters: In(p_partkey, ...). Writes
plans/r19/q33_pushdown_fetch_plan.txt.
"""
import os, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.operators.semi_stream_join import SemiStreamJoin
from distributed_stream_processing_spark.sources.fetcher import (
    AutoFetcher, parquet_clustered_on, path_bytes,
)
from distributed_stream_processing_spark.streaming.cache_controller import (
    AdaptiveCacheController,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("dump_pushdown_plan")
cat = Catalog(spark, sf_dir)
store = cat.part.select("p_partkey", "p_retailprice").withColumnRenamed(
    "p_partkey", "l_partkey"
)
store_path = f"{cat.sf_dir}/part.parquet"
ctl = AdaptiveCacheController()
fetcher = AutoFetcher(
    source=store, key="l_partkey",
    store_bytes=path_bytes(store_path),
    key_clustered=parquet_clustered_on(store_path, "p_partkey"),
    miss_signal=lambda: (ctl.history[-1].n_miss if ctl.history else None),
)
j = SemiStreamJoin(store=store, key="l_partkey", controller=ctl, fetcher=fetcher)
# batch 0: cold cache, 400 misses (scan pick: no signal yet); batch 1
# overlaps by half -> 200 fresh misses, expected=400 <= threshold ->
# PUSHDOWN pick
b0 = spark.range(0, 400).withColumnRenamed("id", "l_partkey")
b1 = spark.range(200, 600).withColumnRenamed("id", "l_partkey")
j.process_batch(b0, 0).write.mode("overwrite").format("noop").save()
j.flush_attribution()
missed = spark.createDataFrame([(int(x),) for x in range(400, 600)], "l_partkey long")
fetch_df = fetcher.fetch(missed)
plan = fetch_df._jdf.queryExecution().executedPlan().toString()
out = os.path.join(REPO, "plans", "r19", "q33_pushdown_fetch_plan.txt")
with open(out, "w") as f:
    f.write(f"# AutoFetcher decisions so far: {fetcher.chosen}\n")
    f.write("# fetch plan for the 200-key miss set of batch 1 "
            "(policy pick: pushdown)\n\n")
    f.write(plan)
j.close()
print("chosen:", fetcher.chosen)
print("In-filter on scan:", "In(l_partkey" in plan or "In(p_partkey" in plan)
print("wrote", out)
