"""Per-batch wall + phase profile of q33 (DS-Join cached pipeline):
where the 4 batches spend their time. Usage:
SPARK_GRAFT_SF_DIR=... PYTHONPATH=/root/repo python3 tools/prof_q33.py
"""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.operators.semi_stream_join import (
    SemiStreamJoin, replay_in_batches,
)
from distributed_stream_processing_spark.streaming.cache_controller import (
    AdaptiveCacheController,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof_q33")
sc = spark.sparkContext
cat = Catalog(spark, sf_dir)
stream = cat.lineitem.select(
    F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
    F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
    F.col("l_partkey").cast("bigint").alias("l_partkey"),
)
store = cat.part.select("p_partkey", "p_retailprice").withColumnRenamed(
    "p_partkey", "l_partkey"
)

def run(tag):
    t_all = time.monotonic()
    ctl = AdaptiveCacheController()
    j = SemiStreamJoin(
        store=store, key="l_partkey", controller=ctl,
        initial_cache=store.filter(F.col("p_retailprice") < 1200.0),
    )
    outs = []
    tracker = sc.statusTracker()
    for bid, batch in replay_in_batches(stream, 4, "l_orderkey"):
        j0 = len(tracker.getJobIdsForGroup() or [])
        t0 = time.monotonic()
        outs.append(j.process_batch(batch, bid).select(
            "l_orderkey", "l_linenumber", "l_partkey", "p_retailprice"))
        dt = time.monotonic() - t0
        print(f"{tag} batch {bid}: {dt:.2f}s")
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    t0 = time.monotonic()
    res.write.mode("overwrite").format("noop").save()
    print(f"{tag} final union noop: {time.monotonic()-t0:.2f}s")
    j.flush_attribution()
    for t in ctl.history:
        print(f"{tag}   b{t.batch_id}: miss={t.n_miss} fetch={t.store_fetch_s:.2f} "
              f"maintain={t.cache_maintain_s:.2f} join={t.join_s:.2f} measured={t.measured}")
    j.close()
    print(f"{tag} TOTAL: {time.monotonic()-t_all:.2f}s")

run("warm0")
run("warm1")
run("warm2")
