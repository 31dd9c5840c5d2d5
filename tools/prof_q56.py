"""Per-phase wall profile of q56 (dedup clusters): pairs vs loop vs
rounds, with job-description labels for the UI. Usage:
PYTHONPATH=/root/repo SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/prof_q56.py
"""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fractions import Fraction
from pyspark.sql import functions as F
from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.text import tokens
from distributed_stream_processing_spark.operators.dedup import (
    duplicate_clusters, minhash_lsh_dedup,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof_q56")
docs = Catalog(spark, sf_dir).documents
toks = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))

for run in range(2):
    t0 = time.monotonic()
    pairs = minhash_lsh_dedup(toks, Fraction(4, 5))
    pairs.write.mode("overwrite").format("noop").save()
    t1 = time.monotonic()
    print(f"run{run} pairs only: {t1-t0:.2f}s")
    t0 = time.monotonic()
    pairs = minhash_lsh_dedup(toks, Fraction(4, 5))
    stats = {}
    out = duplicate_clusters(docs.select(F.col("doc_id").alias("id")), pairs, stats=stats)
    out.write.mode("overwrite").format("noop").save()
    t1 = time.monotonic()
    print(f"run{run} full q56: {t1-t0:.2f}s rounds={stats.get('rounds')}")
