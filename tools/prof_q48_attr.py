"""Split q48's per-batch wall time into plan-build / action / attributor.

Times three seams inside SemiStreamSimilarityJoin.process_batch by
monkeypatching PlanTimeAttributor.attribute and the counts collect:
the goal is to attribute the r7->r9 headline creep (VERDICT r9 task 1)
to a named component rather than "the batch got slower".
"""
from __future__ import annotations

import time
from fractions import Fraction

from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.text import tokens
from distributed_stream_processing_spark.operators import semi_stream_similarity as sss
from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.streaming.plan_timing import (
    PlanTimeAttributor,
)

ATTR_T: list[float] = []
_orig_attr = PlanTimeAttributor.attribute


def timed_attr(self, *a, **k):
    t = time.monotonic()
    r = _orig_attr(self, *a, **k)
    ATTR_T.append(time.monotonic() - t)
    return r


PlanTimeAttributor.attribute = timed_attr


def one_run(stream, store, label):
    j = sss.SemiStreamSimilarityJoin(
        stored=None, threshold=Fraction(3, 4), artifacts=store
    )
    outs = []
    for b in range(3):
        tb = time.monotonic()
        outs.append(
            j.process_batch(stream.filter(F.pmod(F.col("id"), F.lit(3)) == b), b)
        )
        bt = time.monotonic() - tb
        at = ATTR_T[-1] if ATTR_T else 0.0
        print(f"PROF {label} b{b} total {bt:.2f}s attr {at:.3f}s")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    t = time.monotonic()
    out.write.mode("overwrite").format("noop").save()
    print(f"PROF {label} final-save {time.monotonic() - t:.2f}s")


def main():
    spark = get_spark("prof-attr")
    sf = "/root/testdata/sf0.1"
    docs = Catalog(spark, sf).documents
    base = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))
    stream = base.filter(F.col("id") % 10 < 3)
    stored = base.filter(F.col("id") % 10 >= 3)
    t = time.monotonic()
    store = sss.build_similarity_store(stored, Fraction(3, 4))
    print(f"PROF store-build {time.monotonic() - t:.2f}s")
    one_run(stream, store, "warm")
    one_run(stream, store, "steady")
    # third run with the attributor disabled entirely: the difference
    # vs "steady" is the attributor's true per-batch cost (walk + the
    # fallback path it forces)
    PlanTimeAttributor.attribute = lambda self, *a, **k: None
    one_run(stream, store, "noattr")


if __name__ == "__main__":
    main()
