"""Micro-profile one attribute() walk: node counts, metric counts,
and cProfile of py4j round trips, on a real q48 batch plan."""
from __future__ import annotations

import cProfile
import io
import pstats
import time
from fractions import Fraction

from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.text import tokens
from distributed_stream_processing_spark.operators import semi_stream_similarity as sss
from distributed_stream_processing_spark.session import get_spark
from distributed_stream_processing_spark.streaming import plan_timing as pt


def main():
    spark = get_spark("prof-attr-micro")
    sf = "/root/testdata/sf0.1"
    docs = Catalog(spark, sf).documents
    base = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))
    stream = base.filter(F.col("id") % 10 < 3)
    stored = base.filter(F.col("id") % 10 >= 3)
    store = sss.build_similarity_store(stored, Fraction(3, 4))

    captured = []
    orig = pt.PlanTimeAttributor.attribute

    def capture(self, df, *a, **k):
        captured.append((self, df, a, k))
        return orig(self, df, *a, **k)

    pt.PlanTimeAttributor.attribute = capture
    j = sss.SemiStreamSimilarityJoin(
        stored=None, threshold=Fraction(3, 4), artifacts=store
    )
    for b in range(2):
        j.process_batch(stream.filter(F.pmod(F.col("id"), F.lit(3)) == b), b)
    pt.PlanTimeAttributor.attribute = orig

    self_, df, a, k = captured[-1]
    # count nodes and metrics in the tree
    root = df._jdf.queryExecution().executedPlan()
    n_nodes = 0
    n_metrics = 0
    n_timed = 0
    cls_count = {}
    stack = [root]
    while stack:
        node = stack.pop()
        n_nodes += 1
        c = pt._cls(node)
        cls_count[c] = cls_count.get(c, 0) + 1
        tm = pt._time_metrics(node)
        n_timed += len(tm)
        m = node.metrics()
        n_metrics += m.size()
        stack.extend(pt._children(node))
    print(f"MICRO nodes={n_nodes} metrics={n_metrics} timed={n_timed}")
    for c, n in sorted(cls_count.items(), key=lambda x: -x[1]):
        print(f"MICRO   {n:4d} {c}")

    t = time.monotonic()
    pr = cProfile.Profile()
    pr.enable()
    orig(self_, df, *a, **k)
    pr.disable()
    print(f"MICRO attr-time {time.monotonic() - t:.3f}s")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
