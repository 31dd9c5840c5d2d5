"""Ad-hoc profiling harness for q48's per-batch critical path.

Runs the semi-stream similarity pipeline twice (warm + steady) and
dumps the steady run's stage timeline from the Spark UI REST API:
start offset, wall time, task count, executor run time, name. Reads
the pipeline exactly as the q48 plan does.
"""
from __future__ import annotations

import datetime
import json
import time
import urllib.request
from fractions import Fraction

from pyspark.sql import functions as F

from distributed_stream_processing_spark.catalog import Catalog
from distributed_stream_processing_spark.functions.text import tokens
from distributed_stream_processing_spark.operators.semi_stream_similarity import (
    SemiStreamSimilarityJoin,
    build_similarity_store,
)
from distributed_stream_processing_spark.session import get_spark


def one_run(stream, store):
    j = SemiStreamSimilarityJoin(
        stored=None, threshold=Fraction(3, 4), artifacts=store
    )
    outs, bt = [], []
    for b in range(3):
        tb = time.monotonic()
        outs.append(
            j.process_batch(stream.filter(F.pmod(F.col("id"), F.lit(3)) == b), b)
        )
        bt.append(time.monotonic() - tb)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    out.write.mode("overwrite").format("noop").save()
    return bt


def main():
    spark = get_spark("prof", extra_conf={"spark.ui.enabled": "true"})
    sf = "/root/testdata/sf0.1"
    docs = Catalog(spark, sf).documents
    base = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("tokens"))
    stream = base.filter(F.col("id") % 10 < 3)
    stored = base.filter(F.col("id") % 10 >= 3)
    store = build_similarity_store(stored, Fraction(3, 4))
    print("PROF warm", ["%.2f" % x for x in one_run(stream, store)])
    t_mark = time.time() * 1000
    print("PROF steady", ["%.2f" % x for x in one_run(stream, store)])
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
    )

    def ts(s):
        return (
            datetime.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()
            * 1000
        )

    rows = []
    for s in stages:
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        if not sub or not comp:
            continue
        subt, compt = ts(sub), ts(comp)
        if subt < t_mark:
            continue
        rows.append(
            (
                subt,
                compt,
                s["stageId"],
                s["numTasks"],
                s["executorRunTime"],
                s["name"].split("\n")[0][:40],
            )
        )
    rows.sort()
    t0 = rows[0][0]
    for subt, compt, sid, nt, ert, name in rows:
        print(
            "PROF stage %4d start %6.0fms wall %6.0fms tasks %3d execRun %6dms  %s"
            % (sid, subt - t0, compt - subt, nt, ert, name)
        )


if __name__ == "__main__":
    main()
