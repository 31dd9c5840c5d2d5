"""Table catalog over the driver-generated parquet test tables.

The reference kept every dataset as raw delimited strings re-split at
each use (DS-Join streaming.scala:231,375); here schemas are explicit
parquet schemas, parsed once at the scan, so Catalyst gets column
pruning + predicate pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Lazy loader for the star-schema test tables in one sf directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}
        self._tune_session(spark)

    @staticmethod
    def _tune_session(spark: SparkSession) -> None:
        """Right-size a host session left at Spark's 200-partition
        default: at local/test scale that yields 200-task micro-stages
        (pure scheduler overhead). Real clusters size this to ~2-3x
        total cores; 200 is never intentional here."""
        try:
            if spark.conf.get("spark.sql.shuffle.partitions") == "200":
                n = max(8, min(os.cpu_count() or 8, 64))
                spark.conf.set("spark.sql.shuffle.partitions", str(n))
        except Exception:  # noqa: BLE001 - conf access denied: leave as-is
            pass

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
        if name not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            self._cache[name] = self._post_read(name, df)
        return self._cache[name]

    def widen_small_scan(self, df: DataFrame) -> DataFrame:
        """Round-robin repartition to the session width — but ONLY
        when the scan is narrower (r19, guide §2.6/§6): the small
        single-file fixture tables plan as a 1-partition scan (one
        parquet file, one row group — minPartitionNum can't split it),
        so every map-side stage downstream (tokenization, signature
        votes, codec seams) ran single-task on a 32-core session.
        Callers apply this to a SMALL projection before the heavy
        per-row work, so only narrow rows cross the exchange. A
        corpus-scale scan already has >= session-width partitions and
        passes through untouched — the shuffle is never paid where it
        wouldn't buy parallelism."""
        n_part = int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        if df.rdd.getNumPartitions() < n_part:
            return df.repartition(n_part)
        return df

    @staticmethod
    def _post_read(name: str, df: DataFrame) -> DataFrame:
        """Normalize columns Spark can't map natively.

        events.ts is TIMESTAMP(NANOS) parquet, surfaced as a ns-epoch
        long under spark.sql.legacy.parquet.nanosAsLong; convert to a
        proper timestamp (micros precision) once at the edge.
        """
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division, not float: ns epochs exceed double's 2^53
            # mantissa and float rounding would drift the microsecond
            # (DuckDB truncates ns->us; match it exactly)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif name == "events" and isinstance(
            df.schema["ts"].dataType, T.TimestampNTZType
        ):
            # Spark 4 may ignore a runtime nanosAsLong and surface the
            # TIMESTAMP(NANOS) column as TIMESTAMP_NTZ (ns truncated to
            # us).  NTZ refuses unix_micros / cast-to-long, so convert to
            # a session-UTC TIMESTAMP once at the edge: the session pins
            # UTC (session.py), making the cast an identity on the
            # underlying microseconds — exactly DuckDB's naive-as-UTC
            # epoch_us semantics.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
