"""Online-ML pipeline query (S3M parity) — rows-only (the SGD
trajectory is not SQL-expressible; pytest replays it against a pure
numpy reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_stream_processing_spark.plans.registry import query
from distributed_stream_processing_spark.plans.timeseries_plans import series_df
from distributed_stream_processing_spark.streaming.online_ml import run_s3m_pipeline


@query(
    "q35_s3m_online_regression",
    oracle=None,
    doc=(
        "S3M end-to-end: stream windows matched against the stored "
        "series head (distributed batch best-match), future points "
        "fetched, delayed-label warm-started SGD; per-window "
        "(prediction, label) trajectory."
    ),
)
def q35_s3m_online_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = run_s3m_pipeline(series_df(spark, sf_dir))
    if not rows:
        return spark.createDataFrame(
            [],
            "window_id long, pos long, match_pos long, match_dist double, "
            "prediction double, label double",
        )
    df = spark.createDataFrame(rows)
    return df.select(
        F.col("window_id").cast("bigint"),
        F.col("pos").cast("bigint"),
        F.col("match_pos").cast("bigint"),
        F.round("match_dist", 6).alias("match_dist"),
        F.round("prediction", 6).alias("prediction"),
        F.round("label", 6).alias("label"),
    )
