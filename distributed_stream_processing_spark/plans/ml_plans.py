"""Online-ML pipeline query (S3M parity).

The gate covers the oracle-checkable core — the kv-match search that
feeds the trainer (S3M/src/main/scala/kvscala/s3m.scala:89-118): per
stream window, the argmin-ED match in the stored head plus the
delayed label. Exact scaled-integer squared distances make position,
distance, and label bit-reproducible in DuckDB. The SGD trajectory on
top (warm-started streaming regression, W5/W6) is not SQL-expressible
and stays pytest-verified (tests/test_streaming.py numpy replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_stream_processing_spark.plans.registry import query
from distributed_stream_processing_spark.plans.timeseries_plans import series_df
from distributed_stream_processing_spark.streaming.online_ml import s3m_match_table

# pipeline constants — shared between the engine call and the oracle
M, SLIDE, PRED, N_WINDOWS, SCALE = 50, 100, 10, 12, 100
SPLIT_NUM, SPLIT_DEN = 3, 5  # stored head = first 60% of the series


def _s3m_oracle() -> str:
    """DuckDB twin of s3m_match_table.

    The split offset uses integer division (n*3)//5 — matching the
    engine's exact rational floor; d2 is an exact integer sum of
    scaled squared diffs, so the per-window argmin (ORDER BY d2,
    start — ties to the lowest position, as np.argmin takes the first
    minimum) and round(sqrt(d2)/scale, 6) reproduce bit-exactly.

    GATE-SCALE ONLY: the j CTE is a non-equi join materializing
    ~split*M*n_windows rows (~3.6M at sf0.01) before the GROUP BY —
    fine for the sf0.01 correctness gate it exists for, impractical
    at large SFs (the ENGINE side stays chunked/distributed at any
    scale; restrict j with a per-window pos range or precompute
    rolling sums if this oracle ever needs to run bigger).
    """
    return f"""
    WITH s AS (SELECT event_id AS pos,
                      CAST(round(value * {SCALE}) AS BIGINT) AS cx,
                      value FROM events),
    p AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 (CAST(count(*) AS BIGINT) * {SPLIT_NUM}) // {SPLIT_DEN} AS split
          FROM s),
    wins AS (SELECT CAST(t.i AS BIGINT) AS window_id,
                    p.split + CAST(t.i AS BIGINT) * {SLIDE} AS wstart,
                    p.split AS split
             FROM p, range({N_WINDOWS}) t(i)
             WHERE p.split + CAST(t.i AS BIGINT) * {SLIDE} + {M + PRED} < p.n),
    q AS (SELECT w.window_id, s.pos - w.wstart AS qoff, s.cx AS cq, w.split
          FROM wins w JOIN s ON s.pos BETWEEN w.wstart AND w.wstart + {M - 1}),
    j AS (SELECT q.window_id, s.pos - q.qoff AS start,
                 (s.cx - q.cq) * (s.cx - q.cq) AS dd
          FROM s JOIN q ON s.pos - q.qoff BETWEEN 0 AND q.split - {M}),
    sums AS (SELECT window_id, start, sum(dd) AS d2, count(*) AS c
             FROM j GROUP BY window_id, start),
    best AS (SELECT window_id, start, d2,
                    row_number() OVER (PARTITION BY window_id
                                       ORDER BY d2, start) AS rk
             FROM sums WHERE c = {M}),
    lab AS (SELECT w.window_id, w.wstart,
                   (SELECT value FROM s WHERE pos = w.wstart + {M + PRED - 1})
                 - (SELECT value FROM s WHERE pos = w.wstart + {M + PRED - 2})
                   AS label
            FROM wins w)
    SELECT b.window_id, l.wstart AS pos, CAST(b.start AS BIGINT) AS match_pos,
           round(sqrt(CAST(b.d2 AS DOUBLE)) / {SCALE}, 6) AS match_dist,
           round(l.label, 6) AS label
    FROM best b JOIN lab l USING (window_id) WHERE b.rk = 1
    """


@query(
    "q35_s3m_online_regression",
    oracle=_s3m_oracle(),
    doc=(
        "S3M match core, HARD-gated since round 4: stream windows "
        "matched argmin-ED against the stored series head (one "
        "distributed chunked pass, exact scaled-int d2) with the "
        "delayed training label per window. The SGD trajectory the "
        "matches feed (W5/W6) is pytest-verified (numpy replay)."
    ),
)
def q35_s3m_online_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    return s3m_match_table(
        series_df(spark, sf_dir),
        split_frac=SPLIT_NUM / SPLIT_DEN,
        window_size=M,
        slide=SLIDE,
        pred=PRED,
        n_windows=N_WINDOWS,
        value_scale=SCALE,
    )
