"""S3M online-learning pipeline: subsequence match + delayed-label
streaming linear regression (SURVEY §3.3).

Reference (kvscala/s3m.scala:79-147): per sliding window, kv-match
the window against the stored series, fetch the matched sequence's
*future* points, build feature vector Qs++Ds, queue it until the
prediction target (which arrives ``pred`` steps later) is observable,
then predict + warm-start-train an SGD linear model
(StreamingLinearRegressionWithSGD_dsl.scala:153-173).

Engine mapping: the per-window best-match search runs DISTRIBUTED in
one pass over chunked stored-series windows (numpy inside
mapInPandas, all query windows scored per chunk, then a min_by
aggregation); the reference instead ran a single-node Java engine on
the driver (S3M's acknowledged inversion). The SGD model itself is
tiny (dim ~ window+pred) and stays driver-side like the reference's.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_best_match(
    series: DataFrame, windows: dict[int, np.ndarray], chunk: int = 8192
) -> dict[int, tuple[int, float]]:
    """Best (ED) match offset in ``series`` for every query window:
    one distributed pass; all windows scored per chunk; min_by merge.

    Returns {window_id: (best_pos, best_dist)}.
    """
    if not windows:
        return {}
    m = len(next(iter(windows.values())))
    items = sorted((int(k), np.asarray(v, dtype=np.float64)) for k, v in windows.items())

    from distributed_stream_processing_spark.operators.subsequence_match import _chunked

    def gen(batches):
        for pdf in batches:
            for cid, grp in pdf.groupby("chunk_id"):
                grp = grp.sort_values("pos")
                pos = grp["pos"].to_numpy()
                val = grp["value"].to_numpy(dtype=np.float64)
                base, hi = int(cid) * chunk, (int(cid) + 1) * chunk
                if len(val) < m:
                    continue
                X = np.lib.stride_tricks.sliding_window_view(val, m)
                starts = pos[: len(val) - m + 1]
                own = (
                    (starts >= base)
                    & (starts < hi)
                    & (pos[m - 1 :] == starts + m - 1)
                )
                if not own.any():
                    continue
                Xo, so = X[own], starts[own]
                wids, bpos, bdist = [], [], []
                for wid, q in items:
                    d2 = ((Xo - q) ** 2).sum(axis=1)
                    i = int(np.argmin(d2))
                    wids.append(wid)
                    bpos.append(int(so[i]))
                    bdist.append(float(np.sqrt(d2[i])))
                yield pd.DataFrame({"window_id": wids, "pos": bpos, "dist": bdist})

    per_chunk = (
        _chunked(series, m, 0, chunk)
        .repartition("chunk_id")
        .mapInPandas(gen, schema="window_id long, pos long, dist double")
    )
    best = (
        per_chunk.groupBy("window_id")
        .agg(F.min(F.struct("dist", "pos")).alias("b"))
        .select("window_id", "b.pos", "b.dist")
    )
    return {r.window_id: (r.pos, r.dist) for r in best.collect()}


@dataclass
class OnlineLinearRegressionSGD:
    """Warm-started mini-batch SGD linear regression (the numpy
    equivalent of MLlib's StreamingLinearRegressionWithSGD: weights
    carried across batches, fixed step size, L2-free)."""

    dim: int
    step_size: float = 0.01
    num_iterations: int = 20
    weights: np.ndarray = field(default=None)  # type: ignore[assignment]
    intercept: float = 0.0

    def __post_init__(self):
        if self.weights is None:
            self.weights = np.zeros(self.dim)

    def predict(self, x: np.ndarray) -> float:
        return float(np.dot(self.weights, x) + self.intercept)

    def train(self, X: np.ndarray, y: np.ndarray) -> None:
        n = len(y)
        for it in range(1, self.num_iterations + 1):
            pred = X @ self.weights + self.intercept
            err = pred - y
            gw = X.T @ err / n
            gb = float(err.mean())
            lr = self.step_size / np.sqrt(it)
            self.weights -= lr * gw
            self.intercept -= lr * gb


def _fetch_ranges(
    series: DataFrame, ranges: list[tuple[int, int, int]]
) -> dict[int, np.ndarray]:
    """Fetch {rid: values[lo:hi]} from a (pos, value) series via one
    broadcast range join — the J12 as-of fetch shape (pos BETWEEN),
    so only the requested slices ever reach the driver."""
    if not ranges:
        return {}
    spark = series.sparkSession
    rdf = spark.createDataFrame(ranges, "rid long, lo long, hi long")
    rows = (
        series.join(
            F.broadcast(rdf),
            (F.col("pos") >= F.col("lo")) & (F.col("pos") < F.col("hi")),
        )
        .select("rid", "pos", "value")
        .collect()
    )
    grouped: dict[int, list[tuple[int, float]]] = {}
    for r in rows:
        grouped.setdefault(r.rid, []).append((r.pos, r.value))
    return {
        k: np.array([v for _, v in sorted(vs)], dtype=np.float64)
        for k, vs in grouped.items()
    }


def run_s3m_pipeline(
    series: DataFrame,
    split_frac: float = 0.6,
    window_size: int = 50,
    slide: int = 100,
    pred: int = 10,
    q_size: int = 3,
    n_windows: int = 12,
    step_size: float = 0.05,
    num_iterations: int = 10,
) -> list[dict]:
    """Replay the tail of ``series`` as a window stream against its
    stored head; returns the per-window prediction trajectory
    [{window_id, pos, match_pos, match_dist, prediction, label}].

    Deltas (rate-of-change, kvscala/s3m.scala:93-96) are the modeled
    signal. Labels arrive ``pred`` positions after the window ends;
    training is delayed through a depth-``q_size`` queue exactly like
    the reference (s3m.scala:77,100-124).
    """
    n = series.agg(F.max("pos")).first()[0] + 1
    split = int(n * split_frac)
    stored_df = series.filter(F.col("pos") < split)

    # stream-window + label slices: one broadcast range join, only
    # ~n_windows*(m+pred) feature rows reach the driver (the round-1
    # full-series orderBy().collect() is gone)
    m = window_size
    meta: dict[int, int] = {}
    for i in range(n_windows):
        start = split + i * slide
        if start + m + pred >= n:
            break
        meta[i] = start
    slices = _fetch_ranges(
        series, [(i, s, s + m + pred) for i, s in meta.items()]
    )
    windows = {i: slices[i][:m] for i in meta}
    matches = batch_best_match(stored_df, windows)
    # future points of each matched stored sequence (J12 as-of fetch)
    futures = _fetch_ranges(
        series,
        [
            (i, matches[i][0] + m - 1, matches[i][0] + m + pred)
            for i in sorted(windows)
            if i in matches
        ],
    )

    feat_dim = (m - 1) + pred
    model = OnlineLinearRegressionSGD(
        dim=feat_dim, step_size=step_size, num_iterations=num_iterations
    )
    queue: list[tuple[int, np.ndarray, float]] = []
    out: list[dict] = []
    for i in sorted(windows):
        start = meta[i]
        mpos, mdist = matches.get(i, (0, float("inf")))
        sl = slices[i]
        qs = np.diff(sl[:m])  # stream window deltas
        fut = futures.get(i, np.empty(0))
        ds = np.diff(fut) if len(fut) == pred + 1 else np.zeros(pred)
        x = np.concatenate([qs, ds])
        label = sl[m + pred - 1] - sl[m + pred - 2]
        queue.append((i, x, label))
        if len(queue) > q_size:
            wid, xq, yq = queue.pop(0)
            p = model.predict(xq)
            model.train(xq[None, :], np.array([yq]))
            out.append(
                {
                    "window_id": int(wid),
                    "pos": int(meta[wid]),
                    "match_pos": int(matches.get(wid, (0, 0.0))[0]),
                    "match_dist": round(float(matches.get(wid, (0, 0.0))[1]), 6),
                    "prediction": float(p),
                    "label": float(yq),
                }
            )
    return out
