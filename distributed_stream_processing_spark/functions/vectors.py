"""Vector primitives over ARRAY<FLOAT> embedding columns.

All arithmetic is an explicit left-to-right fold in DOUBLE so results
are bit-reproducible across engines (the DuckDB oracle uses the same
fold; its builtin list_cosine_similarity computes in float32 and
would drift). JVM-side higher-order functions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def d2_to_literal(vec: Column, ctr: list[float]) -> Column:
    """Left-to-right double squared-L2 distance between a vector
    column and a plan-time constant centroid (embedded as literals so
    the DuckDB oracle can reproduce the fold bit-exactly)."""
    return F.aggregate(
        F.zip_with(
            _d(vec),
            F.array(*[F.lit(float(w)) for w in ctr]),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# DuckDB SQL fragments computing the identical folds (for oracles).
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def duck_cosine(a: str, b: str) -> str:
    return (
        f"({duck_dot(a, b)} / "
        f"(sqrt({duck_dot(a, a)}) * sqrt({duck_dot(b, b)})))"
    )


def duck_d2(a: str, b: str) -> str:
    """DuckDB twin of d2_to_literal's squared-L2 fold."""
    return (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), 'sum')"
    )
