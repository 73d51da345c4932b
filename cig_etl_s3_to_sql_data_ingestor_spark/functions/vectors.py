"""Vector (array<float>) helpers for the embedding operators.

All of these stay JVM-side (higher-order functions compile into codegen'd
expressions): no Python UDF round-trip per row. Dot products fold
left-to-right over the array — the same order a single-threaded oracle
uses — so results are bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance in double precision — the PQ
    subspace metric. Same left-to-right fold discipline as ``dot`` so
    both engines produce the identical double."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
