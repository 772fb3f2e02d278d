"""Embedding-vector expressions: cosine similarity as pure JVM column
math (zip_with + aggregate), no UDF in the hot path.

At 100 TB the brute-force path is only ever used against a BROADCAST
side (query set or centroid table); the full N^2 cross product is never
materialized.  See operators.ann for the bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    """Cast array<float> -> array<double> so both engines accumulate in
    float64 (cross-engine hash determinism)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
