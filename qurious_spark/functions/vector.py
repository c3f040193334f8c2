"""Vector column functions (array<float|double>) — pure JVM expressions.

``F.zip_with`` / ``F.aggregate`` keep the arithmetic inside whole-stage
codegen; no UDF in the hot path. All math is done in double (inputs cast)
so the DuckDB oracle can replicate results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    """cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)); 0.0 for zero vectors."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))
