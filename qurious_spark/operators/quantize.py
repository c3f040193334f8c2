"""Embedding quantization: symmetric int8 compression + reconstruction error.

Vector stores at 100 TB scale keep embeddings int8-quantized (4x smaller
than float32, ~16x smaller than float64) and only rehydrate for re-ranking.
This operator computes, per vector, the symmetric scale ``max(|x|)/127``,
the quantized codes, and the reconstruction MSE — the metric that decides
whether int8 is acceptable for a given embedding family.

Greenfield (no reference counterpart; the reference has no array types at
all — SURVEY §1.2 "No nested types"). Spark-first: everything is
``transform`` / ``aggregate`` higher-order array expressions over the
native ``array<float>`` column — map-only, no shuffle, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x)))


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector quantization result: ``id_col``, ``scale`` (double),
    ``codes`` (array<int> in [-127, 127]) and ``mse`` (reconstruction mean
    squared error, double). Other input columns are dropped — join back on
    ``id_col`` to re-attach them.

    All-zero vectors get scale 0 and all-zero codes (division guarded).
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = _absmax(vec) / F.lit(127.0)
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    codes = F.transform(vec, lambda x: F.round(x / safe).cast("int"))
    recon = F.zip_with(codes, vec, lambda c, x: (c.cast("double") * safe - x))
    mse = F.aggregate(
        recon, F.lit(0.0), lambda acc, e: acc + e * e
    ) / F.size(vec)
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        codes.alias("codes"),
        mse.alias("mse"),
    )
