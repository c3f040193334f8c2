"""Data-quality validation for pipeline gates (Deequ-style, single-pass).

Training-data pipelines gate every stage on data-quality checks —
completeness, uniqueness, value ranges, referential integrity (the pattern
popularized by AWS Deequ and dbt tests). The Spark-first shape matters at
100 TB: every COLUMN metric (null fraction, distinct count, min/max) is
computed in ONE aggregation pass over ONE scan — adding a check adds an
aggregate expression, not a job. Referential-integrity checks are the only
per-check joins (left anti against the dimension's key set; the dimension
side is typically broadcastable).

The reference engine has no validation surface; this is pipeline-extension
scope, like profiling (operators/profile.py) but pass/fail-oriented.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "check string, target string, metric double, threshold double, passed boolean"


def quality_report(
    df: DataFrame,
    completeness: dict[str, float] | None = None,
    unique: Sequence[str] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """One row per check: (check, target, metric, threshold, passed).

    - ``completeness``: column -> minimum non-null fraction.
    - ``unique``: columns whose values must be distinct across rows.
    - ``ranges``: column -> (lo, hi); metric = fraction of non-null values
      inside [lo, hi], threshold 1.0.
    - ``foreign_keys``: (column, dim_df, dim_col); metric = fraction of
      non-null values present in the dimension's key set, threshold 1.0.

    All column metrics come from a single aggregation over a single scan;
    each foreign key adds one anti-join (broadcast when the dimension is
    small). Empty inputs yield vacuous passes with metric 1.0.
    """
    completeness = completeness or {}
    ranges = ranges or {}
    spark = df.sparkSession

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in completeness:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
    for c in unique:
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
        aggs.append(F.count(c).alias(f"__dn_{c}"))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(F.col(c).between(lo, hi).cast("long")).alias(f"__in_{c}")
        )
        aggs.append(F.count(c).alias(f"__rn_{c}"))
    row = df.agg(*aggs).collect()[0]  # ONE job for every column metric

    def frac(num, den):
        return 1.0 if not den else num / den

    out = []
    for c, thr in completeness.items():
        m = frac(row[f"__nn_{c}"], row["__n"])
        out.append(("completeness", c, m, float(thr), m >= thr))
    for c in unique:
        m = frac(row[f"__d_{c}"], row[f"__dn_{c}"])
        out.append(("unique", c, m, 1.0, m >= 1.0))
    for c in ranges:
        m = frac(row[f"__in_{c}"], row[f"__rn_{c}"])
        out.append(("range", c, m, 1.0, m >= 1.0))
    for c, dim, dim_col in foreign_keys:
        keys = dim.select(F.col(dim_col).alias(c)).distinct()
        total = df.filter(F.col(c).isNotNull()).count()
        orphans = (
            df.select(c).filter(F.col(c).isNotNull()).join(keys, c, "left_anti").count()
        )
        m = frac(total - orphans, total)
        out.append(("foreign_key", c, m, 1.0, m >= 1.0))

    return spark.createDataFrame(
        [(c, t, float(round(m, 6)), thr, bool(p)) for c, t, m, thr, p in out],
        _SCHEMA,
    )
