"""Column profiling: per-column statistics in ONE scan.

Data profiling is the first step of any ingest pipeline — row counts, null
rates, cardinalities, ranges — and the naive implementation scans the table
once per column. This operator computes every column's statistics in a
single aggregation pass (one scan, one partial+final agg, no shuffle wider
than one row) and unpivots the single result row into a (column, stats)
long format with a stack() projection — driver never sees row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column stats: ``(col_name, n_rows, n_nulls, n_distinct, min_v,
    max_v, avg_v)`` — numeric min/max/avg as doubles, NULL for non-numeric
    columns. One scan regardless of column count."""
    dtypes = dict(df.dtypes)
    cols = list(cols or df.columns)
    # positional (index-based) aliases: the source column name appears only
    # as an escaped literal in stack(), never as an identifier, so names
    # containing quotes/spaces/dots profile fine
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        is_num = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"__nulls_{i}"))
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{i}"))
        if is_num:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{i}"))
            aggs.append(F.avg(F.col(c)).cast("double").alias(f"__avg_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__min_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__avg_{i}"))
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        lit = c.replace("'", "''")
        stack_args.append(f"'{lit}', __nulls_{i}, __nd_{i}, __min_{i}, __max_{i}, __avg_{i}")
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, "
            + ", ".join(stack_args)
            + ") AS (col_name, n_nulls, n_distinct, min_v, max_v, avg_v)"
        ),
    )
    return stacked.select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v", "avg_v"
    )
