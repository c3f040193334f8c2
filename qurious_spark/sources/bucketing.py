"""Bucketed tables: co-located, shuffle-free joins and aggregations.

The reference engine is single-process and never shuffles; on a cluster the
equivalent property has to be *designed*: writing both sides of a hot join
bucketed by the join key means every future join/groupBy on that key reads
co-partitioned data and Catalyst drops the Exchange entirely — at 100 TB the
difference between a full-network shuffle per query and none.

Usage shape (verified by tests/test_bucketing.py):

    save_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 32)
    save_bucketed(orders,   "orders_b",   ["o_orderkey"], 32)
    spark.table("lineitem_b").join(spark.table("orders_b"), ...)  # 0 shuffles

Bucket counts must match across tables that join together; pick a count that
keeps bucket files in the 100 MB–1 GB range at production scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def is_bucketed(spark: SparkSession, table_name: str) -> bool:
    rows = spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()
    return any(r.col_name == "Num Buckets" for r in rows)
