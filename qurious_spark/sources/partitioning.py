"""Partitioned layouts: directory partitioning for partition-pruned scans.

At 100 TB the cheapest rows are the ones never read: writing fact tables
partitioned by a low-cardinality predicate column (event date, language,
source) turns matching filters into directory pruning — the scan's
PartitionFilters — before any file or row group is opened.

Companion to bucketing.py (bucketing co-locates join keys; partitioning
prunes scan input).  Both compose: partitionBy(date) + bucketBy(key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.

    Partition columns should be low-cardinality (dates, enums) — one
    directory per distinct value; high-cardinality partitioning produces
    millions of tiny files (use bucketing for keys instead).
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def with_date_partition(df: DataFrame, ts_col: str = "ts", name: str = "dt") -> DataFrame:
    """Derive the canonical daily partition column from an event timestamp."""
    return df.withColumn(name, F.to_date(F.col(ts_col)))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout (partition columns recovered from paths)."""
    return spark.read.parquet(path)
