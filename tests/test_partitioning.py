"""Partition pruning: date filters become PartitionFilters, not row filters."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from qurious_spark.plans.inspect import _executed_plan
from qurious_spark.sources.partitioning import (
    read_partitioned,
    save_partitioned,
    with_date_partition,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_partitioned(spark, tmp_path_factory):
    from qurious_spark.sources.readers import read_parquet

    path = str(tmp_path_factory.mktemp("events_part"))
    ev = with_date_partition(read_parquet(spark, f"{SF}/events.parquet"))
    save_partitioned(ev, path, ["dt"])
    return path


def test_partition_filter_reaches_scan(spark, events_partitioned):
    df = read_partitioned(spark, events_partitioned).filter(
        F.col("dt") == F.lit("2024-01-01").cast("date")
    )
    plan = _executed_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), plan[:800]


def test_pruned_read_matches_unpartitioned(spark, events_partitioned):
    from qurious_spark.sources.readers import read_parquet

    ev = with_date_partition(read_parquet(spark, f"{SF}/events.parquet"))
    some_day = ev.select("dt").distinct().orderBy("dt").first().dt
    pruned = (
        read_partitioned(spark, events_partitioned).filter(F.col("dt") == some_day).count()
    )
    full = ev.filter(F.col("dt") == some_day).count()
    assert pruned == full > 0


def test_roundtrip_preserves_rows(spark, events_partitioned):
    from qurious_spark.sources.readers import read_parquet

    n_src = read_parquet(spark, f"{SF}/events.parquet").count()
    n_part = read_partitioned(spark, events_partitioned).count()
    assert n_src == n_part
