"""Salted join / two-phase aggregation: same results as the direct plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qurious_spark.operators.skew import salted_join, two_phase_agg

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    from qurious_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


@pytest.fixture(scope="module")
def orders(spark):
    from qurious_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )


def test_salted_join_matches_plain_join(spark, lineitem, orders):
    plain = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    salted = salted_join(
        lineitem, orders, ("l_orderkey", "o_orderkey"), salt_buckets=4
    ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, lineitem, orders):
    # every salt bucket of a hot key gets some rows (the point of salting)
    from qurious_spark.operators.skew import _SALT

    hot = lineitem.limit(500).withColumn("l_orderkey", F.lit(1))  # one hot key
    left = hot.withColumn(_SALT, (F.rand(seed=42) * 4).cast("int"))
    buckets = left.groupBy(_SALT).count().count()
    assert buckets == 4


def test_two_phase_agg_matches_direct(spark, lineitem):
    direct = lineitem.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_quantity").alias("count_l_quantity"),
        F.max("l_quantity").alias("max_l_quantity"),
    )
    two = two_phase_agg(
        lineitem,
        "l_partkey",
        [("l_quantity", "sum"), ("l_quantity", "count"), ("l_quantity", "max")],
        salt_buckets=4,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, two.collect()))


def test_two_phase_agg_rejects_non_decomposable(lineitem):
    with pytest.raises(ValueError):
        two_phase_agg(lineitem, "l_partkey", [("l_quantity", "avg")])
