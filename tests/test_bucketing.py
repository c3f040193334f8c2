"""Bucketed tables: joins and aggregations on the bucket key need no shuffle."""

from __future__ import annotations

import pytest

from qurious_spark.plans.inspect import explain_summary
from qurious_spark.sources.bucketing import is_bucketed, save_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from qurious_spark.sources.readers import read_parquet

    save_bucketed(
        read_parquet(spark, f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        "lineitem_bkt",
        ["l_orderkey"],
        num_buckets=8,
        sort_cols=["l_orderkey"],
    )
    save_bucketed(
        read_parquet(spark, f"{SF}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        ),
        "orders_bkt",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
    )
    yield "lineitem_bkt", "orders_bkt"
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")


def test_tables_are_bucketed(spark, bucketed_tables):
    li, od = bucketed_tables
    assert is_bucketed(spark, li) and is_bucketed(spark, od)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, od = bucketed_tables
    joined = (
        spark.table(li)
        .hint("merge")  # SMJ reads both sides' buckets co-located & pre-sorted
        .join(spark.table(od), spark.table(li).l_orderkey == spark.table(od).o_orderkey)
    )
    summary = explain_summary(joined)
    assert summary["shuffles"] == 0, summary
    n = joined.count()
    assert n > 0


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    li, _ = bucketed_tables
    agg = spark.table(li).groupBy("l_orderkey").sum("l_quantity")
    summary = explain_summary(agg)
    assert summary["shuffles"] == 0, summary
    assert agg.count() > 0


def test_unbucketed_join_does_shuffle_or_broadcast(spark):
    # control: the same join over plain parquet needs an exchange or a
    # broadcast — bucketing is what removed it above
    from qurious_spark.sources.readers import read_parquet

    li = read_parquet(spark, f"{SF}/lineitem.parquet").select("l_orderkey")
    od = read_parquet(spark, f"{SF}/orders.parquet").select("o_orderkey")
    joined = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    summary = explain_summary(joined)
    assert summary["shuffles"] > 0, summary
