"""Sketch aggregates: error bounds, merge consistency, exact-mode parity."""

from pyspark.sql import functions as F

from qurious_spark.functions import sketches as S


def test_approx_distinct_error_bound(session):
    spark = session.spark
    r = spark.table("orders").agg(
        S.approx_distinct("o_custkey", rsd=0.01).alias("a"),
        F.countDistinct("o_custkey").alias("e"),
    ).first()
    assert abs(r["a"] - r["e"]) / r["e"] <= 0.03  # 3x the configured rsd


def test_hll_union_of_partials_matches_global_sketch(session):
    """Partition-wise sketches unioned == one global sketch (mergeability —
    the property that makes the rollup pattern sound at scale)."""
    spark = session.spark
    global_est = (
        spark.table("orders")
        .agg(S.hll_estimate(S.hll_sketch("o_custkey")).alias("est"))
        .first()["est"]
    )
    merged_est = (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(S.hll_sketch("o_custkey").alias("sk"))
        .agg(S.hll_estimate(S.hll_merge("sk")).alias("est"))
        .first()["est"]
    )
    assert merged_est == global_est
    exact = spark.table("orders").select("o_custkey").distinct().count()
    assert abs(merged_est - exact) / exact <= 0.05


def test_approx_quantiles_exact_mode_matches_duckdb(session, duck):
    spark = session.spark
    got = (
        spark.table("orders")
        .agg(S.approx_quantiles("o_totalprice", [0.25, 0.5, 0.9], accuracy=1_000_000).alias("q"))
        .first()["q"]
    )
    exp = duck.sql(
        "SELECT quantile_disc(o_totalprice, [0.25, 0.5, 0.9]) FROM orders"
    ).fetchone()[0]
    assert got == list(exp)
