"""Cogrouped-map pandas surface: cross-check per-key merge_asof against the
JVM as-of join — two independent algorithms must agree row-for-row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qurious_spark.operators.asof import asof_join
from qurious_spark.operators.cogroup import asof_align, cogroup_apply

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clicks_purchases(spark):
    from qurious_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{SF}/events.parquet").cache()
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return clicks, purchases


def test_cogroup_asof_matches_jvm_asof(spark, clicks_purchases):
    clicks, purchases = clicks_purchases
    key = lambda r: r.event_id
    jvm = {
        key(r): (r.asof_event_id, r.asof_value)
        for r in asof_join(
            clicks, purchases, on="user_id", right_payload=["event_id", "value"]
        ).collect()
    }
    py = {
        key(r): (r.asof_event_id, r.asof_value)
        for r in asof_align(
            clicks, purchases, on="user_id", right_payload=["event_id", "value"]
        ).collect()
    }
    assert jvm and py
    assert jvm == py


def test_cogroup_apply_keys_one_sided(spark):
    import pandas as pd

    l = spark.createDataFrame([(1, 10), (2, 20)], "k int, a int")
    r = spark.createDataFrame([(2, 200), (3, 300)], "k int, b int")

    def fn(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        k = lp["k"].iloc[0] if len(lp) else rp["k"].iloc[0]
        return pd.DataFrame(
            {"k": [int(k)], "n_left": [len(lp)], "n_right": [len(rp)]}
        )

    rows = cogroup_apply(l, r, "k", fn, "k int, n_left long, n_right long").collect()
    got = {r.k: (r.n_left, r.n_right) for r in rows}
    assert got == {1: (1, 0), 2: (1, 1), 3: (0, 1)}


def test_forward_direction_matches_pandas_reference(spark, clicks_purchases):
    """direction='forward': the JVM union+future-window plan must agree
    row-for-row with the independent per-key pandas merge_asof."""
    clicks, purchases = clicks_purchases
    jvm = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            clicks,
            purchases,
            on="user_id",
            right_payload=["event_id", "value"],
            direction="forward",
        ).collect()
    }
    py = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_align(
            clicks,
            purchases,
            on="user_id",
            right_payload=["event_id", "value"],
            direction="forward",
        ).collect()
    }
    assert jvm and py
    assert jvm == py
    # forward and backward genuinely differ on this data
    back = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            clicks, purchases, on="user_id", right_payload=["event_id", "value"]
        ).collect()
    }
    assert jvm != back


def test_asof_null_payload_cells_come_from_matched_row(spark):
    """A NULL cell inside the matched right row's payload must surface as
    NULL — not get skipped to an OLDER row's value (the struct-packed carry
    guarantees all asof_ columns come from the same right row, matching
    merge_asof)."""
    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 5, "a", 100), (1, 15, "b", None)],
        "k int, t int, tag string, amount int",
    )
    got = {
        r.t: (r.asof_tag, r.asof_amount)
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_payload=["tag", "amount"],
        ).collect()
    }
    # t=20 matches the t=15 right row, whose amount is NULL: a per-column
    # ignorenulls carry would have stitched amount=100 from the t=5 row
    assert got == {10: ("a", 100), 20: ("b", None)}


def test_asof_bad_direction_rejected(spark, clicks_purchases):
    clicks, purchases = clicks_purchases
    with pytest.raises(ValueError, match="direction"):
        asof_join(clicks, purchases, on="user_id", direction="sideways")
