"""SCD type-2 merge: versioned history semantics (operators/scd.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qurious_spark.operators.scd import scd2_merge, scd2_snapshot

SCHEMA = "k bigint, seg string, bal double, valid_from timestamp, valid_to timestamp, is_current boolean"
T0 = dt.datetime(2020, 1, 1)


@pytest.fixture()
def dim(spark):
    rows = [
        # key 1: one closed + one open version (history must pass through)
        (1, "BUILDING", 10.0, dt.datetime(2019, 1, 1), T0, False),
        (1, "MACHINERY", 12.0, T0, None, True),
        (2, "AUTO", 5.0, T0, None, True),
        (3, None, 7.0, T0, None, True),  # NULL attribute in current version
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _by_key(rows):
    out = {}
    for r in rows:
        out.setdefault(r.k, []).append(r)
    for v in out.values():
        v.sort(key=lambda r: (r.valid_from, r.is_current))
    return out


def test_scd2_merge_closes_changed_inserts_new_keeps_unchanged(spark, dim):
    updates = spark.createDataFrame(
        [
            (1, "FURNITURE", 12.0),  # changed seg -> close + new version
            (2, "AUTO", 5.0),  # identical attrs -> untouched
            (3, None, 7.0),  # NULL == NULL null-safely -> untouched
            (9, "HOUSEHOLD", 1.0),  # brand-new key -> open version
        ],
        "k bigint, seg string, bal double",
    )
    out = scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01").collect()
    by_key = _by_key(out)

    assert len(by_key[1]) == 3  # old history + closed + new open
    closed = [r for r in by_key[1] if r.seg == "MACHINERY"][0]
    assert not closed.is_current and closed.valid_to == dt.datetime(2024, 6, 1)
    new = [r for r in by_key[1] if r.seg == "FURNITURE"][0]
    assert new.is_current and new.valid_to is None
    assert new.valid_from == dt.datetime(2024, 6, 1)

    (unchanged2,) = by_key[2]
    assert unchanged2.is_current and unchanged2.valid_from == T0
    (unchanged3,) = by_key[3]
    assert unchanged3.is_current and unchanged3.seg is None

    (brand_new,) = by_key[9]
    assert brand_new.is_current and brand_new.valid_from == dt.datetime(2024, 6, 1)


def test_scd2_merge_is_idempotent(spark, dim):
    updates = spark.createDataFrame(
        [(1, "FURNITURE", 12.0), (9, "HOUSEHOLD", 1.0)],
        "k bigint, seg string, bal double",
    )
    once = scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01")
    twice = scd2_merge(once, updates, "k", ["seg", "bal"], "2024-06-01")
    key = lambda r: (r.k, str(r.valid_from), str(r.valid_to), r.is_current, r.seg, r.bal)
    assert sorted(map(key, once.collect())) == sorted(map(key, twice.collect()))


def test_scd2_null_to_value_counts_as_change(spark, dim):
    updates = spark.createDataFrame([(3, "AUTO", 7.0)], "k bigint, seg string, bal double")
    out = scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01").collect()
    versions = _by_key(out)[3]
    assert len(versions) == 2  # NULL-seg version closed, AUTO version opened
    assert {r.is_current for r in versions} == {True, False}


def test_scd2_snapshot_point_in_time(spark, dim):
    updates = spark.createDataFrame([(1, "FURNITURE", 12.0)], "k bigint, seg string, bal double")
    out = scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01")
    before = {r.k: r.seg for r in scd2_snapshot(out, "2022-01-01").collect()}
    after = {r.k: r.seg for r in scd2_snapshot(out, "2024-07-01").collect()}
    ancient = {r.k: r.seg for r in scd2_snapshot(out, "2019-06-01").collect()}
    assert before[1] == "MACHINERY" and after[1] == "FURNITURE"
    assert ancient[1] == "BUILDING"
    assert before[2] == after[2] == "AUTO"


def test_scd2_duplicate_update_keys_rejected(spark, dim):
    updates = spark.createDataFrame(
        [(1, "A", 1.0), (1, "B", 2.0)], "k bigint, seg string, bal double"
    )
    with pytest.raises(ValueError, match="more than one row"):
        scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01")


def test_scd2_null_update_key_rejected(spark, dim):
    updates = spark.createDataFrame(
        [(None, "A", 1.0)], "k bigint, seg string, bal double"
    )
    with pytest.raises(ValueError, match="NULL business key"):
        scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01")


def test_scd2_null_key_current_row_passes_through(spark):
    """A NULL-key open version can never match an update (equi-join skips
    NULLs) — it must survive the merge unchanged, not vanish."""
    rows = [
        (None, "ORPHAN", 1.0, T0, None, True),
        (2, "AUTO", 5.0, T0, None, True),
    ]
    dim = spark.createDataFrame(rows, SCHEMA)
    updates = spark.createDataFrame(
        [(2, "RAIL", 6.0)], "k bigint, seg string, bal double"
    )
    out = scd2_merge(dim, updates, "k", ["seg", "bal"], "2024-06-01").collect()
    orphan = [r for r in out if r.k is None]
    assert len(orphan) == 1
    assert orphan[0].is_current and orphan[0].seg == "ORPHAN"
    assert len([r for r in out if r.k == 2]) == 2  # closed + new version
