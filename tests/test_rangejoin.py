"""Range join: equivalence vs naive non-equi join, left semantics, plan shape."""

import pytest
from pyspark.sql import functions as F

from qurious_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.5, 3.0, 7.2, 10.0, 15.5, 99.0, -2.0])],
        "pid bigint, p double",
    )
    intervals = spark.createDataFrame(
        [
            (0, 0.0, 5.0),
            (1, 2.5, 8.0),
            (2, 9.9, 10.0),
            (3, 50.0, 40.0),  # inverted -> dropped
            (4, -5.0, -1.0),
        ],
        "iid bigint, s double, e double",
    )
    return points, intervals


def _naive(points, intervals):
    return points.join(
        intervals,
        (points["p"] >= intervals["s"]) & (points["p"] <= intervals["e"]),
        "inner",
    )


@pytest.mark.parametrize("bin_width", [0.7, 5.0, 1000.0])
def test_inner_matches_naive_any_bin_width(frames, bin_width):
    points, intervals = frames
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, F.col("p"), F.col("s"), F.col("e"), bin_width
        ).collect()
    )
    exp = sorted((r["pid"], r["iid"]) for r in _naive(points, intervals).collect())
    assert got == exp and len(exp) > 0


def test_left_keeps_unmatched_points(frames):
    points, intervals = frames
    rows = range_join(
        points, intervals, F.col("p"), F.col("s"), F.col("e"), 5.0, how="left"
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    assert sorted(by_pid) == [0, 1, 2, 3, 4, 5, 6]  # every point present
    assert by_pid[5] == [None]  # p=99 matches nothing
    assert sorted(by_pid[1]) == [0, 1]  # p=3.0 in two intervals


def test_plan_has_no_nested_loop(frames):
    points, intervals = frames
    plan = range_join(
        points, intervals, F.col("p"), F.col("s"), F.col("e"), 5.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.slow
def test_interval_overlap_join_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from qurious_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 25.0), (3, 5.0, 6.0), (4, 100.0, 200.0)],
        "lid int, s double, e double",
    )
    right = spark.createDataFrame(
        [(10, 9.0, 21.0), (11, 6.5, 7.0), (12, 199.0, 300.0), (13, 500.0, 501.0)],
        "rid int, s double, e double",
    )
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, F.col("s"), F.col("e"), F.col("s"), F.col("e"), bin_width=7.0
        ).collect()
    }
    brute = {
        (r.lid, r.rid)
        for r in left.alias("l")
        .crossJoin(right.alias("r"))
        .filter((F.col("l.s") <= F.col("r.e")) & (F.col("r.s") <= F.col("l.e")))
        .collect()
    }
    assert got == brute
    assert (1, 10) in got and (2, 10) in got and (4, 12) in got and (3, 10) not in got
    # each overlapping pair appears exactly once despite multi-bin overlaps
    rows = interval_overlap_join(
        left, right, F.col("s"), F.col("e"), F.col("s"), F.col("e"), bin_width=0.5
    ).collect()
    assert len(rows) == len({(r.lid, r.rid) for r in rows})
