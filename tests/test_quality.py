"""Deequ-style quality gate (operators/quality.py)."""

from pyspark.sql import Row

from qurious_spark.operators.quality import quality_report


def _by_check(df):
    return {(r.check, r.target): (r.metric, r.passed) for r in df.collect()}


def test_metrics_and_fail_paths(spark):
    rows = [
        Row(k=1, v=10.0, fk=1),
        Row(k=2, v=None, fk=1),
        Row(k=2, v=500.0, fk=9),  # dup key, out-of-range v, orphan fk
        Row(k=3, v=50.0, fk=None),  # NULL fk is not an orphan
    ]
    df = spark.createDataFrame(rows, "k long, v double, fk long")
    dim = spark.createDataFrame([Row(id=1)], "id long")
    rep = _by_check(
        quality_report(
            df,
            completeness={"v": 0.7},
            unique=["k"],
            ranges={"v": (0.0, 100.0)},
            foreign_keys=[("fk", dim, "id")],
        )
    )
    assert rep[("completeness", "v")] == (0.75, True)  # 3/4 >= 0.7
    assert rep[("unique", "k")] == (0.75, False)  # 3 distinct / 4 non-null
    m, p = rep[("range", "v")]
    assert (m, p) == (round(2 / 3, 6), False)  # 500 outside, NULL ignored
    m, p = rep[("foreign_key", "fk")]
    assert (m, p) == (round(2 / 3, 6), False)  # fk=9 orphan, NULL ignored


def test_empty_frame_vacuous_passes(spark):
    df = spark.createDataFrame([], "k long, v double")
    rep = _by_check(
        quality_report(df, completeness={"v": 1.0}, unique=["k"], ranges={"v": (0, 1)})
    )
    assert all(m == 1.0 and p for m, p in rep.values())


def test_all_green(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=1.0), Row(k=2, v=2.0)], "k long, v double"
    )
    rep = _by_check(quality_report(df, completeness={"v": 1.0}, unique=["k"], ranges={"v": (0, 5)}))
    assert all(p for _, p in rep.values())
