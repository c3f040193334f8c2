"""Schema + distribution drift (operators/drift.py)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from qurious_spark.operators.drift import psi, schema_drift


def test_schema_drift_statuses(spark):
    ref = spark.createDataFrame([], "a long, b string, c double")
    cur = spark.createDataFrame([], "a long, b int, d string")
    rows = {r.column: (r.status, r.ref_type, r.cur_type) for r in schema_drift(ref, cur).collect()}
    assert rows == {
        "b": ("type_changed", "string", "int"),
        "c": ("removed", "double", None),
        "d": ("added", None, "string"),
    }


def test_schema_drift_identical_is_empty(spark):
    df = spark.createDataFrame([], "a long, b string")
    assert schema_drift(df, df).count() == 0


def test_psi_identical_distributions_near_zero(spark):
    df = spark.createDataFrame([Row(v=float(i % 10)) for i in range(100)])
    total = [r for r in psi(df, df, "v", [3.0, 7.0]).collect() if r.bucket == -1][0]
    assert abs(total.psi) < 1e-9
    assert total.ref_frac == pytest.approx(1.0)


def test_psi_matches_hand_computation(spark):
    # ref: 80 low / 20 high; cur: 20 low / 80 high around edge 5.0
    ref = spark.createDataFrame([Row(v=1.0)] * 80 + [Row(v=9.0)] * 20)
    cur = spark.createDataFrame([Row(v=1.0)] * 20 + [Row(v=9.0)] * 80)
    total = [r for r in psi(ref, cur, "v", [5.0]).collect() if r.bucket == -1][0]
    eps = 1e-6
    want = (0.2 - 0.8) * math.log((0.2 + eps) / (0.8 + eps)) + (
        0.8 - 0.2
    ) * math.log((0.8 + eps) / (0.2 + eps))
    assert total.psi == pytest.approx(want, rel=1e-6)
    assert total.psi > 0.25  # "shifted" by the standard rule of thumb


def test_psi_empty_bucket_floored(spark):
    ref = spark.createDataFrame([Row(v=1.0)] * 10)  # nothing above the edge
    cur = spark.createDataFrame([Row(v=9.0)] * 10)  # nothing below
    rows = psi(ref, cur, "v", [5.0]).collect()
    assert all(math.isfinite(r.psi) for r in rows)
    total = [r for r in rows if r.bucket == -1][0]
    assert total.psi > 1.0  # maximal shift, finite
