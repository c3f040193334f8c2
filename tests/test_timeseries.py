"""resample/gap-fill operator (operators/timeseries.py)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from qurious_spark.operators.timeseries import resample


def _series(spark):
    # key "a": observations at minutes 0, 1, 4 (gap at 2, 3); key "b": 0, 2.
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(k="a", ts=base, v=10.0),
        Row(k="a", ts=base + dt.timedelta(minutes=1), v=20.0),
        Row(k="a", ts=base + dt.timedelta(minutes=4), v=50.0),
        Row(k="b", ts=base, v=1.0),
        Row(k="b", ts=base + dt.timedelta(minutes=2), v=3.0),
    ]
    return spark.createDataFrame(rows)


def _collect(df):
    return {
        (r["k"], r["bucket"]): (r["v_sum"], r["n"])
        for r in df.collect()
    }


def _aggs():
    return [("v_sum", F.sum("v")), ("n", F.count("*").cast("bigint"))]


def test_spine_materializes_gaps(spark):
    out = resample(_series(spark), "ts", 60, ["k"], _aggs(), fill="none")
    got = _collect(out)
    # a: 5 buckets (0..4), b: 3 buckets (0..2)
    assert len(got) == 8
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got[("a", base + 120)] == (None, None)
    assert got[("a", base + 180)] == (None, None)
    assert got[("b", base + 60)] == (None, None)
    assert got[("a", base + 240)] == (50.0, 1)


def test_zero_fill(spark):
    out = resample(_series(spark), "ts", 60, ["k"], _aggs(), fill="zero")
    got = _collect(out)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got[("a", base + 120)] == (0.0, 0)
    assert got[("b", base + 60)] == (0.0, 0)


def test_ffill_carries_last_observation(spark):
    out = resample(
        _series(spark), "ts", 60, ["k"], _aggs(), fill="ffill", fill_cols=["v_sum"]
    )
    got = _collect(out)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got[("a", base + 120)] == (20.0, None)  # carried, count untouched
    assert got[("a", base + 180)] == (20.0, None)
    assert got[("a", base + 240)] == (50.0, 1)  # real observation wins
    assert got[("b", base + 60)] == (1.0, None)


def test_linear_interpolation(spark):
    out = resample(
        _series(spark), "ts", 60, ["k"], _aggs(), fill="linear", fill_cols=["v_sum"]
    )
    got = _collect(out)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    # a: 20 @ t=1min, 50 @ t=4min -> t=2min: 30, t=3min: 40
    assert got[("a", base + 120)][0] == pytest.approx(30.0)
    assert got[("a", base + 180)][0] == pytest.approx(40.0)
    # b: 1 @ 0, 3 @ 2min -> 1min: 2
    assert got[("b", base + 60)][0] == pytest.approx(2.0)


def test_linear_leaves_untracked_ends_null(spark):
    # single observation per key: nothing before/after to interpolate with
    rows = [
        Row(k="c", ts=dt.datetime(2024, 1, 1, 0, 0), v=None),
        Row(k="c", ts=dt.datetime(2024, 1, 1, 0, 2), v=5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample(df, "ts", 60, ["k"], [("v_sum", F.sum("v"))], fill="linear")
    got = {r["bucket"]: r["v_sum"] for r in out.collect()}
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got[base] is None  # leading edge: no prior observation
    assert got[base + 60] is None  # between a NULL agg and the observation
    assert got[base + 120] == 5.0


def test_bad_args_rejected(spark):
    df = _series(spark)
    with pytest.raises(ValueError):
        resample(df, "ts", 0, ["k"], _aggs())
    with pytest.raises(ValueError):
        resample(df, "ts", 60, ["k"], _aggs(), fill="bogus")


# --- property test: resample vs an independent pandas reference ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _obs(draw):
    """Random small multi-key series: (key, minute offset, value)."""
    n = draw(st.integers(1, 12))
    return [
        (
            draw(st.sampled_from(["a", "b"])),
            draw(st.integers(0, 30)),
            float(draw(st.integers(-5, 50))),
        )
        for _ in range(n)
    ]


def _pandas_reference(obs, step=60):
    """Straight-line pandas implementation of the same spec."""
    import pandas as pd

    base = dt.datetime(2024, 1, 1).timestamp()
    df = pd.DataFrame(obs, columns=["k", "m", "v"])
    df["bucket"] = ((base + df["m"] * 60) // step * step).astype("int64")
    agg = df.groupby(["k", "bucket"])["v"].sum()
    out = {}
    for k, grp in agg.groupby(level=0):
        buckets = grp.index.get_level_values(1)
        full = range(int(buckets.min()), int(buckets.max()) + step, step)
        series = grp.droplevel(0).reindex(full).ffill()
        for b, v in series.items():
            out[(k, int(b))] = v
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(obs=_obs())
def test_resample_ffill_matches_pandas(spark, obs):
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(k=k, ts=base + dt.timedelta(minutes=m), v=v) for k, m, v in obs
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["k"], r["bucket"]): r["v_sum"]
        for r in resample(
            df, "ts", 60, ["k"], [("v_sum", F.sum("v"))], fill="ffill"
        ).collect()
    }
    want = _pandas_reference(obs)
    assert got.keys() == want.keys()
    for key in want:
        assert got[key] == pytest.approx(want[key]), key


def test_unknown_fill_cols_rejected(spark):
    with pytest.raises(ValueError, match="fill_cols"):
        resample(_series(spark), "ts", 60, ["k"], _aggs(), fill="ffill", fill_cols=["nope"])
