"""Ordered funnel analysis (operators/funnel.py)."""

import datetime

from qurious_spark.operators.funnel import funnel_counts, funnel_times

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, T0 + datetime.timedelta(minutes=m)) for u, t, m in rows],
        "user_id bigint, event_type string, ts timestamp",
    )


def test_funnel_order_and_window(spark):
    ev = _ev(
        spark,
        [
            # u1 completes all three in order
            (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
            # u2 clicks BEFORE viewing: chain breaks at step 2
            (2, "click", 0), (2, "view", 10),
            # u3 purchases before clicking: reaches step 2 only
            (3, "view", 0), (3, "purchase", 5), (3, "click", 30),
            # u4 completes but outside the 1-hour window
            (4, "view", 0), (4, "click", 10), (4, "purchase", 120),
            # u5 never views
            (5, "click", 0), (5, "purchase", 10),
        ],
    )
    counts = {
        r.step_name: r.n_users
        for r in funnel_counts(ev, ["view", "click", "purchase"], within="1 HOURS").collect()
    }
    assert counts == {"view": 4, "click": 3, "purchase": 1}

    times = {r.user_id: r for r in funnel_times(ev, ["view", "click", "purchase"], within="1 HOURS").collect()}
    assert times[1].t_3 is not None
    assert times[2].t_2 is None  # click predates view
    assert times[3].t_2 is not None and times[3].t_3 is None
    assert times[4].t_2 is not None and times[4].t_3 is None  # outside window
    assert 5 not in times  # never did step 1


def test_funnel_no_window_bound(spark):
    ev = _ev(spark, [(1, "view", 0), (1, "click", 10_000)])
    counts = {r.step_name: r.n_users for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert counts == {"view": 1, "click": 1}
