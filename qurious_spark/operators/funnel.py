"""Ordered funnel analysis over an event stream.

Classic event analytics: of the users who did step 1, how many went on to
do step 2 AFTER it, then step 3 after that — optionally within a time
window of the first step. The naive formulation is a per-user sequence
scan; the distributed shape here is a chain of conditional MIN aggregates:

- ``t1`` = earliest step-1 event per user (one grouped agg);
- ``t_k`` = earliest step-k event strictly after ``t_{k-1}`` (a join back
  on ``user_id`` — co-partitioned with the previous agg's shuffle — plus
  another grouped agg).

Every stage shuffles on ``user_id`` only (k small, reuses the same hash
partitioning — AQE coalesces the co-partitioned exchanges), carries one
timestamp per user, and never materializes per-user event lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each funnel step, in order.

    Returns one row per user who completed step 1, with columns
    ``t_1 .. t_k`` (NULL once the chain breaks). ``within`` bounds the
    whole funnel relative to ``t_1`` (e.g. ``"24 hours"``  — an INTERVAL
    literal suffix).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    deadline = (
        F.col("t_1") + F.expr(f"INTERVAL {within}") if within is not None else None
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        joined = cur.join(nxt, user_col, "left")
        cond = F.col("__ts") > F.col(f"t_{k - 1}")
        if deadline is not None:
            cond = cond & (F.col("__ts") <= deadline)
        tk = F.min(F.when(cond, F.col("__ts"))).alias(f"t_{k}")
        cur = joined.groupBy(user_col, *[f"t_{i}" for i in range(1, k)]).agg(tk)
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Funnel summary: ``(step, step_name, n_users)`` — users reaching each
    step in order. A k-row result from one narrow per-user frame."""
    times = funnel_times(events, steps, user_col, type_col, ts_col, within)
    counts = times.agg(
        *[
            F.count(F.col(f"t_{i}")).cast("bigint").alias(f"__c{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # escape embedded quotes: a step name like "add'l" must survive the
    # stack() SQL string as a valid literal
    lits = [s.replace("'", "''") for s in steps]
    rows = ", ".join(
        f"{i}, '{s}', __c{i}" for i, s in enumerate(lits, start=1)
    )
    return counts.select(
        F.expr(f"stack({len(steps)}, {rows}) AS (step, step_name, n_users)")
    ).select(F.col("step").cast("int"), "step_name", "n_users")
