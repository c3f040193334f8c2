"""Range join: points joined into intervals without a nested-loop plan.

A plain ``ON p BETWEEN s AND e`` condition has no equi-key, so Spark plans
BroadcastNestedLoopJoin (or a cartesian product) — O(|P| x |I|) compares,
hopeless at corpus scale. The standard fix (built into Databricks' range-join
hint, absent from OSS Spark) is **bin bucketing**:

- choose a bin width ``w``;
- each point maps to bin ``floor(p / w)``;
- each interval explodes to every bin it overlaps
  (``sequence(floor(s/w), floor(e/w))`` — cheap when interval length is
  comparable to ``w``);
- equi-join on the bin id, then re-check the exact predicate as a residual
  filter.

The join becomes a shuffle keyed on bin id: compares drop from |P| x |I| to
pairs sharing a bin; pick ``w`` near the typical interval length so each
interval lands in O(1) bins. Correctness does not depend on ``w`` (any
overlap shares at least one bin); only performance does.

The reference engine's only non-equi path is its NestedLoopJoinExec
(qurious/src/physical/plan/join/nest_loop_join.rs:42-70) — this operator is
the scale-path replacement for the interval-predicate subset of those joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_expr: Column,
    start_expr: Column,
    end_expr: Column,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``start_expr <= point_expr <= end_expr`` (inclusive both ends).

    ``point_expr`` / ``start_expr`` / ``end_expr`` must be numeric columns
    (cast timestamps with ``unix_timestamp`` first). ``how`` supports
    ``inner`` and ``left`` (unmatched points kept with NULL interval side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    p = points.withColumn("__p", point_expr.cast("double"))
    i = intervals.withColumn("__s", start_expr.cast("double")).withColumn(
        "__e", end_expr.cast("double")
    )
    p = p.withColumn("__pbin", F.floor(F.col("__p") / w))
    i = i.filter(F.col("__s") <= F.col("__e")).withColumn(
        "__ibin",
        F.explode(F.sequence(F.floor(F.col("__s") / w), F.floor(F.col("__e") / w))),
    )
    cond = (
        (p["__pbin"] == i["__ibin"])
        & (p["__p"] >= i["__s"])
        & (p["__p"] <= i["__e"])
    )
    # each (point, interval) pair shares exactly one bin (the point's), so
    # the equi-join emits every qualifying pair exactly once — no dedup step.
    if how == "inner":
        out = p.join(i, cond, "inner")
    else:
        matched = p.join(i, cond, "inner")
        unmatched = p.join(i, cond, "left_anti")
        out = matched.unionByName(unmatched, allowMissingColumns=True)
    return out.drop("__p", "__s", "__e", "__pbin", "__ibin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: Column,
    l_end: Column,
    r_start: Column,
    r_end: Column,
    bin_width: float,
    on: list[str] | None = None,
) -> DataFrame:
    """Join interval rows of ``left`` to interval rows of ``right`` where the
    intervals overlap (``l_start <= r_end AND r_start <= l_end``, inclusive),
    optionally also equi-keyed on ``on`` columns (e.g. the same user).

    Same bin-bucketing idea as :func:`range_join`, applied to BOTH sides:
    each interval explodes to the bins it covers; overlapping intervals
    share at least one bin, so candidates come from an equi-join on
    (``on`` keys + bin id), deduplicated, then the exact overlap predicate
    is re-checked. Compares drop from |L| x |R| to pairs sharing a bin —
    pick ``bin_width`` near the typical interval length. Correctness never
    depends on the width.
    """
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")
    keys = list(on or [])

    def prep(df: DataFrame, start: Column, end: Column, side: str) -> DataFrame:
        s, e = f"__{side}s", f"__{side}e"
        out = (
            df.withColumn(s, start.cast("double"))
            .withColumn(e, end.cast("double"))
            .filter(F.col(s) <= F.col(e))
        )
        return out.select(
            *keys,
            F.struct(*[F.col(c) for c in df.columns]).alias(f"__{side}"),
            F.col(s),
            F.col(e),
            F.explode(
                F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))
            ).alias("__bin"),
        )

    lg = prep(left, l_start, l_end, "l")
    rg = prep(right, r_start, r_end, "r")
    cand = (
        lg.join(rg, keys + ["__bin"])
        .filter((F.col("__ls") <= F.col("__re")) & (F.col("__rs") <= F.col("__le")))
        # an overlapping pair shares every bin in the overlap — keep one
        .withColumn(
            "__first_shared",
            F.greatest(
                F.floor(F.col("__ls") / w), F.floor(F.col("__rs") / w)
            ),
        )
        .filter(F.col("__bin") == F.col("__first_shared"))
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__r.{c}").alias(f"r_{c}" if c in left.columns else c)
        for c in right.columns
    ]
    return cand.select(*out_cols)
