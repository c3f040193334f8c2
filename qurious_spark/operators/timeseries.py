"""Time-series resampling: regular buckets, gap rows, and fill strategies.

The reference engine has no time-series surface (batch relational only —
SURVEY §1.1), but an events/metrics pipeline at corpus scale needs the
classic downsample-and-fill shape: bucket an irregular event stream onto a
regular grid, materialize the empty buckets, then fill them (forward-fill
for last-observation-carried-forward metrics, zero for additive counts,
linear interpolation for sampled gauges). TimescaleDB calls this
``time_bucket_gapfill`` + ``locf``/``interpolate``; this module is the
Spark-first equivalent.

Scale design:
- the aggregation is an ordinary ``groupBy(keys, bucket)`` — partial
  map-side combine, one shuffle on (keys, bucket);
- the spine (every bucket each key should have) is generated
  **distributed**: one ``sequence()`` array per key row, exploded on the
  executors — no driver-side range loop, no cross join against a
  calendar table;
- fills are windows partitioned by key and ordered by bucket — state per
  partition is O(1) (``last`` with ignorenulls), and keys spread across
  the cluster. Nothing in the plan is proportional to the bucket count on
  a single node except each key's own series, which is the inherent shape
  of the problem.

A key whose series is enormous (years of 1-second buckets) concentrates
its spine in one task; pick ``step_seconds`` so per-key bucket counts stay
bounded, the same sizing rule TimescaleDB applies to gapfill grids.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FILLS = ("none", "ffill", "zero", "linear")


def bucketize(df: DataFrame, ts_col: str, step_seconds: int) -> DataFrame:
    """Add ``__bucket`` = epoch-second bucket start (bigint, step-aligned)."""
    step = int(step_seconds)
    if step <= 0:
        raise ValueError("step_seconds must be positive")
    return df.withColumn(
        "__bucket",
        (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast("bigint"),
    )


def resample(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, Column]],
    fill: str = "none",
    fill_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Aggregate ``df`` onto a regular ``step_seconds`` grid per ``keys``,
    materializing every bucket between each key's first and last event.

    ``aggs`` is a list of ``(output_name, aggregate_column)``; ``fill``
    applies to ``fill_cols`` (default: every aggregate output):

    - ``none``   — gap rows keep NULL;
    - ``zero``   — gap rows get 0 (additive counts/sums);
    - ``ffill``  — last observation carried forward;
    - ``linear`` — linear interpolation between the surrounding
      observations (ends stay NULL/ffill-able by a second pass).

    Output columns: ``*keys, bucket (bigint epoch seconds), *aggs``.
    """
    if fill not in FILLS:
        raise ValueError(f"fill must be one of {FILLS}, got {fill!r}")
    if not keys:
        # a key-less series would need an UNPARTITIONED fill window — every
        # bucket through one task, the classic scale-killer. Callers with a
        # genuinely global series should pass a constant key column and
        # accept that the series itself is single-task by nature.
        raise ValueError("resample requires at least one key column")
    step = int(step_seconds)
    names = [n for n, _ in aggs]
    targets = list(fill_cols) if fill_cols is not None else names
    unknown = [t for t in targets if t not in names]
    if unknown:
        # withColumn on an unknown name would silently CREATE a column
        raise ValueError(f"fill_cols not in aggs outputs: {unknown}")
    keys = list(keys)

    binned = bucketize(df, ts_col, step)
    agg = binned.groupBy(*keys, "__bucket").agg(
        *[c.alias(n) for n, c in aggs]
    )

    # Distributed spine: one row per key carrying its [min, max] bucket
    # range, expanded to the full grid with sequence+explode on executors.
    spine = (
        binned.groupBy(*keys)
        .agg(F.min("__bucket").alias("__mn"), F.max("__bucket").alias("__mx"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"), F.lit(step).cast("bigint"))
            ).alias("__bucket"),
        )
    )
    out = spine.join(agg, [*keys, "__bucket"], "left")

    if fill == "zero":
        out = out.select(
            *keys,
            "__bucket",
            *[
                (F.coalesce(F.col(n), F.lit(0)).alias(n) if n in targets else F.col(n))
                for n, _ in aggs
            ],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for n in targets:
            out = out.withColumn(n, F.last(n, ignorenulls=True).over(w))
    elif fill == "linear":
        for n in targets:
            out = _interpolate_linear(out, keys, "__bucket", n)
    return out.withColumnRenamed("__bucket", "bucket")


def _interpolate_linear(
    df: DataFrame, keys: Sequence[str], t_col: str, v_col: str
) -> DataFrame:
    """Replace NULL ``v_col`` with the linear interpolation between the
    nearest non-NULL observations before and after (by ``t_col``). Rows
    before the first / after the last observation stay NULL."""
    past = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    future = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col(v_col).isNotNull(), F.col(t_col))
    pv = F.last(v_col, ignorenulls=True).over(past)
    pt = F.last(obs_t, ignorenulls=True).over(past)
    nv = F.first(v_col, ignorenulls=True).over(future)
    nt = F.first(obs_t, ignorenulls=True).over(future)
    interp = pv + (nv - pv) * (F.col(t_col) - pt) / (nt - pt)
    return df.withColumn(
        v_col,
        F.when(F.col(v_col).isNotNull(), F.col(v_col)).otherwise(
            F.when(pv.isNotNull() & nv.isNotNull(), interp)
        ),
    )
