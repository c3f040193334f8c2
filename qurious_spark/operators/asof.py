"""As-of join: for each left row, the most recent right row at-or-before it.

Spark lacks a native as-of join (Pandas has merge_asof; DuckDB has ASOF
JOIN). The scalable implementation here avoids the naive join-then-rank
(which explodes to |L|x|R| per key before pruning): union both sides into one
stream, sort within key partition, and carry the latest right payload forward
with ``last(ignorenulls=True)`` over a running window. One shuffle on the
key, linear work per partition — survives 100 TB event tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_expr: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the latest
    ``right`` row with the same ``on`` key and ``right_ts <= left_ts``
    (inclusive, matching DuckDB ASOF semantics). Payload columns come back
    prefixed ``asof_`` and are NULL when no prior right row exists.

    ``direction="forward"`` (pandas merge_asof parity) matches the EARLIEST
    right row with ``right_ts >= left_ts`` instead — same union+window plan
    mirrored onto a [current, unbounded following] frame.

    Ties on the timestamp resolve deterministically: right rows at the same
    instant are visible to equal-time left rows in both directions; among
    equal-time right rows, backward picks the latest ``right_payload[0]``
    and forward the earliest.

    The payload travels as ONE struct column and a single
    ``last/first(ignorenulls)`` carries the whole struct, so every
    ``asof_*`` column comes from the SAME matched right row — per-column
    carries would skip a NULL payload cell to a different row's value,
    diverging from pandas ``merge_asof`` (which returns the matched row's
    NULL).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    lcols = [c for c in left.columns]
    if not right_payload:
        return left.filter(tolerance_expr) if tolerance_expr is not None else left

    from pyspark.sql.types import StructField, StructType

    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_payload]
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("__r"),
    )
    tiebreak = F.col("__r").getField(right_payload[0])
    if direction == "backward":
        # equal-time right rows sort BEFORE left so they are visible to the
        # running last() over the past frame
        w = (
            Window.partitionBy("__k")
            .orderBy(
                F.col("__t").asc(), F.col("__is_right").desc(), tiebreak.asc_nulls_first()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)
    else:
        # mirrored: equal-time right rows sort AFTER left so they are
        # visible to the first() over the future frame
        w = (
            Window.partitionBy("__k")
            .orderBy(
                F.col("__t").asc(), F.col("__is_right").asc(), tiebreak.asc_nulls_first()
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)
    combined = l.unionByName(r).withColumn("__asof", pick("__r"))
    out = combined.filter(F.col("__is_right") == 0).select(
        *lcols,
        *[F.col("__asof").getField(c).alias(f"asof_{c}") for c in right_payload],
    )
    if tolerance_expr is not None:
        out = out.filter(tolerance_expr)
    return out
