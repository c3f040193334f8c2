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
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the latest
    ``right`` row with the same ``on`` key and ``right_ts <= left_ts``
    (inclusive, matching DuckDB ASOF semantics). Payload columns come back
    prefixed ``asof_`` and are NULL when no prior right row exists.

    Ties on the timestamp resolve deterministically: right rows at the same
    instant sort before left rows (so an equal-time right row IS visible),
    and among equal-time right rows the one latest in ``right_payload[0]``
    order wins.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    lcols = [c for c in left.columns]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    tiebreak = F.col(f"__r_{right_payload[0]}") if right_payload else F.lit(0)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc(), tiebreak.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    combined = l.unionByName(r)
    for c in right_payload:
        combined = combined.withColumn(
            f"asof_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out = combined.filter(F.col("__is_right") == 0).select(
        *lcols, *[f"asof_{c}" for c in right_payload]
    )
    if tolerance_expr is not None:
        out = out.filter(tolerance_expr)
    return out
