"""Streaming SCD2: maintain a versioned dimension table from an update
stream.

The streaming face of ``operators/scd.py``: each micro-batch of dimension
updates is applied to a managed SCD2 table with one set-based
``scd2_merge`` pass — changed keys get their open version closed and a new
version inserted, effective at the batch's own event time. State lives in
the table (queryable at every point, point-in-time snapshots via
``scd2_snapshot``); the streaming query itself is stateless, so a restart
resumes from the sink's checkpoint offsets like the incremental rollup.

Within a micro-batch, multiple updates for one key are collapsed to the
LATEST by event time (deterministic tiebreak on the attribute tuple) —
SCD2 has no defined order for same-batch versions, the same rule the batch
operator enforces by rejecting duplicate keys outright.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qurious_spark.operators.scd import scd2_merge
from qurious_spark.checkpoint import checkpoint as _checkpoint


def scd2_stream(
    updates: DataFrame,
    session,
    table_name: str,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    checkpoint: str,
) -> None:
    """Drain ``updates`` (a streaming DataFrame carrying ``key_col``,
    ``attr_cols`` and an event-time ``ts_col``) into the managed SCD2 table
    ``table_name`` (schema: ``key, *attrs, valid_from, valid_to,
    is_current``) with availableNow. Each batch's effective timestamp is
    the batch's max ``ts_col`` — deterministic for a given batch split —
    clamped to the open versions' max ``valid_from`` so a late drain can
    never produce an inverted validity interval."""
    attr_cols = list(attr_cols)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # latest update per key within the batch (ties: highest attr tuple)
        w = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), *[F.col(c).desc_nulls_last() for c in attr_cols]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(key_col, *attr_cols)
        )
        # The effective/floor timestamps round-trip driver-side into
        # scd2_merge's session-zone string parse (to_timestamp(lit(s))).
        # Extract them as SESSION-zone wall strings JVM-side (date_format
        # renders an LTZ instant in the session zone) so the re-parse
        # restores the exact instant. Collecting the raw timestamp instead
        # yields a naive datetime in the DRIVER's zone — re-parsing that
        # wall in a non-UTC session shifts every close/open boundary by the
        # zone offset (caught by the r12 TZ gate under Asia/Kathmandu,
        # where +05:45 pushed close DATES across midnight). Fixed-width
        # strings also keep the clamp's < comparison chronological.
        fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        batch_ts = batch_df.agg(F.date_format(F.max(ts_col), fmt)).collect()[0][0]
        # detach from the micro-batch's cloned session before mutating the
        # managed table (same rule as streaming/rollup.py)
        latest = _checkpoint(latest, eager=True)
        dim = session.table(table_name)
        # monotonicity clamp (round-5 advisor finding): a late-arriving
        # drain whose max event time precedes an open version's valid_from
        # would close that version with valid_to < valid_from — inverted
        # validity intervals. Clamp the effective timestamp to the open
        # versions' max valid_from; at the clamp point the closed version
        # becomes zero-length (valid_from == valid_to), which scd2_snapshot
        # correctly never surfaces. The floor is computed ONLY over open
        # versions whose key the batch actually touches (round-6 advisor
        # refinement): an unrelated key's recent valid_from must not inflate
        # the effective timestamp stamped onto other keys' history.
        floor_ts = (
            dim.filter(F.col("is_current"))
            .join(latest.select(key_col), on=key_col, how="left_semi")
            .agg(F.date_format(F.max("valid_from"), fmt))
            .collect()[0][0]
        )
        if floor_ts is not None and batch_ts < floor_ts:
            batch_ts = floor_ts
        merged = _checkpoint(
            scd2_merge(dim, latest, key_col, attr_cols, batch_ts),
            eager=True,
        )
        session.replace_table_data(table_name, merged)

    q = (
        updates.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
