"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines pack documents into contiguous context-length bins
(shards) by a deterministic global order. The core primitive is a GLOBAL
running sum of token counts — naively a single-partition window
(`Window.orderBy(...)` with no partition key moves ALL data to one task,
the classic scale cliff). Here it is the two-phase distributed prefix sum:

1. bucket the global order key into ``n_buckets`` coarse ranges; cumulative
   sums WITHIN each bucket are a partitioned window (parallel);
2. per-bucket totals (tiny: one row per bucket) get their own running sum
   on the driver-side-broadcastable frame; adding the previous-buckets
   offset to each within-bucket cumsum yields the exact global cumsum.

Everything shuffles at most once on the bucket key; no single-task stage
touches the full data. Order is engine-neutral (md5 slot, doc id), so the
whole operator hash-matches a DuckDB oracle that uses a plain global
window.

Beyond-reference scope (training-data north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qurious_spark.operators.sampling import HASH_M, _slot


def global_running_sum(
    df: DataFrame,
    val_col: str,
    order_slot: Column,
    tiebreak_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Adds ``cum``: exact running sum of ``val_col`` over the global order
    (order_slot, tiebreak_col), computed as a two-phase prefix sum."""
    bucket_width = (HASH_M + n_buckets - 1) // n_buckets
    b = df.withColumn("__slot", order_slot).withColumn(
        "__bucket", (F.col("__slot") / F.lit(bucket_width)).cast("bigint")
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__slot"), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = b.withColumn("__cum_in", F.sum(val_col).over(w_in))
    totals = b.groupBy("__bucket").agg(F.sum(val_col).alias("__t"))
    # unpartitioned window is benign by construction: it runs over the
    # per-bucket totals — exactly n_buckets (64) rows at any corpus size.
    # That's the whole point of the two-phase prefix sum: the global-order
    # dependency is reduced to a constant-size table before any single-
    # partition step.
    w_b = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn("__off", F.sum("__t").over(w_b) - F.col("__t")).select(
        "__bucket", "__off"
    )
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn("cum", F.col("__cum_in") + F.col("__off"))
        .drop("__bucket", "__cum_in", "__off")
    )


def pack_documents(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    ctx_len: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document a ``bin_id``: contiguous bins of ``ctx_len``
    tokens in md5-slot order (a document starts in the bin where its token
    interval begins; oversized documents still get exactly one bin).

    Returns the input columns + (slot, cum, bin_id).
    """
    c = global_running_sum(
        df, tokens_col, _slot(id_col), id_col, n_buckets=n_buckets
    )
    return c.withColumn(
        "bin_id",
        F.floor((F.col("cum") - F.col(tokens_col)) / F.lit(ctx_len)).cast("bigint"),
    ).withColumnRenamed("__slot", "slot")
