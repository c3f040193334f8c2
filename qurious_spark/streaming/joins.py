"""Stream-stream and stream-static joins over the events stream.

The reference is batch-only; a 100 TB ingest pipeline needs the streaming
join repertoire Spark provides:

- ``stream_static_enrich``: stream joined to a static dimension — no state,
  the dimension broadcasts per micro-batch (the streaming analogue of every
  TPC-H dim join).
- ``stream_stream_interval_join``: two watermarked streams equi-joined with
  an event-time interval bound.  The bound is what makes state finite: rows
  older than (watermark - interval) are evicted.  This is the canonical
  click/impression correlation shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: tuple[str, str], how: str = "inner"
) -> DataFrame:
    """Join a stream to a static DataFrame (stateless; dim side broadcast)."""
    lk, rk = on
    return stream.join(F.broadcast(dim), stream[lk] == dim[rk], how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str] = ("ts", "ts"),
    watermark: str = "2 hours",
    interval: str = "1 hour",
) -> DataFrame:
    """Equi-join two streams with an event-time interval bound.

    Emits (left, right) pairs where right.ts ∈ [left.ts, left.ts + interval].
    Both sides carry a watermark so join state is purged once event time
    passes; without the interval bound state would grow forever.
    """
    lk, rk = key
    lts, rts = ts
    lw = left.withWatermark(lts, watermark).alias("l")
    rw = right.withWatermark(rts, watermark).alias("r")
    cond = (
        (F.col(f"l.{lk}") == F.col(f"r.{rk}"))
        & (F.col(f"r.{rts}") >= F.col(f"l.{lts}"))
        & (F.col(f"r.{rts}") <= F.col(f"l.{lts}") + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond)
