"""Structured Streaming surface over event tables.

The reference engine is batch-only (SURVEY.md §2.5: no watermarks, windows,
or state); this module is the greenfield streaming face of the engine,
designed Spark-first: ``readStream`` → declarative transforms → sinks,
watermarks for late data, ``session_window`` for sessionization, and
``applyInPandasWithState`` for custom stateful logic (running
totals, streaming Misra-Gries, LOCF gapfill).

The batch-mode equivalents of these aggregations are oracle-checked in
qurious_spark/queries/events.py — the same ``F.window`` / ``F.session_window``
expressions are reused here, so streaming correctness inherits the checked
semantics; tests drive the streams with availableNow triggers.
"""

from qurious_spark.streaming.gapfill import locf_stream
from qurious_spark.streaming.scd import scd2_stream
from qurious_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    sliding_counts,
    run_to_parquet,
    sessionized_counts,
    tumbling_counts,
    user_running_totals,
)

__all__ = [
    "locf_stream",
    "scd2_stream",
    "read_events_stream",
    "run_to_memory",
    "sliding_counts",
    "run_to_parquet",
    "sessionized_counts",
    "tumbling_counts",
    "user_running_totals",
]
