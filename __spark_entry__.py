"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator inventory from
``qurious_spark.queries`` (see SURVEY.md §2 and qurious_spark/queries/*).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    import qurious_spark.queries as q

    q.load_all()
    return q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = _registry()
    return q.REGISTRY["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority-ordered
    so a bounded check window still covers every §2 row and pipeline
    family (qurious_spark.queries.DRIVER_PRIORITY)."""
    return _registry().ordered_registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    q = _registry()
    ordered = q.ordered_registry()
    return {n: q.ORACLES[n] for n in ordered if n in q.ORACLES}
