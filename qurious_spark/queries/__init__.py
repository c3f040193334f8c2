"""Query registry: every operator the engine claims, as a (spark, oracle) pair.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver runs both
at sf0.01 and hash-compares; ``tools/check_correctness.py`` is the local
replica of that gate.

Conventions (driver contract):
- every computed column is aliased identically on both sides;
- double-typed aggregates are wrapped in ROUND(.., 4) on BOTH sides so
  partitioned float summation noise can't flip the hash;
- EXTRACT-style results are cast to BIGINT on both sides (Spark returns int,
  DuckDB bigint);
- integer SUMs (plain, DISTINCT, or SUM over CASE) are cast to BIGINT on both
  sides — DuckDB widens integer SUM to HUGEINT (int128) while Spark stays
  BIGINT, and the driver's value-hash is representation-sensitive.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_registered_views: dict[int, str] = {}


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views once per (session, sf_dir)."""
    key = id(spark)
    if _registered_views.get(key) == sf_dir:
        return
    from qurious_spark.sources.readers import load_tables

    load_tables(spark, sf_dir)
    _registered_views[key] = sf_dir


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from qurious_spark.sources.readers import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None):
    if name in REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    REGISTRY[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def sql_query(name: str, spark_sql: str, duck_sql: str | None = None) -> None:
    """Register a query whose Spark side is plain SQL over the testdata views.

    When ``duck_sql`` is None the same text is used for the DuckDB oracle
    (ANSI-compatible queries).
    """

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(_sql)

    register(name, fn, duck_sql if duck_sql is not None else spark_sql)


def df_query(name: str, oracle: str | None):
    """Decorator for DataFrame-API query functions."""

    def deco(fn):
        register(name, fn, oracle)
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    import qurious_spark.queries.relational  # noqa: F401
    import qurious_spark.queries.scalar  # noqa: F401
    import qurious_spark.queries.tpch  # noqa: F401
    import qurious_spark.queries.text  # noqa: F401
    import qurious_spark.queries.dedup  # noqa: F401
    import qurious_spark.queries.vector  # noqa: F401
    import qurious_spark.queries.events  # noqa: F401
    import qurious_spark.queries.session_dml  # noqa: F401
    import qurious_spark.queries.multimodal  # noqa: F401
    import qurious_spark.queries.sketches  # noqa: F401
    import qurious_spark.queries.sampling  # noqa: F401
    import qurious_spark.queries.pipeline  # noqa: F401
