"""qurious_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Rust engine holicc/qurious (an in-memory Arrow-based SQL engine,
see /root/reference), re-expressed Spark-first:

- ``Session`` wraps a ``SparkSession`` and exposes ``sql()`` /
  ``register_table()`` / ``register_udf()`` plus a managed in-memory table
  layer with INSERT/UPDATE/DELETE semantics (reference:
  qurious/src/execution/session.rs).
- A SQL dialect shim accepts the reference's surface that vanilla Spark SQL
  lacks: ``read_csv('p')`` / ``read_json`` / ``read_parquet`` table
  functions, ``COPY t FROM 'f' (DELIMITER '|')``, ``SHOW TABLES`` over an
  information_schema view (reference: qurious/src/planner/sql.rs:751-774,
  324-375).
- Operators beyond the reference (dedup, similarity search, text analysis,
  multimodal columns, structured streaming) live under
  ``qurious_spark.operators`` / ``functions`` / ``streaming`` and are
  designed for 100 TB scale: no driver-side collects, broadcast where small,
  shuffle-minimal plans.

Everything relational is declared via the DataFrame/SQL API so Catalyst +
Tungsten + AQE pick the physical strategy.
"""

from qurious_spark.session import Session, get_spark

__all__ = ["Session", "get_spark"]
__version__ = "0.1.0"
