"""Managed-table DML as an oracle-verified query.

The reference's DML surface (INSERT/DELETE executable, UPDATE planned but
rejected — qurious/src/execution/session.rs:128-151) is implemented by our
Session's managed tables (session.py).  This entry proves the full
CREATE AS / INSERT / UPDATE / DELETE round trip against a DuckDB oracle that
expresses the same final state relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from qurious_spark.queries import df_query, table


@df_query(
    "dml_roundtrip",
    """
    SELECT r_regionkey,
           CASE WHEN r_regionkey = 0 THEN 'RENAMED' ELSE r_name END AS r_name
    FROM region
    WHERE r_regionkey <> 2
    UNION ALL
    SELECT 99 AS r_regionkey, 'NEWLAND' AS r_name
    """,
)
def dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qurious_spark.session import Session

    s = Session(spark)
    s.register_table("dml_src", table(spark, sf_dir, "region"))
    s.sql("DROP TABLE IF EXISTS dml_t")
    s.sql("CREATE TABLE dml_t AS SELECT r_regionkey, r_name FROM dml_src")
    s.sql("INSERT INTO dml_t VALUES (99, 'NEWLAND')")
    s.sql("UPDATE dml_t SET r_name = 'RENAMED' WHERE r_regionkey = 0")
    s.sql("DELETE FROM dml_t WHERE r_regionkey = 2")
    return s.sql("SELECT r_regionkey, r_name FROM dml_t")


@df_query(
    "udf_vectorized",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity * 2 + 1, 4) AS boosted
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas_udf registered by name through the Session —
    the engine analogue of the reference's vectorized UDF trait
    (qurious/src/functions/mod.rs:10-21); the oracle replicates the
    arithmetic in plain SQL."""
    import pandas as pd

    from qurious_spark.session import Session

    s = Session(spark)

    def boost(v):
        return v * 2 + 1

    # real type objects: this module's `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot inspect
    boost.__annotations__ = {"v": pd.Series, "return": pd.Series}

    s.register_udf("Q_BOOST", boost, "double")
    from qurious_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               ROUND(Q_BOOST(l_quantity), 4) AS boosted
        FROM lineitem
        WHERE l_quantity > 45
        """
    )
