"""File readers.

Spark analogues of the reference's eager file loaders
(qurious/src/datasource/file/{csv,json,parquet}.rs) — except ours stay LAZY:
``spark.read.*`` builds a scan plan with predicate pushdown / column pruning /
partition parallelism, instead of materializing the whole file in memory.
That is the core scale decision: at 100 TB a table is a parquet scan with
pushed filters, never an in-memory copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv_like(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    quote: str = '"',
    escape: str = '"',
    schema=None,
    multiline: bool = False,
) -> DataFrame:
    """CSV reader with the reference's option surface
    (qurious/src/datasource/file/csv.rs:16-72: has_header/delimiter/quote/
    escape, schema inference). ``multiline`` enables quoted embedded
    newlines — off by default because multiLine files cannot be split
    across tasks (each file parses in one task)."""
    reader = (
        spark.read.option("header", str(bool(header)).lower())
        .option("sep", delimiter or ",")
        .option("quote", quote)
        .option("escape", escape)
        .option("multiLine", str(bool(multiline)).lower())
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader that tolerates nanosecond timestamps.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` a timestamp[ns] column
    arrives as long nanos-since-epoch. We detect such columns from the
    parquet footer (driver-side, metadata-only — fine at any scale) and
    convert them to timestamps inside the plan via ``timestamp_micros`` so
    everything stays lazy and JVM-side. The conf is set HERE, at runtime
    (verified runtime-settable), so the tolerance holds on any
    SparkSession — not just ones built by our own get_spark helper.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    try:
        schema = pq.read_schema(path)
    except Exception:
        return spark.read.parquet(path)
    nano_cols = [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    if not nano_cols:
        return spark.read.parquet(path)
    # Without this a vanilla session throws "Illegal Parquet type: INT64
    # (TIMESTAMP(NANOS,..))" at scan time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # integer division: double division would lose precision on epoch-nanos
    # (~1.7e18 > 2^53) and round the microsecond up
    exprs = [
        F.timestamp_micros(F.expr(f"`{c}` div 1000")).alias(c) if c in nano_cols else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)


def read_auto(spark: SparkSession, path: str, **options) -> DataFrame:
    """Dispatch by file suffix (csv / json / parquet / tbl)."""
    lower = path.lower()
    if lower.endswith(".parquet") or lower.endswith(".pq"):
        return read_parquet(spark, path)
    if lower.endswith(".json") or lower.endswith(".ndjson"):
        return spark.read.json(path)
    if lower.endswith(".tbl"):
        return read_csv_like(spark, path, delimiter="|", header=False, **options)
    return read_csv_like(spark, path, **options)


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables at ``sf_dir`` and register
    each as a temp view. Missing files are skipped (sf dirs may not carry
    every table)."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_parquet(spark, path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
