"""Source/sink round trips as oracle-verified queries.

The reference's file surface (qurious/src/datasource/file/{csv,json}.rs,
COPY FROM at qurious/src/planner/sql.rs:324-375, read_* table functions at
sql.rs:751-774; COPY TO is todo!() at sql.rs:315-322 — implemented here)
previously had pytest-only coverage. These entries put each source format on
the driver's hard correctness signal: the engine side round-trips the nation
dimension through the format under test, the oracle reads the same rows
straight from parquet — any loss/corruption in write-out, inference, or
option handling breaks the hash.

Files land in a per-invocation tempdir: fixture generation only, never an
operator hot path (the round-tripped table is the 25-row nation dim).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from qurious_spark.queries import df_query, ensure_views

UINT_FIXTURE_PATH = "/tmp/qurious_uint_fixture.parquet"


def write_uint_fixture(path: str = UINT_FIXTURE_PATH) -> str:
    """Deterministic unsigned-int parquet fixture (SURVEY §7.4.2: Spark has
    no unsigned types; uint8/16→Short/Int, uint32→Long, uint64→
    Decimal(20,0) — the same up-range mapping the reference's ScalarValue
    UInt* variants require). Written by the query function at call time —
    the gate (and the driver) execute the Spark side of an entry before its
    oracle SQL, so the oracle always finds the file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "u8": pa.array([0, 200, 255], pa.uint8()),
            "u16": pa.array([0, 60000, 65535], pa.uint16()),
            "u32": pa.array([0, 4000000000, 4294967295], pa.uint32()),
            "u64": pa.array([0, 2**63, 2**64 - 1], pa.uint64()),
        }
    )
    _write_atomic(table, path)
    return path


def _write_atomic(table, path: str) -> None:
    """Write-then-rename so concurrent importers/readers of the shared
    fixture path never observe a half-written parquet file."""
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


_NATION_ORACLE = """
    SELECT CAST(n_nationkey AS BIGINT) AS k,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS rk
    FROM nation
"""


def _session(spark: SparkSession, sf_dir: str):
    from qurious_spark.session import Session

    ensure_views(spark, sf_dir)
    return Session(spark)


@df_query("source_csv_roundtrip", _NATION_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO (FORMAT CSV) + ``read_csv('dir')`` table function in FROM:
    exercises the CSV writer, header handling, and schema inference in one
    hash-checked pass."""
    s = _session(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="qurious_src_csv_"), "nation_csv")
    s.sql("DROP TABLE IF EXISTS src_csv_t")
    s.sql("CREATE TABLE src_csv_t AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
    s.sql(f"COPY src_csv_t TO '{out}' (FORMAT CSV, HEADER)")
    return s.sql(
        f"""
        SELECT CAST(n_nationkey AS BIGINT) AS k,
               n_name AS name,
               CAST(n_regionkey AS BIGINT) AS rk
        FROM read_csv('{out}')
        """
    )


@df_query("source_ndjson_roundtrip", _NATION_ORACLE)
def source_ndjson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO (FORMAT JSON) + ``read_json('dir')`` table function: NDJSON
    write/read parity (reference reader: datasource/file/json.rs:17-29)."""
    s = _session(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="qurious_src_json_"), "nation_json")
    s.sql("DROP TABLE IF EXISTS src_json_t")
    s.sql("CREATE TABLE src_json_t AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
    s.sql(f"COPY src_json_t TO '{out}' (FORMAT JSON)")
    return s.sql(
        f"""
        SELECT CAST(n_nationkey AS BIGINT) AS k,
               n_name AS name,
               CAST(n_regionkey AS BIGINT) AS rk
        FROM read_json('{out}')
        """
    )


@df_query("source_copy_tbl", _NATION_ORACLE)
def source_copy_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE + COPY FROM a pipe-delimited ``.tbl`` file (the
    reference's TPC-H load path, qurious/tests/tpch/insert.slt +
    sql.rs:324-375): typed managed-table insert from a headerless file."""
    import pyarrow.parquet as pq

    s = _session(spark, sf_dir)
    tbl_path = os.path.join(tempfile.mkdtemp(prefix="qurious_src_tbl_"), "nation.tbl")
    pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas().to_csv(
        tbl_path, sep="|", header=False, index=False
    )
    s.sql("DROP TABLE IF EXISTS src_tbl_t")
    s.sql("CREATE TABLE src_tbl_t (n_nationkey INT, n_name VARCHAR, n_regionkey INT)")
    s.sql(f"COPY src_tbl_t FROM '{tbl_path}' (DELIMITER '|')")
    return s.sql(
        """
        SELECT CAST(n_nationkey AS BIGINT) AS k,
               n_name AS name,
               CAST(n_regionkey AS BIGINT) AS rk
        FROM src_tbl_t
        """
    )


@df_query(
    "source_uint_parquet",
    f"""
    SELECT CAST(u8 AS SMALLINT) AS u8,
           CAST(u16 AS INTEGER) AS u16,
           CAST(u32 AS BIGINT) AS u32,
           CAST(CAST(u64 AS DECIMAL(20,0)) AS VARCHAR) AS u64_str
    FROM '{UINT_FIXTURE_PATH}'
    """,
)
def source_uint_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsigned parquet columns land on the §7.4.2 up-range mapping —
    uint8→smallint, uint16→int, uint32→bigint, uint64→decimal(20,0) —
    with full-range values (incl. 2^64-1) intact; DuckDB reads the native
    unsigned types from the same file and casts to the same shapes.

    The u64 column is surfaced as its decimal(20,0) DIGIT STRING on both
    sides: the driver's value-hash is representation-sensitive for 20-digit
    decimals (hash-red in r2 and r4 with rows+schema green), while the
    digit string of an exact integer decimal is engine-independent. The
    decimal mapping itself is still exercised — the cast chain goes through
    DECIMAL(20,0) before VARCHAR, so truncation/overflow would corrupt the
    digits."""
    from qurious_spark.sources.readers import read_parquet

    path = write_uint_fixture()
    df = read_parquet(spark, path)
    return df.selectExpr(
        "CAST(u8 AS SMALLINT) AS u8",
        "CAST(u16 AS INT) AS u16",
        "CAST(u32 AS BIGINT) AS u32",
        "CAST(CAST(u64 AS DECIMAL(20,0)) AS STRING) AS u64_str",
    )


@df_query("source_orc_roundtrip", _NATION_ORACLE)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO (FORMAT ORC) + ``read_orc('dir')`` table function: ORC
    write/read parity via Spark's built-in ORC source. The reference's file
    surface is csv/json/parquet only (qurious/src/datasource/file/); ORC is
    an extension — same columnar, predicate-pushdown-capable scan path as
    parquet, so it slots into the identical reader audit."""
    s = _session(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="qurious_src_orc_"), "nation_orc")
    s.sql("DROP TABLE IF EXISTS src_orc_t")
    s.sql("CREATE TABLE src_orc_t AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
    s.sql(f"COPY src_orc_t TO '{out}' (FORMAT ORC)")
    return s.sql(
        f"""
        SELECT CAST(n_nationkey AS BIGINT) AS k,
               n_name AS name,
               CAST(n_regionkey AS BIGINT) AS rk
        FROM read_orc('{out}')
        """
    )
