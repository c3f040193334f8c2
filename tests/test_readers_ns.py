"""Nanosecond-parquet tolerance must not depend on session construction.

The reference loads parquet eagerly with whatever types Arrow hands it
(qurious/src/datasource/file/parquet.rs:9-17); Spark instead REJECTS
INT64(TIMESTAMP(NANOS)) columns unless spark.sql.legacy.parquet.nanosAsLong
is set. read_parquet must set that conf itself at runtime so a vanilla
SparkSession (one not built by our get_spark) still reads ns-typed files.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from qurious_spark.sources.readers import read_parquet

TS = [
    datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
    None,
]


@pytest.fixture()
def ns_parquet(tmp_path):
    path = os.path.join(tmp_path, "ns_events.parquet")
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp("ns")),
        }
    )
    pq.write_table(table, path)
    return path


def test_read_parquet_sets_nanos_conf_on_vanilla_session(spark, ns_parquet):
    # Simulate a session that never went through get_spark: drop the conf.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = read_parquet(spark, ns_parquet)
        assert dict(df.dtypes)["ts"] == "timestamp"
        rows = {r.event_id: r.ts for r in df.collect()}
        assert rows[1] == TS[0]
        assert rows[2] == TS[1]
        assert rows[3] is None
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_read_parquet_plain_micros_untouched(spark, tmp_path):
    path = os.path.join(tmp_path, "us_events.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(TS, pa.timestamp("us"))}), path
    )
    df = read_parquet(spark, path)
    # tz-naive micros map to timestamp_ntz (Spark 4); the point is that the
    # column passes through without the nanos conversion projection
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert [r.ts for r in df.orderBy("ts").collect()] == [None, TS[0], TS[1]]
