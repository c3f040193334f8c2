"""Session-timezone independence of the streaming gapfill buckets.

The r12 TZ-independence gate caught locf_stream shifting every bucket by
the zone offset under a non-UTC session: the stream's ts column is LTZ
(watermarks reject TIMESTAMP_NTZ), and LTZ reaches Arrow UDFs converted
to SESSION-zone wall time. The fix derives the epoch JVM-side
(unix_timestamp of the instant). Subprocess test because the session
timezone is fixed at session build (the stale-env guard raises on an
in-process flip) — same pattern as the reliable-checkpoint CC test.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

_CODE = textwrap.dedent(
    """
    import datetime as dt
    import json
    from pyspark.sql import Row
    from qurious_spark.session import get_spark
    from qurious_spark.streaming import locf_stream
    from qurious_spark.streaming.events import run_to_memory

    spark = get_spark(master="local[4]")
    base = dt.datetime(2024, 1, 1)  # naive wall time, written as NTZ parquet
    rows = [
        Row(ts=base, event_type="x", value=7.0),
        Row(ts=base + dt.timedelta(hours=2), event_type="x", value=3.0),
    ]
    import tempfile, os as _os
    d = _os.path.join(tempfile.mkdtemp(prefix="q_tz_locf_"), "ev")
    spark.createDataFrame(
        rows, "ts timestamp_ntz, event_type string, value double"
    ).write.parquet(d)
    # LTZ stream schema over the NTZ file — exactly the staged-events shape
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(d)
    out = run_to_memory(
        locf_stream(stream, step_seconds=3600), "t_tz_locf", output_mode="update"
    )
    got = sorted(r.bucket for r in out.collect())
    print(json.dumps({"tz": spark.conf.get("spark.sql.session.timeZone"),
                      "buckets": got}))
    """
)


_SCD_CODE = textwrap.dedent(
    """
    import json, os as _os, tempfile
    from pyspark.sql import functions as F
    from qurious_spark.session import Session, get_spark
    from qurious_spark.streaming.scd import scd2_stream

    spark = get_spark(master="local[4]")
    s = Session(spark)
    s.sql("DROP TABLE IF EXISTS tz_dim")
    s.sql(
        "CREATE TABLE tz_dim AS SELECT * FROM (VALUES "
        "(1, 'a', TIMESTAMP '2020-01-01', CAST(NULL AS TIMESTAMP), TRUE), "
        "(2, 'b', TIMESTAMP '2020-01-01', CAST(NULL AS TIMESTAMP), TRUE)"
        ") t(k, seg, valid_from, valid_to, is_current)"
    )
    upd = spark.createDataFrame(
        [(1, "z")], "k bigint, seg string"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-02-01")))
    root = tempfile.mkdtemp(prefix="q_tz_scd_")
    d = _os.path.join(root, "upd")
    upd.write.parquet(d)
    stream = spark.readStream.schema("k bigint, seg string, ts timestamp").parquet(d)
    scd2_stream(stream, s, "tz_dim", "k", ["seg"], "ts", _os.path.join(root, "ck"))
    rows = sorted(
        (r.k, r.seg, str(r.vf), str(r.vt), r.is_current)
        for r in s.table("tz_dim").select(
            "k", "seg",
            F.col("valid_from").cast("date").alias("vf"),
            F.col("valid_to").cast("date").alias("vt"),
            "is_current",
        ).collect()
    )
    print(json.dumps(rows))
    """
)


@pytest.mark.slow
@pytest.mark.parametrize("tz", ["Asia/Kathmandu", "UTC"])
def test_scd2_stream_close_dates_are_zone_independent(tz):
    """The batch max event time round-trips driver-side into scd2_merge's
    session-zone string parse; a naive-datetime collect rendered it in the
    DRIVER zone, shifting every close/open boundary by the session offset —
    under +05:45 the close DATE crossed midnight (2024-01-31 vs
    2024-02-01). Pin the wall-date contract in both zones."""
    env = dict(os.environ, SPARK_GRAFT_SESSION_TZ=tz)
    for k in ("SPARK_GRAFT_AQE", "SPARK_GRAFT_CHECKPOINT_DIR"):
        env.pop(k, None)
    out = subprocess.run(
        [sys.executable, "-c", _SCD_CODE], env=env, capture_output=True, text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [tuple(r) for r in json.loads(out.stdout.strip().splitlines()[-1])]
    assert rows == [
        (1, "a", "2020-01-01", "2024-02-01", False),
        (1, "z", "2024-02-01", "None", True),
        (2, "b", "2020-01-01", "None", True),
    ]


@pytest.mark.slow
@pytest.mark.parametrize("tz", ["UTC", "America/New_York"])
def test_locf_buckets_are_zone_independent(tz):
    env = dict(os.environ, SPARK_GRAFT_SESSION_TZ=tz)
    for k in ("SPARK_GRAFT_AQE", "SPARK_GRAFT_CHECKPOINT_DIR"):
        env.pop(k, None)
    out = subprocess.run(
        [sys.executable, "-c", _CODE], env=env, capture_output=True, text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["tz"] == tz
    # wall 2024-01-01T00:00 as-UTC epoch, independent of the session zone
    b0 = 1704067200
    assert result["buckets"] == [b0, b0 + 3600, b0 + 7200]
