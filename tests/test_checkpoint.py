"""Checkpoint shim: localCheckpoint locally, reliable checkpoint() when
SPARK_GRAFT_CHECKPOINT_DIR is set (VERDICT r10 task 7 — the cluster-ready
switch for the components/mutation-chain lineage truncation)."""

import os

import pytest

from qurious_spark.checkpoint import checkpoint


def test_local_by_default(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    df = spark.range(10)
    out = checkpoint(df)
    assert out.count() == 10
    # a local checkpoint truncates lineage to an ExistingRDD-style scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_reliable_when_dir_set(spark, monkeypatch, tmp_path):
    """NOTE: this test pins the shared SparkContext's checkpoint dir for the
    rest of the pytest session (Spark has no unset API). That is safe: the
    default localCheckpoint path never consults it, and a conflicting
    reliable-mode request raises loudly (tested below) instead of silently
    checkpointing to the stale dir."""
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    out = checkpoint(spark.range(7))
    assert out.count() == 7
    # the context adopted the env-requested dir and wrote RDD blocks there
    assert spark.sparkContext.getCheckpointDir().rstrip("/").startswith("file:")
    assert ckdir.split("/")[-1] in spark.sparkContext.getCheckpointDir()
    written = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(ckdir)
        for f in fs
    ]
    assert written, "reliable checkpoint wrote no files"

    # re-using the SAME base dir is fine even though Spark appended a UUID
    # subdir to what getCheckpointDir() reports
    assert checkpoint(spark.range(3)).count() == 3

    # a DIFFERENT dir on the same context must raise, not silently write to
    # the old one (first-writer-wins would defeat the reliability request)
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "other"))
    with pytest.raises(RuntimeError, match="one process uses one"):
        checkpoint(spark.range(3))


def test_base_dir_normalization():
    from qurious_spark.checkpoint import _base_dir

    assert _base_dir("file:/tmp/ck/0a1b2c3d-1111-2222-3333-444455556666") == "/tmp/ck"
    assert _base_dir("/tmp/ck") == "/tmp/ck"
    assert _base_dir("/tmp/ck/") == "/tmp/ck"
    assert _base_dir("hdfs://nn:8020/ck") == "nn:8020/ck"
    assert _base_dir("s3a://bucket/ck") == "bucket/ck"
    # a user-chosen leaf that merely LOOKS UUID-shaped (36 chars, 4 dashes)
    # but is not 8-4-4-4-12 hex must NOT be stripped — stripping it would
    # make two genuinely different dirs compare equal (ADVICE r11)
    not_uuid = "ckptdirs-aaaa-bbbb-cccc-dddddddddddd"
    assert len(not_uuid) == 36 and not_uuid.count("-") == 4
    assert _base_dir(f"/tmp/{not_uuid}") == f"/tmp/{not_uuid}"
    # uppercase hex is not what Spark emits (java.util.UUID is lowercase)
    assert (
        _base_dir("/tmp/ck/0A1B2C3D-1111-2222-3333-444455556666")
        == "/tmp/ck/0A1B2C3D-1111-2222-3333-444455556666"
    )


@pytest.mark.slow
def test_connected_components_reliable_mode(tmp_path):
    """End-to-end: the iterative CC operator (checkpoints every star round)
    runs correctly in reliable mode. Subprocess because one process adopts
    one checkpoint dir and the shared session may already own another."""
    import json
    import subprocess
    import sys
    import textwrap

    ckdir = str(tmp_path / "ck")
    code = textwrap.dedent(
        """
        import json, os, sys
        from qurious_spark.session import get_spark
        from qurious_spark.operators.components import connected_components
        spark = get_spark(master="local[4]")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 20)] + [(100, 101), (101, 102)],
            ["id_a", "id_b"],
        )
        comps = {}
        for r in connected_components(edges).collect():
            comps.setdefault(r[1], []).append(r[0])
        ckdir = os.environ["SPARK_GRAFT_CHECKPOINT_DIR"]
        n_files = sum(len(fs) for _, _, fs in os.walk(ckdir))
        print(json.dumps({
            "sizes": sorted(len(v) for v in comps.values()),
            "files": n_files,
        }))
        """
    )
    env = dict(os.environ, SPARK_GRAFT_CHECKPOINT_DIR=ckdir)
    env.pop("SPARK_GRAFT_AQE", None)
    # 600s: the subprocess pays a full JVM startup + ~10 checkpointed CC
    # rounds while the parent suite's 32-core session keeps running; at the
    # 300s budget this flaked once under a degraded host window (r12 resume:
    # 60s in isolation, >300s inside the full suite on a box whose pyloop
    # probe read 2.2x slow).
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=600, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["sizes"] == [3, 21]
    assert result["files"] > 0, "no reliable checkpoint files written"
