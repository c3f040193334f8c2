"""Checkpoint shim: localCheckpoint locally, reliable checkpoint() when
SPARK_GRAFT_CHECKPOINT_DIR is set (VERDICT r10 task 7 — the cluster-ready
switch for the components/mutation-chain lineage truncation)."""

import os

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
