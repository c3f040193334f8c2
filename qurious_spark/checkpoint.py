"""Lineage-truncation shim: local checkpoints locally, reliable on a cluster.

Iterative operators (connected components' large-star/small-star rounds,
k-means centroid updates, managed-table mutation chains, per-micro-batch
streaming state) must truncate their logical-plan lineage or the plan grows
unboundedly. Locally, ``localCheckpoint(eager=True)`` is right: it persists
to executor block storage with zero filesystem setup. On a real cluster,
localCheckpoint is a correctness hazard — the checkpointed blocks live on
executors, so losing one executor invalidates the lineage-truncated frame
mid-job (SCALE.md "Known local-vs-cluster deltas").

Setting ``SPARK_GRAFT_CHECKPOINT_DIR`` (an HDFS/S3/posix path visible to all
executors) switches every call site to reliable ``checkpoint()`` against that
directory — no code edits, the same pattern as the AQE / broadcast-threshold
/ ANSI env knobs (VERDICT r10 task 7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage; reliable iff SPARK_GRAFT_CHECKPOINT_DIR set."""
    ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if not ckdir:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(ckdir)
    return df.checkpoint(eager=eager)
