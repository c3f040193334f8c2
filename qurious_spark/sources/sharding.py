"""Sharded dataset writer: the sink side of a training-data pipeline.

Training jobs consume a corpus as N equally-sized shard files per split so
data loaders can assign shards to workers without coordination. The shard
assignment must be content-stable (same doc → same shard across runs and
engines), which rules out round-robin/rand partitioning; we reuse the
md5-threshold idea from operators/splitting.py at shard granularity.

Scale shape: the shard id is a pure projection; the write repartitions on
shard id, so exactly one task owns one output file per shard — no
small-files problem and no post-write compaction needed. At 100 TB pick
n_shards so each shard lands in the 256 MB–1 GB range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_shard_id(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Add a content-stable ``shard`` column in [0, n_shards): the first 8
    md5 hex chars of the key, mod n_shards (engine-neutral, stable under
    corpus growth for a fixed n_shards)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
    return df.withColumn("shard", (h.cast("bigint") % n_shards).cast("int"))


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` shard directories under ``path``
    (``shard=K/``), one output file per shard (repartition by shard id →
    one task per shard)."""
    sharded = with_shard_id(df, key_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.partitionBy("shard")
        .format(format)
        .mode("overwrite")
        .save(path)
    )


def read_shards(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Read a sharded dataset back (shard id recovered from the directory
    partitioning, usable for pruned single-shard reads)."""
    return spark.read.format(format).load(os.path.join(path))
