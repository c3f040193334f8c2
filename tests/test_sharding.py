"""Sharded dataset writer (sources/sharding.py): stability, balance,
one-file-per-shard layout, pruned shard reads, and schema evolution on
read-back."""

import glob
import os

from pyspark.sql import functions as F

from qurious_spark.sources.sharding import read_shards, with_shard_id, write_shards


def test_shard_assignment_stable_and_complete(spark):
    df = spark.range(3000).withColumnRenamed("id", "k")
    a = {r.k: r.shard for r in with_shard_id(df, "k", 16).collect()}
    b = {r.k: r.shard for r in with_shard_id(df.repartition(5), "k", 16).collect()}
    assert a == b  # content-stable, layout-independent
    assert set(a.values()) == set(range(16))
    # roughly balanced: no shard more than 2x the mean
    counts = [list(a.values()).count(s) for s in range(16)]
    assert max(counts) < 2 * (3000 / 16)


def test_write_shards_one_file_per_shard(spark, tmp_path):
    df = spark.range(2000).withColumnRenamed("id", "k").withColumn(
        "payload", F.col("k") * 2
    )
    out = str(tmp_path / "shards")
    write_shards(df, out, "k", 8)
    for s in range(8):
        files = glob.glob(os.path.join(out, f"shard={s}", "*.parquet"))
        assert len(files) == 1, f"shard {s}: {files}"
    back = read_shards(spark, out)
    assert back.count() == 2000
    # round trip preserves content
    assert back.agg(F.sum("payload")).collect()[0][0] == sum(2 * k for k in range(2000))


def test_single_shard_read_prunes_partitions(spark, tmp_path):
    df = spark.range(500).withColumnRenamed("id", "k")
    out = str(tmp_path / "pruned")
    write_shards(df, out, "k", 4)
    one = read_shards(spark, out).filter(F.col("shard") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan
    # the pruned read returns exactly that shard's rows
    expected = [r.k for r in with_shard_id(df, "k", 4).filter("shard = 2").collect()]
    assert sorted(r.k for r in one.collect()) == sorted(expected)


def test_schema_evolution_across_shard_generations(spark, tmp_path):
    """Later pipeline runs add columns; mergeSchema reads old + new shards
    as one frame with NULLs for the missing column (the 100 TB reality of
    evolving corpora)."""
    out = str(tmp_path / "evolving")
    old = spark.range(100).withColumnRenamed("id", "k")
    write_shards(old, out + "/gen=0", "k", 2)
    new = (
        spark.range(100, 200)
        .withColumnRenamed("id", "k")
        .withColumn("quality", F.col("k") / 1000.0)
    )
    write_shards(new, out + "/gen=1", "k", 2)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) >= {"k", "quality"}
    assert merged.count() == 200
    assert merged.filter(F.col("quality").isNull()).count() == 100
