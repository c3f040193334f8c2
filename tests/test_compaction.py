"""Compaction tests: file-count reduction, data equality, stats-based pruning."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from qurious_spark.sources.compaction import _parquet_files, compact

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A deliberately over-fragmented copy of orders (64 tiny files)."""
    src = str(tmp_path / "frag")
    spark.read.parquet(f"{SF}/orders.parquet").repartition(64).write.parquet(src)
    return src


def test_compact_reduces_files_preserves_rows(spark, fragmented, tmp_path):
    dst = str(tmp_path / "compacted")
    n_files = compact(spark, fragmented, dst, target_files=2)
    assert n_files == 2
    a = spark.read.parquet(fragmented)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_sizes_from_bytes(spark, fragmented, tmp_path):
    dst = str(tmp_path / "auto")
    # tiny target size -> several files; exact count depends on input bytes
    n_files = compact(spark, fragmented, dst, target_file_bytes=64 * 1024)
    assert n_files > 1
    assert len(_parquet_files(spark, dst)) == n_files


def test_sorted_compaction_prunes_files(spark, fragmented, tmp_path):
    dst = str(tmp_path / "sorted")
    compact(spark, fragmented, dst, target_files=4, sort_cols=["o_orderkey"])
    df = spark.read.parquet(dst)
    lo = df.agg(F.min("o_orderkey")).collect()[0][0]
    # a selective predicate on the sort key must scan fewer rows than exist:
    # parquet min/max stats skip non-matching row groups entirely
    sel = df.filter(F.col("o_orderkey") == lo)
    assert sel.count() >= 1
    # within each output file the sort key is nondecreasing
    per_file = (
        df.withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag("o_orderkey").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "f"
                ).orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("prev").isNotNull() & (F.col("o_orderkey") < F.col("prev")))
    )
    assert per_file.count() == 0
