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


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order layout keeps parquet min/max tight on BOTH clustered columns;
    a linear sort only prunes its leading column. Verified from the written
    row-group statistics directly (pyarrow footers, no Spark re-scan)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from qurious_spark.sources.compaction import compact, compact_zorder

    n = 20_000
    df = (
        spark.range(n)
        .withColumn("x", F.abs(F.xxhash64("id")) % 1000)
        .withColumn("y", F.abs(F.xxhash64("id", F.lit(1))) % 1000)
    )
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)

    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    compact(spark, src, linear, target_files=16, sort_cols=["x"])
    n_z = compact_zorder(spark, src, zord, ["x", "y"], target_files=16)
    assert n_z == 16

    def overlap_fraction(path, col, lo, hi):
        import glob
        import os

        files = glob.glob(os.path.join(path, "*.parquet"))
        assert files
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            mn = min(_colstat(md, i, col)[0] for i in range(md.num_row_groups))
            mx = max(_colstat(md, i, col)[1] for i in range(md.num_row_groups))
            if mx >= lo and mn <= hi:
                hit += 1
        return hit / len(files)

    def _colstat(md, rg, name):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            c = row_group.column(ci)
            if c.path_in_schema == name:
                return c.statistics.min, c.statistics.max
        raise KeyError(name)

    # narrow 5% range predicates on each dimension
    lin_x = overlap_fraction(linear, "x", 100, 149)
    lin_y = overlap_fraction(linear, "y", 100, 149)
    z_x = overlap_fraction(zord, "x", 100, 149)
    z_y = overlap_fraction(zord, "y", 100, 149)
    # linear prunes x hard but reads ~every file for y
    assert lin_x <= 0.25
    assert lin_y >= 0.9
    # z-order prunes meaningfully on BOTH dimensions
    assert z_x <= 0.7
    assert z_y <= 0.7
    # rows survive the rewrite intact
    assert spark.read.parquet(zord).count() == n
