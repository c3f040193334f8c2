"""Compaction: rewrite many small files into few sorted ones.

The small-files problem is the silent killer of 100 TB layouts: a streaming
sink or over-parallel batch write leaves thousands of KB-sized parquet files
per partition, and every later scan pays per-file open/footer/scheduling
cost. Compaction is a maintenance pass: read the layout, repartition to a
target file size, optionally range-sort so min/max row-group statistics
become selective (the poor man's clustering — queries filtering on the sort
key skip whole files), write back.

Beyond-reference scope (the reference has no file sinks at all —
SURVEY.md §2.2 lists none besides INSERT into MemoryTable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ``src_path`` (parquet) into ``dst_path`` with ``target_files``
    output files (estimated from input bytes / ``target_file_bytes`` when not
    given). With ``sort_cols``, data is range-partitioned AND sorted within
    files on those columns, so parquet min/max stats prune files for
    predicates on the leading sort column. Returns the file count written.

    Never collects rows: sizing uses filesystem metadata only; the rewrite
    is one repartition(-by-range) exchange.
    """
    df = spark.read.parquet(src_path)
    if target_files is None:
        total = _input_bytes(spark, src_path)
        target_files = max(1, int(total // target_file_bytes) + (1 if total % target_file_bytes else 0))
    if sort_cols:
        out = df.repartitionByRange(target_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(target_files)
    out.write.mode("overwrite").parquet(dst_path)
    return len(_parquet_files(spark, dst_path))


def _input_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def _parquet_files(spark: SparkSession, path: str) -> list[str]:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    files = []
    while it.hasNext():
        f = it.next().getPath().toString()
        if f.endswith(".parquet"):
            files.append(f)
    return files
