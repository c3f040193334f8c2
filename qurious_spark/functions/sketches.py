"""Sketch aggregates: mergeable approximate state for 100 TB rollups.

At corpus scale, exact COUNT(DISTINCT) re-shuffles the full key set and
exact percentiles sort it; sketches replace both with constant-size,
*mergeable* partial state that combines map-side like any other partial
aggregate — the shuffle carries kilobytes per group regardless of input
rows. All functions here are JVM-side built-ins (whole-stage codegen /
TypedImperativeAggregate), never Python.

Three surfaces:

- ``approx_distinct``: HyperLogLog++ (Spark native), tunable relative
  standard deviation.
- ``hll_sketch`` / ``hll_merge``: Apache DataSketches HLL state as a
  binary column. The sketch itself is storable — the hypertable-rollup
  pattern: aggregate each day/partition once, persist the sketch, answer
  cross-partition cardinality later by unioning stored sketches without
  rescanning data.
- ``approx_quantiles``: Greenwald-Khanna with rank error <= n/accuracy.
  With accuracy >= n it degrades gracefully to the exact discrete
  quantile (verified against DuckDB ``quantile_disc`` in the registry
  oracle); at 100 TB pick accuracy for a fixed memory/error trade-off.

The reference engine has only exact COUNT/SUM/MIN/MAX/AVG
(qurious/src/logical/expr/aggregate.rs:59-65); sketches are
beyond-reference scope for the training-data north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.02) -> Column:
    """HyperLogLog++ cardinality estimate with relative std deviation ``rsd``."""
    return F.approx_count_distinct(col, rsd)


def hll_sketch(col: Column | str, lg_k: int = 12) -> Column:
    """Mergeable DataSketches HLL state (binary). ~2^lg_k bytes per group."""
    return F.hll_sketch_agg(col, lg_k)


def hll_merge(sketch_col: Column | str) -> Column:
    """Union previously-built sketches (the rollup re-aggregation path)."""
    return F.hll_union_agg(sketch_col)


def hll_estimate(sketch_col: Column | str) -> Column:
    return F.hll_sketch_estimate(sketch_col)


def approx_quantiles(
    col: Column | str, probabilities: list[float], accuracy: int = 10000
) -> Column:
    """GK-sketch quantiles; rank error <= n/accuracy (exact when accuracy >= n)."""
    return F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def count_min(col: Column | str, eps: float = 0.001, confidence: float = 0.99,
              seed: int = 42) -> Column:
    """Mergeable count-min sketch state (binary). Point-frequency estimates
    overcount by at most eps*n with the given confidence; width = ceil(2/eps),
    depth = ceil(ln(1/(1-confidence))) — constant size regardless of input.
    Build per group/partition, persist, probe later via ``cms_estimate``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.count_min_sketch(c, F.lit(eps), F.lit(confidence), F.lit(seed))


def cms_estimate(spark, sketch_bytes: bytes, item) -> int:
    """Probe a serialized count-min sketch for one item's frequency estimate.

    Driver-side by design: the sketch is kilobytes; the pattern is
    build-distributed / probe-cheap (same JVM CountMinSketch impl that
    built it, so estimates are self-consistent)."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    if isinstance(item, str):
        return cms.estimateCount(jvm.java.lang.String(item))
    return cms.estimateCount(jvm.java.lang.Long(int(item)))
