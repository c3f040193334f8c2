"""Skew-handling: salted joins and two-phase aggregation for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized shuffle
partitions at runtime and is the first line of defense.  These helpers cover
the cases AQE can't fix:

- ``salted_join``: a hot-key *broadcast-less* equi-join where one side has a
  handful of keys carrying a large share of rows (classic power-law ids at
  corpus scale).  The skewed (large) side gets a random salt in
  ``[0, salt_buckets)``; the other side is exploded across every salt value;
  the join key becomes (key, salt) so one hot key fans across
  ``salt_buckets`` reducers instead of one.
- ``two_phase_agg``: aggregation with hot group keys — partial aggregate on
  (key, salt), then final aggregate on key.  Only works for decomposable
  aggregates (sum/count/min/max); the helper takes (col, fn) pairs it knows
  how to re-combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: tuple[str, str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` (hot keys) with ``other`` (replicated per salt).

    ``on`` is (skewed_key, other_key).  ``other`` is exploded
    ``salt_buckets``× — use for moderate right-side cardinalities (each row is
    duplicated per salt; at 100 TB you salt the *small-enough-to-replicate*
    side, exactly like a manual broadcast with bounded fan-out).
    """
    lk, rk = on
    left = skewed.withColumn(_SALT, (F.rand(seed=42) * salt_buckets).cast("int"))
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = left.join(right, (F.col(lk) == F.col(rk)) & (left[_SALT] == right[_SALT]), how)
    return out.drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str]],
    salt_buckets: int = 8,
) -> DataFrame:
    """Hot-key aggregation in two shuffles: (key, salt) partials, then key.

    ``aggs`` is [(column, fn)] with fn in {sum, count, min, max}; output
    columns are named ``{fn}_{col}``.  A single hot key's rows spread over
    ``salt_buckets`` reducers in phase 1; phase 2 combines ``salt_buckets``
    rows per key — trivially balanced.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _, fn in aggs:
        if fn not in recombine:
            raise ValueError(f"non-decomposable aggregate for two_phase_agg: {fn}")

    salted = df.withColumn(_SALT, (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, _SALT).agg(
        *[phase1_fns[fn](c).alias(f"{fn}_{c}") for c, fn in aggs]
    )
    return partial.groupBy(key).agg(
        *[recombine[fn](f"{fn}_{c}").alias(f"{fn}_{c}") for c, fn in aggs]
    )
