"""Sketch-aggregate queries (see functions/sketches.py).

``sketch_quantiles`` runs ``percentile_approx`` in exact mode
(accuracy >> n at test scale) so it is oracle-checkable against DuckDB's
``quantile_disc``; the HLL estimates use engine-private hashing that no
other engine reproduces, so those two are registered rows-only — their
error bounds and merge-consistency are asserted in tests/test_sketches.py
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qurious_spark.functions import sketches as S
from qurious_spark.queries import df_query, ensure_views, sql_query

# Exact-mode approximate quantiles: discrete median/p90 per order priority.
sql_query(
    "sketch_quantiles",
    """
    SELECT o_orderpriority,
           percentile_approx(o_totalprice, 0.5, 1000000) AS med_price,
           percentile_approx(o_totalprice, 0.9, 1000000) AS p90_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    """
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS med_price,
           quantile_disc(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


@df_query(
    "heavy_hitters_events",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS freq
    FROM events
    GROUP BY event_type
    HAVING CAST(COUNT(*) AS DOUBLE)
           >= CAST(0.199 AS DOUBLE) * (SELECT COUNT(*) FROM events)
    ORDER BY event_type
    """,
)
def heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass exact heavy hitters (operators/heavyhitters.py): Misra-Gries
    candidates per partition (zero shuffle), exact recount of candidates
    only. Exact output -> full value-hash oracle; with 5 event types and
    ratio 0.199 the pigeonhole principle guarantees >= 1 row at any SF."""
    from qurious_spark.operators.heavyhitters import heavy_hitters
    from qurious_spark.queries import table

    ev = table(spark, sf_dir, "events")
    return heavy_hitters(ev, "event_type", 0.199).orderBy("event_type")


@df_query(
    "sketch_approx_distinct",
    # HLL++ estimates are engine-private, so the checked output is the exact
    # per-group distinct (oracle recomputes it independently) plus a
    # Spark-side tolerance boolean: |approx - exact| <= 5 * rsd * exact.
    # Observed relative error <= 0.9% at rsd=0.01; a broken sketch merge
    # (e.g. double counting across partitions) lands far outside 5%.
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_tol
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            S.approx_distinct("o_custkey", rsd=0.01).alias("apx"),
            F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
        )
        .select(
            "o_orderpriority",
            "exact_customers",
            (
                F.abs(F.col("apx") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            ).alias("within_tol"),
        )
        .orderBy("o_orderpriority")
    )


@df_query(
    "sketch_hll_rollup",
    # DataSketches HLL union estimates can depend on merge order, so the
    # invariant is a tolerance boolean around the exact global distinct
    # (lgK=12 -> RSE ~1.6%; checked bound 5%, observed error 0.8%).
    """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_tol
    FROM orders
    """,
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable-rollup pattern: per-priority sketches built once, then
    re-aggregated by union without touching the base table again. The checked
    invariant proves the rollup path end-to-end: a sketch that failed to
    merge (or merged the same group twice) misses the 5% band around the
    exact global distinct, which the oracle recomputes independently."""
    ensure_views(spark, sf_dir)
    per_group = (
        spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(S.hll_sketch("o_custkey").alias("sk"))
    )
    rolled = per_group.agg(
        S.hll_estimate(S.hll_merge("sk")).alias("est")
    )
    exact = spark.table("orders").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers")
    )
    return rolled.crossJoin(exact).select(
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("within_tol"),
    )


# Exact mergeable distinct counts: bitmap per (group, 32k-bucket), OR-merge /
# count on re-aggregation — the EXACT counterpart of the HLL rollup (use when
# key domains are dense integers; constant ~4KB per bucket regardless of rows).
sql_query(
    "sketch_bitmap_distinct",
    """
    SELECT o_orderpriority,
           CAST(SUM(bitmap_count(b)) AS BIGINT) AS distinct_customers
    FROM (
        SELECT o_orderpriority,
               bitmap_bucket_number(o_custkey) AS bk,
               bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS b
        FROM orders GROUP BY 1, 2
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    duck_sql="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


@df_query(
    "heavy_hitters_ngrams",
    """
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1]))) AS g
        FROM (SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
              FROM documents)
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS freq
    FROM g
    GROUP BY g
    HAVING COUNT(*) * 50 >= (SELECT COUNT(*) FROM documents)
    ORDER BY g
    """,
)
def heavy_hitters_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: 2-gram shingles appearing in >= 2% of
    documents, found with the same two-pass exact heavy-hitters operator
    as heavy_hitters_events — per-partition Misra-Gries candidates over the
    exploded shingle stream (zero shuffle), exact recount of candidates
    only. This is the corpus-scale shape: the shingle stream at 100 TB has
    billions of distinct grams, and this plan never shuffles them all —
    only candidate grams (bounded by capacity x partitions) are recounted.
    Shingles are distinct-per-doc, so freq = document frequency; the
    threshold is a DOC-frequency floor (ceil(n_docs/50)), not a fraction
    of the gram stream — a stream-fraction threshold goes vacuous as the
    vocabulary outgrows it (0.0015 selected 39 grams at sf0.01 and ZERO
    at sf0.1/sf1 — round-9 sf1-gate find), while boilerplate density per
    document is scale-free (900 / 900 / 9 grams at sf0.01/0.1/1). The
    integer compare freq*50 >= n_docs is tie-exact against the oracle
    (no float threshold), and the Misra-Gries capacity self-scales as
    O(stream/min_count) inside the operator."""
    import math

    from qurious_spark.operators.dedup import shingles
    from qurious_spark.operators.heavyhitters import heavy_hitters
    from qurious_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    grams = docs.select(F.explode(shingles("`text`", 2)).alias("g"))
    return heavy_hitters(
        grams, "g", min_count=max(1, math.ceil(n_docs / 50))
    ).orderBy("g")
