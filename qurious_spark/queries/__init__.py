"""Query registry: every operator the engine claims, as a (spark, oracle) pair.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver runs both
at sf0.01 and hash-compares; ``tools/check_correctness.py`` is the local
replica of that gate.

Conventions (driver contract):
- every computed column is aliased identically on both sides;
- double-typed aggregates are wrapped in ROUND(.., 4) on BOTH sides so
  partitioned float summation noise can't flip the hash;
- EXTRACT-style results are cast to BIGINT on both sides (Spark returns int,
  DuckDB bigint);
- integer SUMs (plain, DISTINCT, or SUM over CASE) are cast to BIGINT on both
  sides — DuckDB widens integer SUM to HUGEINT (int128) while Spark stays
  BIGINT, and the driver's value-hash is representation-sensitive.
- money/decimal SUM columns round in DECIMAL space before the double cast:
  ``CAST(ROUND(SUM(<decimal>), n) AS DOUBLE)``, never ``ROUND(CAST(SUM(..)
  AS DOUBLE), n)`` — an exact scale-4 decimal sum ends on a .xx5 half-point
  ~1/100 groups, where the engines round a DOUBLE apart (sf1 tpch_q7 find).
  ``ROUND(decimal, n)`` is half-away-from-zero in BOTH engines; a
  ``CAST(dec AS DECIMAL(38,n))`` downscale is NOT portable (DuckDB
  truncates it) — the DECIMAL(38,4) cast convention below is safe only for
  quotients, which DuckDB types as DOUBLE.
- per-ROW fractional ROUND(x, n) on doubles is a half-point hazard: Spark
  rounds the double's shortest decimal string (BigDecimal.valueOf), DuckDB
  rounds the binary value, so a quotient near a half-point in digit n+1
  can differ by 1 ulp of digit n (bit tpch_q2 at sf0.1). When a per-row
  value can land near half-points, round via an integer scale instead:
  ROUND(x * 10^n) / 10^n. Aggregates over many rows are far less exposed.
- DuckDB ``date_trunc('month'/'year', ts)`` returns DATE where Spark returns
  TIMESTAMP — CAST both sides to DATE (round-4 datetime-fuzzer find).
- NO ARRAY-TYPED OUTPUT COLUMNS: the driver canonicalizer sorts result
  frames with pandas ``sort_values``/hashing, which crashes on list cells
  (r4 ``TypeError: unhashable type: 'list'`` on multimodal_image_features).
  Serialize arrays to a deterministic string on BOTH sides — Spark
  ``array_join(transform(a, x -> CAST(.. AS STRING)), ',')`` ≙ DuckDB
  ``array_to_string(list_transform(a, x -> CAST(.. AS VARCHAR)), ',')`` —
  or unpivot to one row per element. Float elements go through an integer
  micro-scale (``CAST(ROUND(x * 1e6) AS BIGINT)``) first.
- NO DECIMAL(20,0)/u64-range OUTPUT COLUMNS: the driver value-hash is
  representation-sensitive for 20-digit decimals (source_uint_parquet was
  hash-red r1-r4 with rows+schema green). Surface them as the digit string
  (``CAST(dec AS STRING/VARCHAR)``) or as hi/lo bigints.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_registered_views: dict[int, str] = {}


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views once per (session, sf_dir).

    The cache is validated against the live catalog (sentinel: ``lineitem``)
    because other components may legitimately clear the temp-view namespace
    in the shared JVM — the slt runner drops all temp views before each file
    to honor the reference's clean-catalog SHOW TABLES semantics
    (testing/slt.py run_slt_file)."""
    key = id(spark)
    if _registered_views.get(key) == sf_dir and spark.catalog.tableExists("lineitem"):
        return
    from qurious_spark.sources.readers import load_tables

    load_tables(spark, sf_dir)
    _registered_views[key] = sf_dir


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from qurious_spark.sources.readers import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None):
    if name in REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    REGISTRY[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def sql_query(name: str, spark_sql: str, duck_sql: str | None = None) -> None:
    """Register a query whose Spark side is plain SQL over the testdata views.

    When ``duck_sql`` is None the same text is used for the DuckDB oracle
    (ANSI-compatible queries).
    """

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(_sql)

    register(name, fn, duck_sql if duck_sql is not None else spark_sql)


def df_query(name: str, oracle: str | None):
    """Decorator for DataFrame-API query functions."""

    def deco(fn):
        register(name, fn, oracle)
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    import qurious_spark.queries.relational  # noqa: F401
    import qurious_spark.queries.scalar  # noqa: F401
    import qurious_spark.queries.suites  # noqa: F401
    import qurious_spark.queries.sources  # noqa: F401
    import qurious_spark.queries.tpch  # noqa: F401
    import qurious_spark.queries.partsupp  # noqa: F401
    import qurious_spark.queries.text  # noqa: F401
    import qurious_spark.queries.dedup  # noqa: F401
    import qurious_spark.queries.vector  # noqa: F401
    import qurious_spark.queries.events  # noqa: F401
    import qurious_spark.queries.session_dml  # noqa: F401
    import qurious_spark.queries.multimodal  # noqa: F401
    import qurious_spark.queries.sketches  # noqa: F401
    import qurious_spark.queries.sampling  # noqa: F401
    import qurious_spark.queries.pipeline  # noqa: F401


# The driver hash-checks a bounded prefix (~50 entries) of ``queries()``.
# Round-4 rotation: 12 queries that were driver-green in CORRECTNESS_r03
# (limit_offset, select_no_from, values_inline, cross_join, topn_orders,
# join_inner, join_non_equi, comma_join_elimination, sort_multi_key,
# filter_null_kleene, projection_arith, intersect_keys — their §2 rows keep
# their r03 hard-signal rows cumulatively) rotated out in favor of
# never-driver-checked entries, growing the set of queries that have EVER
# had a green driver row. Seven more r03-green singletons
# (dedup_ngram_jaccard, events_asof_join, text_lang_id,
# embedding_cosine_pairs, pipeline_mix_corpora, agg_stats, distinct_pairs)
# then rotated out for the round-4 prep operators — each family those seven
# represent keeps either another in-window entry or its r03 green row.
# Everything outside the prefix keeps registration order and stays covered
# by the local oracle gate (tools/check_correctness.py) + pytest.
DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-9 FRESHNESS rotation (VERDICT r8 task 1): CORRECTNESS_r08 came
    # back 50/50 (32 first-evers) — the never-driver-checked backlog is
    # ZERO, so from r9 the window rotates for evidence freshness: it holds
    # the 46 stalest entries (latest green r2/r3) plus 4 anchors. Anchors:
    # tpch_q1 (flagship/TPC-H), dml_roundtrip (DML/DDL family — no stale
    # cohort member covers SURVEY §2.6), window_qualify (re-verifies the
    # round-9 QUALIFY coalescing-join ORDER-BY fix on the only registry
    # entry that exercises rewrite_qualify), and embedding_dup_clusters
    # (its oracle was rebuilt as a bounded probe invariant this round —
    # the oracle change invalidates its r8 hash evidence, so it MUST
    # re-verify in-window). Five stale entries roll to the r10 window,
    # each with same-family in-window cover: union_distinct (union_all),
    # case_simple (case_searched), ilike_pattern (like_patterns),
    # join_right_outer (join_left_outer + join_inner + join_non_equi +
    # cross_join), not_exists_subquery (exists/in/scalar/correlated
    # subqueries all in-window). Rotated out (all r8-green, untouched
    # code; family cover in parens): source_csv_roundtrip
    # (source_ndjson_roundtrip), agg_basic (agg_stats + agg_no_grouping +
    # group_by_expr), the three §2.3 suites (their singles ARE this
    # window), join_full_outer (the join singles), events_stream_sliding +
    # events_stream_rollup_merge + events_stream_heavy_hitters
    # (events_stream_tumbling anchors streaming), dedup_exact +
    # dedup_minhash_pairs (dedup_ngram_jaccard in-window; exact/minhash
    # r8-green), ann_lsh_topk + embedding_semdedup + embedding_centroids
    # etc. (embedding_cosine_pairs + embedding_dup_clusters in-window),
    # the text/pipeline/sampling/sketch singles (text_lang_id,
    # pipeline_mix_corpora, heavy_hitters_events in-window).
    "tpch_q1",
    "dml_roundtrip",
    "window_qualify",
    "embedding_dup_clusters",
    # — 23 r2-green singles: predicates, scalar exprs, aggregates,
    #   grouping analytics, subqueries, set ops —
    "filter_compound",
    "subquery_alias",
    "join_left_outer",
    "in_list",
    "not_in_with_null",
    "between_pred",
    "like_patterns",
    "case_searched",
    "cast_expr",
    "interval_arith",
    "extract_parts",
    "date_trunc_agg",
    "agg_no_grouping",
    "group_by_expr",
    "cube_agg",
    "grouping_sets",
    "pivot_case",
    "unpivot_stack",
    "scalar_subquery",
    "correlated_scalar_subquery",
    "exists_subquery",
    "in_subquery",
    "union_all",
    # — 23 r3-green singles: core relational ops, joins, windows, sources,
    #   and the r3 pipeline/text/events representatives —
    "projection_arith",
    "filter_null_kleene",
    "sort_multi_key",
    "limit_offset",
    "topn_orders",
    "distinct_pairs",
    "select_no_from",
    "values_inline",
    "cross_join",
    "join_inner",
    "join_non_equi",
    "comma_join_elimination",
    "agg_stats",
    "intersect_keys",
    "window_running_sum",
    "source_ndjson_roundtrip",
    "text_lang_id",
    "dedup_ngram_jaccard",
    "embedding_cosine_pairs",
    "events_asof_join",
    "events_stream_tumbling",
    "heavy_hitters_events",
    "pipeline_mix_corpora",
)


def ordered_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """REGISTRY with DRIVER_PRIORITY entries first, the rest in
    registration order."""
    load_all()
    rest = [n for n in REGISTRY if n not in set(DRIVER_PRIORITY)]
    return {n: REGISTRY[n] for n in (*DRIVER_PRIORITY, *rest)}
