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
    # flagship + DDL/DML (§2.1 Ddl/Dml, §2.2 managed table). Round-5
    # rotation: merge_upsert (green r4) -> dml_update_from (never checked);
    # the Dml row keeps dml_roundtrip in-window + merge_upsert's r4 green.
    "tpch_q1",
    "dml_roundtrip",
    "dml_update_from",
    # §2.2 sources: CSV + COPY TO + read_csv fn / NDJSON / COPY FROM .tbl,
    # uint-typed parquet, information_schema catalog
    "source_csv_roundtrip",
    "source_copy_tbl",
    "source_uint_parquet",
    "source_orc_roundtrip",
    "catalog_information_schema",
    # §2.5 windows, set ops, CTE, streaming, UDF. Round-5 rotation:
    # cte_query (green r4) -> recursive_cte_months (WITH RECURSIVE, never
    # checked) — still a CTE planned as SubqueryAlias (SURVEY §3.1), so the
    # SubqueryAlias row keeps an in-window rep; is_null_checks returns to
    # the window once to clear its stale r1/r2 red ledger rows (its fix is
    # local-gate green but was never re-driver-checked; §2.3 row otherwise
    # covered by predicate_suite).
    "window_rank_dense",
    "recursive_cte_months",
    "events_stream_sliding",
    "events_stream_session",
    "udf_vectorized",
    "is_null_checks",
    # §2.1/§2.3 rotated-in: partsupp-topology q11, qualified wildcard
    "tpch_q11_partsupp",
    "wildcard_qualified",
    # §2.1 join operators (outer/semi/anti stay: full-outer NULL handling,
    # semi/anti row semantics are the discriminating cases)
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    # §2.3 expression suites (BETWEEN/IN/LIKE/IS NULL; CASE/cast/interval/
    # EXTRACT/alias-in-GROUP-BY; EXISTS/IN-subq/scalar-subq + no-grouping agg)
    "predicate_suite",
    "scalar_suite",
    "subquery_suite",
    # §2.4 aggregates
    "agg_basic",
    "agg_distinct",
    "having_filter",
    "rollup_agg",
    # LLM-pipeline families (one per VERDICT table row)
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_resolve",
    "ann_lsh_topk",
    "multimodal_media_stats",
    # heavy-hitter family: the events variant is r03-green; the ngram
    # (boilerplate) variant takes the in-window slot for a first check
    "heavy_hitters_ngrams",
    "sketch_bitmap_distinct",
    "sample_stratified_hash",
    "pipeline_pack_bins",
    "pipeline_training_data",
    # rotated-in LLM-pipeline / operator entries never driver-checked before
    "events_funnel",
    "text_fuzzy_join",
    "range_join_binned",
    "pipeline_decontaminate",
    "multimodal_image_features",
    # round-5 rotation: the r4-green singletons events_gapfill, dedup_prefix,
    # text_pii_redact, embedding_quantize, events_retention rotate out for
    # never-driver-checked entries; each family keeps an in-window rep
    # (gapfill -> events_stream_gapfill, dedup -> exact/minhash/simhash/
    # resolve/incremental, text -> chunk/length/winnow, embedding ->
    # semdedup/ann_lsh, events -> funnel/stream_sliding/stream_session).
    "events_stream_gapfill",
    "embedding_semdedup",
    "text_chunk_documents",
    "text_length_filter",
    "pipeline_split_train",
    "dedup_incremental",
    "text_winnow_fingerprints",
    "text_winnow_overlap",
)

# Round-6 rotation candidates (r4/r5-green in-window singletons whose
# families retain coverage): events_stream_sliding or _session (keep one),
# text_chunk_documents, pipeline_split_train, sample_stratified_hash,
# sketch_bitmap_distinct — swap for never-checked entries such as
# pipeline_psi_drift, pipeline_quality_checks, pipeline_profile,
# events_stream_tumbling, dedup_ngram_jaccard re-checks, and the round-5
# additions dml_scd2_dimension (SCD2 merge) and text_duplicate_spans
# (exact substring dedup), both local-gate green since registration.


def ordered_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """REGISTRY with DRIVER_PRIORITY entries first, the rest in
    registration order."""
    load_all()
    rest = [n for n in REGISTRY if n not in set(DRIVER_PRIORITY)]
    return {n: REGISTRY[n] for n in (*DRIVER_PRIORITY, *rest)}
