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
    # Round-6 rotation (the big one — VERDICT r5 task 1): ALL 50 slots were
    # green in CORRECTNESS_r05, so 20 singletons whose families keep either
    # an in-window rep or a cumulative driver-green row rotate out for 20
    # never-driver-checked entries, prioritizing the TPC-H tail (q2-q22 had
    # never been windowed; reference qurious/tests/tpch/*.slt is the
    # semantics anchor). Rotated out, with the family cover in parens:
    # tpch_q11_partsupp (partsupp r5 green; 10 TPC-H entries now in-window),
    # wildcard_qualified (r5 green), join_left_semi/join_left_anti (r5
    # green; join_full_outer stays), is_null_checks (stale-ledger purpose
    # served r5), recursive_cte_months (r5 green; cte_query r4 green),
    # events_stream_session (r5 green; sliding+gapfill+interval join stay),
    # udf_vectorized (r5 green; udaf_grouped_agg takes the UDx slot),
    # agg_distinct + having_filter (r5 green; agg_basic+rollup_agg stay),
    # dedup_simhash_pairs + dedup_resolve (r5 green; exact/minhash/
    # incremental stay, dedup_clusters in), multimodal_image_features (r5
    # green; media_stats stays), text_chunk_documents + text_length_filter
    # (r5 green; winnow pair stays, duplicate_spans in), pipeline_split_train
    # + pipeline_decontaminate (r5 green; pack_bins+training_data stay),
    # sample_stratified_hash (r5 green), sketch_bitmap_distinct (r5 green;
    # sketch_hll_rollup in), heavy_hitters_ngrams (r5 green; events variant
    # r3 green).
    "tpch_q1",
    "dml_roundtrip",
    "dml_update_from",
    # §2.2 sources: CSV + COPY TO + read_csv fn / COPY FROM .tbl,
    # uint-typed parquet, ORC, information_schema catalog
    "source_csv_roundtrip",
    "source_copy_tbl",
    "source_uint_parquet",
    "source_orc_roundtrip",
    "catalog_information_schema",
    # §2.5 windows, set ops, streaming, UDx — window_qualify (newest
    # dialect surface), except_keys (set-op family's first driver check),
    # udaf_grouped_agg (grouped-agg pandas UDAF), the new stream-stream
    # interval join (VERDICT r5 task 7)
    "window_rank_dense",
    "window_qualify",
    "except_keys",
    "events_stream_sliding",
    "events_stream_gapfill",
    "events_stream_interval_join",
    "udaf_grouped_agg",
    # §2.1 joins: full-outer NULL handling stays as the discriminating case
    "join_full_outer",
    # §2.3 expression suites + the scalar-function families' first checks
    "predicate_suite",
    "scalar_suite",
    "subquery_suite",
    "string_functions",
    "date_functions",
    # §2.4 aggregates
    "agg_basic",
    "rollup_agg",
    # TPC-H tail — first driver checks ever (local-gate green since r2-r3):
    # q2 nested-subquery min-cost, q3 join+topn, q5 6-way join, q6
    # filter-agg, q7 cross-year shipping, q9 profit by nation/year, q12
    # CASE agg, q17 correlated scalar subquery, q19 disjunctive predicates,
    # q21 multi-EXISTS/NOT-EXISTS
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q9",
    "tpch_q12",
    "tpch_q17",
    "tpch_q19",
    "tpch_q21",
    # LLM-pipeline families (one per VERDICT table row)
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_incremental",
    "dedup_clusters",
    "ann_lsh_topk",
    "embedding_semdedup",
    "multimodal_media_stats",
    "sketch_hll_rollup",
    "pipeline_pack_bins",
    "pipeline_training_data",
    "events_funnel",
    "text_fuzzy_join",
    "range_join_binned",
    "text_winnow_fingerprints",
    "text_winnow_overlap",
    # round-5 additions, local-gate green since registration
    "dml_scd2_dimension",
    "text_duplicate_spans",
)

# Round-7 rotation candidates (green singletons whose families retain
# coverage): the ten TPC-H entries above once green (swap for q4, q8, q10,
# q13-q16, q18, q20, q22 and the partsupp variants), window_qualify ->
# window_row_number/lag_lead/range_frame, string/date -> math/regexp/array/
# hash/conditional/string_agg, sketch_hll_rollup -> sketch_quantiles/
# approx_distinct, plus the never-checked pipeline entries
# (psi_drift, quality_checks, profile, shard_counts), sampling variants
# (sample_weighted_ares, sample_topk_per_source), multimodal frame/audio,
# vector entries (vector_norms, ann_topk_bruteforce/ivf/pq,
# embedding_centroids), events singles, dedup_minhash_signatures/
# simhash_fingerprints/minhash_ml/stream_exact, text singles, and
# dml_scd2_stream.


def ordered_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """REGISTRY with DRIVER_PRIORITY entries first, the rest in
    registration order."""
    load_all()
    rest = [n for n in REGISTRY if n not in set(DRIVER_PRIORITY)]
    return {n: REGISTRY[n] for n in (*DRIVER_PRIORITY, *rest)}
