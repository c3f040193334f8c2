"""Stratified-sampling queries over ``documents`` (oracle-checked: the
md5-slot ordering is engine-neutral, so DuckDB reproduces the exact rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from qurious_spark.operators import sampling as SA
from qurious_spark.queries import df_query, table
from qurious_spark.queries.dedup import _duck_md5int

_SLOT = f"{_duck_md5int('CAST(doc_id AS VARCHAR)')} % {SA.HASH_M}"


@df_query(
    "sample_stratified_hash",
    f"""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    t AS (SELECT source,
                 LEAST({SA.HASH_M}, CAST(CEIL({SA.HASH_M} * 20 / n) AS BIGINT)) AS thr
          FROM c)
    SELECT d.doc_id, d.source FROM documents d JOIN t USING (source)
    WHERE {_SLOT} < t.thr
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return SA.stratified_sample_hash(docs, "source", "doc_id", 20).select(
        "doc_id", "source"
    )


@df_query(
    "sample_topk_per_source",
    f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY {_SLOT}, doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
def sample_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return SA.stratified_topk_exact(docs, "source", "doc_id", 5).select(
        "doc_id", "source"
    )


@df_query(
    "sample_weighted_ares",
    f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROUND(POW(({_SLOT} + 0.5) / {SA.HASH_M}.0,
                         1.0 / CAST(n_chars AS DOUBLE)), 9) AS k
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    ORDER BY k DESC, doc_id LIMIT 40
    """,
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (A-RES, weight = n_chars): longer
    documents are proportionally more likely; the hash-derived uniform
    makes the selected set reproducible, so the oracle computes the exact
    same top-k."""
    docs = table(spark, sf_dir, "documents")
    return SA.weighted_sample_ares(docs, "n_chars", "doc_id", 40).select(
        "doc_id", "source"
    )
