"""Text-analysis queries over the ``documents`` table (oracle-checked).

Spark side uses the expression builders in qurious_spark.functions.text
(pure JVM column expressions); the DuckDB oracle replicates the exact same
arithmetic so results hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qurious_spark.functions import text as T
from qurious_spark.queries import df_query, table

# Shared DuckDB snippets replicating functions/text.py definitions.
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


@df_query(
    "text_token_count",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        T.char_count(F.col("text")).alias("n_chars_measured"),
    )


@df_query(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM}) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


@df_query(
    "text_quality",
    f"""
    WITH feat AS (
        SELECT doc_id,
               len({_TOKS}) AS n_tok,
               CASE WHEN length(text) > 0
                    THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text)
                    ELSE 0.0 END AS punct_r,
               CASE WHEN length(text) > 0
                    THEN (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / length(text)
                    ELSE 0.0 END AS upper_r
        FROM documents
    )
    SELECT doc_id,
           ROUND((least(n_tok / 100.0, 1.0)
                + (1.0 - least(punct_r * 4.0, 1.0))
                + (1.0 - least(upper_r * 4.0, 1.0))) / 3.0, 6) AS quality
    FROM feat
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


def _duck_lang_id() -> str:
    """DuckDB replica of functions.text.lang_id: per-language stopword hit
    counts, argmax with alphabetical tiebreak, 'und' when all-zero."""
    score_cols = []
    for lang, sw in sorted(T.LANG_STOPWORDS.items()):
        arr = "[" + ", ".join(f"'{w}'" for w in sw) + "]"
        score_cols.append(
            f"len(list_filter({_TOKS}, x -> list_contains({arr}, x))) AS s_{lang}"
        )
    langs = sorted(T.LANG_STOPWORDS)
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = "CASE WHEN " + f"{mx} = 0 THEN 'und' "
    for lang in langs:
        pick += f"WHEN s_{lang} = {mx} THEN '{lang}' "
    pick += "END"
    return f"""
    WITH scored AS (
        SELECT doc_id, lang AS actual_lang, {", ".join(score_cols)}
        FROM documents
    )
    SELECT actual_lang, {pick} AS predicted_lang, count(*) AS cnt
    FROM scored
    GROUP BY 1, 2
    """


@df_query("text_lang_id", _duck_lang_id())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("actual_lang"),
            T.lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("cnt"))
    )


@df_query(
    "text_stats_by_source",
    f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           ROUND(AVG(length(text)), 4) AS avg_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_declared_chars
    FROM documents
    GROUP BY source
    """,
)
def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.max("n_chars").cast("bigint").alias("max_declared_chars"),
    )
