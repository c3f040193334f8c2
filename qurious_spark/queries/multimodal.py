"""Multimodal-column queries (operators/multimodal.py) over derived media.

Real multimodal tables don't exist in the testdata, so media rows are derived
DETERMINISTICALLY from ``documents`` with expressions both engines implement
identically (md5/repeat/unhex): blob bytes, kind, and typed metadata.  That
makes the metadata-aggregation and frame-fan-out paths fully oracle-checkable;
only the pseudo-decode (md5-tiled fake pixels) stays rows-only since its
numpy arithmetic is not SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qurious_spark.operators.multimodal import (
    decode_image_features,
    media_stats,
    sample_frames,
)
from qurious_spark.queries import df_query, table

# DuckDB replica of derived_media's blob/kind expressions.
_BLOB = "unhex(repeat(md5(text), CAST(doc_id % 4 + 1 AS INT)))"
_KIND = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


def derived_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, kind, blob binary, meta struct) rows."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_KIND).alias("kind"),
        F.unhex(F.expr("repeat(md5(text), CAST(doc_id % 4 + 1 AS INT))")).alias("blob"),
        F.struct(
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
            F.lit(16).alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


@df_query(
    "multimodal_media_stats",
    f"""
    WITH media AS (
        SELECT {_KIND} AS kind,
               octet_length({_BLOB}) AS blen,
               n_chars % 64 + 1 AS width
        FROM documents
    )
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(blen) AS BIGINT) AS total_bytes,
           ROUND(AVG(width), 4) AS avg_width
    FROM media
    GROUP BY kind
    """,
)
def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = media_stats(derived_media(spark, sf_dir))
    return out.withColumn("avg_width", F.round("avg_width", 4))


@df_query(
    "multimodal_frame_sample",
    f"""
    WITH media AS (
        SELECT doc_id AS media_id, octet_length({_BLOB}) AS blen
        FROM documents
        WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(f AS INT) AS frame_idx,
           CAST(blen // 16 AS BIGINT) AS frame_bytes
    FROM media, (SELECT unnest([0, 4, 8, 12]) AS f) frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(derived_media(spark, sf_dir), every_nth=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame_blob").cast("bigint").alias("frame_bytes"),
    )


# rows-only: the md5-tiled pseudo-decode (numpy) has no SQL equivalent.
@df_query("multimodal_image_features", None)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = derived_media(spark, sf_dir).filter(F.col("kind") == "image")
    return decode_image_features(media, deterministic_fake=True, feature_dim=8)
