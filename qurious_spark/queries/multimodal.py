"""Multimodal-column queries (operators/multimodal.py) over derived media.

Real multimodal tables don't exist in the testdata, so media rows are derived
DETERMINISTICALLY from ``documents`` with expressions both engines implement
identically (md5/repeat/unhex): blob bytes, kind, and typed metadata.  That
makes the metadata-aggregation and frame-fan-out paths fully oracle-checkable.
The decode path is hash-checked too: multimodal_image_features parses REAL
binary-PGM blobs and is compared against expectations computed independently
from the source pixel arrays at fixture-build time.
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


PPM_MEDIA_PATH = "/tmp/qurious_ppm_media.parquet"
PPM_EXPECTED_PATH = "/tmp/qurious_ppm_expected.parquet"
_PPM_N, _PPM_W, _PPM_H, _PPM_DIM = 48, 24, 16, 8


def write_ppm_fixture() -> None:
    """Real binary-PGM media fixture + independently-computed expectations.

    The generator lays out pixels with _deterministic_pixels, ENCODES them
    as real P5 files for the media table, and computes expected
    luma/stripe-features straight from the pixel arrays — the engine side
    must recover the same numbers by PARSING the file bytes
    (operators/multimodal._decode_ppm), so the oracle genuinely checks the
    decode + mapInPandas pipeline, not a shared code path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from qurious_spark.operators.multimodal import _deterministic_pixels, encode_ppm

    media, expected = [], []
    for i in range(_PPM_N):
        px = _deterministic_pixels(i, _PPM_W, _PPM_H)
        media.append(
            {
                "media_id": i,
                "kind": "image",
                "blob": encode_ppm(px),
                "meta": {
                    "width": _PPM_W,
                    "height": _PPM_H,
                    "n_frames": 1,
                    "sample_rate": 0,
                    "format": "ppm",
                },
            }
        )
        fpx = px.astype(np.float64)
        expected.append(
            {
                "media_id": i,
                "width": _PPM_W,
                "height": _PPM_H,
                "mean_luma": float(fpx.mean()),
                "feature": [float(s.mean()) for s in np.array_split(fpx, _PPM_DIM, axis=1)],
            }
        )
    from qurious_spark.queries.sources import _write_atomic

    _write_atomic(pa.Table.from_pylist(media), PPM_MEDIA_PATH)
    _write_atomic(pa.Table.from_pylist(expected), PPM_EXPECTED_PATH)


@df_query(
    "multimodal_image_features",
    f"""
    SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(ROUND(mean_luma * 1000000) AS BIGINT) AS luma_q6,
           array_to_string(
               list_transform(feature,
                              x -> CAST(CAST(ROUND(x * 1000000) AS BIGINT) AS VARCHAR)),
               ',') AS feature_q6
    FROM '{PPM_EXPECTED_PATH}'
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode on the driver's hard signal: parse binary PGM blobs
    (header + raw bytes) inside mapInPandas and reduce to dims/luma/stripe
    features; the oracle reads expectations computed at fixture-build time
    from the source pixel arrays (see write_ppm_fixture).

    Hash-stability: the driver's pandas canonicalizer cannot sort/hash list
    columns (r4 `TypeError: unhashable type: 'list'`), so per the registry
    array-column convention the feature vector is serialized to a
    comma-joined string of micro-scaled integers on BOTH sides, and
    mean_luma likewise becomes a micro-scaled BIGINT. Both engines hold
    bit-identical float64s (same numpy pipeline on the engine side, stored
    expectations on the oracle side), so the scaled integers agree exactly."""
    from qurious_spark.sources.readers import read_parquet

    write_ppm_fixture()
    media = read_parquet(spark, PPM_MEDIA_PATH)
    feats = decode_image_features(media, feature_dim=_PPM_DIM)
    return feats.select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.expr("CAST(ROUND(mean_luma * 1000000) AS BIGINT)").alias("luma_q6"),
        F.expr(
            "array_join(transform(feature,"
            " x -> CAST(CAST(ROUND(x * 1000000) AS BIGINT) AS STRING)), ',')"
        ).alias("feature_q6"),
    )


WAV_MEDIA_PATH = "/tmp/qurious_wav_media.parquet"
WAV_EXPECTED_PATH = "/tmp/qurious_wav_expected.parquet"
_WAV_N, _WAV_SR, _WAV_SAMPLES = 40, 8000, 256


def write_wav_fixture() -> None:
    """Real RIFF/WAVE media fixture + expectations computed straight from
    the source int16 sample arrays (same md5-derived layout as
    operators/multimodal.synthetic_wav_media) — the engine side must
    recover sample rate / counts / RMS / zero crossings by PARSING the
    file bytes (stdlib wave via _decode_wav), so the oracle checks the
    real decode, not a shared code path."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from qurious_spark.operators.multimodal import encode_wav

    media, expected = [], []
    for i in range(_WAV_N):
        raw = b"".join(
            hashlib.md5(f"wav:{i}:{j}".encode()).digest()
            for j in range(_WAV_SAMPLES * 2 // 16 + 1)
        )
        samples = np.frombuffer(raw[: _WAV_SAMPLES * 2], dtype="<i2")
        media.append(
            {
                "media_id": i,
                "kind": "audio",
                "blob": encode_wav(samples, _WAV_SR),
                "meta": {
                    "width": 0,
                    "height": 0,
                    "n_frames": 1,
                    "sample_rate": _WAV_SR,
                    "format": "wav",
                },
            }
        )
        f = samples.astype(np.float64)
        expected.append(
            {
                "media_id": i,
                "sample_rate": _WAV_SR,
                "n_samples": int(len(f)),
                "rms": float(np.sqrt(np.mean(f**2))),
                "zero_crossings": int(np.count_nonzero(np.diff(np.signbit(f)))),
            }
        )
    from qurious_spark.queries.sources import _write_atomic

    _write_atomic(pa.Table.from_pylist(media), WAV_MEDIA_PATH)
    _write_atomic(pa.Table.from_pylist(expected), WAV_EXPECTED_PATH)


@df_query(
    "multimodal_audio_features",
    f"""
    SELECT media_id,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(ROUND(rms * 1000000) AS BIGINT) AS rms_q6,
           CAST(zero_crossings AS BIGINT) AS zero_crossings
    FROM '{WAV_EXPECTED_PATH}'
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode on the hard signal: parse RIFF/WAVE blobs (header
    sample rate + int16 frames) inside mapInPandas and reduce to rate /
    count / RMS / zero crossings; expectations are computed at
    fixture-build time from the source sample arrays (write_wav_fixture).
    RMS follows the registry float convention (micro-scaled BIGINT on both
    sides); the operator's own round-to-6 happens upstream of the scaling
    and both engines hold the identical double."""
    from qurious_spark.operators.multimodal import decode_audio_features
    from qurious_spark.sources.readers import read_parquet

    write_wav_fixture()
    media = read_parquet(spark, WAV_MEDIA_PATH)
    feats = decode_audio_features(media)
    return feats.select(
        "media_id",
        F.col("sample_rate").cast("bigint").alias("sample_rate"),
        F.col("n_samples").cast("bigint").alias("n_samples"),
        F.expr("CAST(ROUND(rms * 1000000) AS BIGINT)").alias("rms_q6"),
        F.col("zero_crossings").cast("bigint").alias("zero_crossings"),
    )
