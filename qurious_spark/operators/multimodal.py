"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Spark-side design (the real, tested part):
- a media row is ``(media_id, kind, blob binary, meta struct<...>)``;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` transforms — the only sane shape for CPU-bound per-blob
  work at 100 TB: batches stream through Python workers, no driver
  involvement, partition-parallel;
- partitioning guidance: blobs are large, so operators repartition by
  ``media_id`` hash before Python stages to balance batch bytes, and all
  metadata-only predicates are applied BEFORE the Python stage so Catalyst
  prunes blobs that don't need decoding (filter pushdown still applies to
  the parquet scan of the metadata columns).

Decoding itself is STUBBED: this container has no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``deterministic_fake=True``, which produces md5-derived fake
pixels/samples — deterministic, schema-correct, good enough to exercise the
full Spark plumbing (schema, batching, partitioning) in tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: blob bytes derived from md5(media_id).
    Stands in for a real parquet-of-blobs table in tests."""
    rows = []
    for i in range(n):
        blob = b"".join(
            hashlib.md5(f"{kind}:{i}:{j}".encode()).digest() for j in range(8)
        )
        rows.append((i, kind, bytearray(blob), (64, 48, 16, 16000, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_pixels(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-decode: tile the blob's md5 stream to w*h bytes."""
    seed = hashlib.md5(blob).digest()
    reps = (width * height) // len(seed) + 1
    return np.frombuffer((seed * reps)[: width * height], dtype=np.uint8).reshape(
        height, width
    )


def decode_image_features(
    df: DataFrame,
    deterministic_fake: bool = False,
    feature_dim: int = 8,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode image blobs → (dims, mean luminance, small feature vector).

    Real decode requires an image library that is NOT in this container —
    STUB: only ``deterministic_fake=True`` is executable here; the Spark
    plumbing (Arrow batching via mapInPandas, schema, repartition) is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decoding needs PIL/opencv (absent in this "
                    "container); pass deterministic_fake=True"
                )
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_luma": [],
                "feature": [],
            }
            for _, row in pdf.iterrows():
                w = int(row["meta"]["width"])
                h = int(row["meta"]["height"])
                px = _fake_pixels(bytes(row["blob"]), w, h)
                # feature: per-column-stripe means, fixed dim
                stripes = np.array_split(px, feature_dim, axis=1)
                out["media_id"].append(row["media_id"])
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(round(float(px.mean()), 6))
                out["feature"].append([round(float(s.mean()), 6) for s in stripes])
            yield pd.DataFrame(out)

    src = df
    if batch_partitions:
        src = src.repartition(batch_partitions, "media_id")
    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_blob", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_nth: int = 4) -> DataFrame:
    """Sample every Nth frame of video blobs as independent rows.

    STUB decode (frames are fixed-size slices of the blob — a real
    implementation would call a video demuxer here); real Spark shape:
    one input row fans out to n_frames/every_nth rows via mapInPandas.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_blob": []}
            for _, row in pdf.iterrows():
                blob = bytes(row["blob"])
                n_frames = int(row["meta"]["n_frames"])
                frame_sz = max(1, len(blob) // max(n_frames, 1))
                for idx in range(0, n_frames, every_nth):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(idx)
                    out["frame_blob"].append(
                        bytearray(blob[idx * frame_sz : (idx + 1) * frame_sz])
                    )
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches blobs, so Catalyst prunes the
    binary column from the scan entirely (verify with explain: ReadSchema
    excludes ``blob``)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("blob")).alias("total_bytes"),
        F.avg(F.col("meta.width")).alias("avg_width"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def decode_audio_features(
    df: DataFrame, deterministic_fake: bool = False, batch_partitions: int | None = None
) -> DataFrame:
    """Decode audio blobs → (sample_rate, n_samples, RMS, zero crossings).

    Real decode needs an audio library NOT in this container — STUB: only
    ``deterministic_fake=True`` runs (blob's md5 stream as int8 samples);
    the Spark plumbing (mapInPandas, schema, repartition) is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real audio decoding needs soundfile/librosa (absent in "
                    "this container); pass deterministic_fake=True"
                )
            out = {
                "media_id": [],
                "sample_rate": [],
                "n_samples": [],
                "rms": [],
                "zero_crossings": [],
            }
            for _, row in pdf.iterrows():
                blob = bytes(row["blob"])
                samples = np.frombuffer(blob, dtype=np.int8).astype(np.float64)
                out["media_id"].append(row["media_id"])
                out["sample_rate"].append(int(row["meta"]["sample_rate"]))
                out["n_samples"].append(len(samples))
                out["rms"].append(round(float(np.sqrt(np.mean(samples**2))), 6))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(samples))))
                )
            yield pd.DataFrame(out)

    src = df
    if batch_partitions:
        src = src.repartition(batch_partitions, "media_id")
    return src.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, out_width: int = 16, out_height: int = 12,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize image blobs to (out_width, out_height) grayscale.

    STUB decode as in decode_image_features (md5-tiled fake pixels) followed
    by a REAL nearest-neighbor resample in numpy — the Spark shape
    (mapInPandas, fixed output schema, blob out) is what a PIL/opencv-backed
    implementation would keep unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decoding needs PIL/opencv (absent in this "
                    "container); pass deterministic_fake=True"
                )
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for _, row in pdf.iterrows():
                w = int(row["meta"]["width"])
                h = int(row["meta"]["height"])
                px = _fake_pixels(bytes(row["blob"]), w, h)
                ys = (np.arange(out_height) * h // out_height)
                xs = (np.arange(out_width) * w // out_width)
                small = px[np.ix_(ys, xs)]
                out["media_id"].append(row["media_id"])
                out["width"].append(out_width)
                out["height"].append(out_height)
                out["pixels"].append(bytearray(small.tobytes()))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)
