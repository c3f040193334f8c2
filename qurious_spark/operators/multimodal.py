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

Decoding: formats the Python stdlib can parse are decoded FOR REAL —
binary PPM/PGM images (P5/P6 headers, pure byte layout) and RIFF/WAVE audio
(the ``wave`` module) — dispatched by magic bytes. Everything else (JPEG,
PNG, MP3, ...) needs libraries absent from this container and raises
``NotImplementedError`` unless ``deterministic_fake=True``, which produces
md5-derived fake pixels/samples — deterministic, schema-correct, good
enough to exercise the full Spark plumbing in tests.
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


def _deterministic_pixels(media_id: int, width: int, height: int) -> np.ndarray:
    """md5-stream pixels keyed by media_id — the generator-side twin used to
    BUILD real PPM fixtures (the decoder re-derives them from the file bytes
    alone, so decode tests are not circular)."""
    seed = hashlib.md5(f"ppm:{media_id}".encode()).digest()
    reps = (width * height) // len(seed) + 1
    return np.frombuffer((seed * reps)[: width * height], dtype=np.uint8).reshape(
        height, width
    )


def encode_ppm(px: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as a binary PGM (P5) blob."""
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a RIFF/WAVE blob (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synthetic_ppm_media(
    spark: SparkSession, n: int = 32, width: int = 24, height: int = 16
) -> DataFrame:
    """Media table whose blobs are REAL binary PGM files (decodable by
    _decode_ppm with no external libraries)."""
    rows = []
    for i in range(n):
        px = _deterministic_pixels(i, width, height)
        rows.append(
            (i, "image", bytearray(encode_ppm(px)), (width, height, 1, 0, "ppm"))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_wav_media(
    spark: SparkSession, n: int = 32, sample_rate: int = 8000, n_samples: int = 256
) -> DataFrame:
    """Media table whose blobs are REAL RIFF/WAVE files."""
    rows = []
    for i in range(n):
        raw = b"".join(
            hashlib.md5(f"wav:{i}:{j}".encode()).digest()
            for j in range(n_samples * 2 // 16 + 1)
        )
        samples = np.frombuffer(raw[: n_samples * 2], dtype="<i2")
        rows.append(
            (
                i,
                "audio",
                bytearray(encode_wav(samples, sample_rate)),
                (0, 0, 1, sample_rate, "wav"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_pixels(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-decode: tile the blob's md5 stream to w*h bytes."""
    seed = hashlib.md5(blob).digest()
    reps = (width * height) // len(seed) + 1
    return np.frombuffer((seed * reps)[: width * height], dtype=np.uint8).reshape(
        height, width
    )


def _decode_ppm(blob: bytes) -> np.ndarray:
    """REAL decode of binary PPM/PGM (P5 grayscale, P6 RGB → luma): header
    tokens then raw bytes — parseable with zero external libraries. Returns
    a (height, width) float64 grayscale array."""
    magic = blob[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM blob")
    # header: magic, width, height, maxval — '#' comments allowed
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(int(blob[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then payload
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    channels = 3 if magic == b"P6" else 1
    px = np.frombuffer(blob, dtype=np.uint8, count=width * height * channels, offset=i)
    if channels == 3:
        return px.reshape(height, width, 3).astype(np.float64).mean(axis=2)
    return px.reshape(height, width).astype(np.float64)


def _decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """REAL decode of RIFF/WAVE via the stdlib ``wave`` module. Returns
    (sample_rate, float64 mono samples) — multi-channel is averaged."""
    import io
    import wave

    with wave.open(io.BytesIO(blob)) as w:
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
        width = w.getsampwidth()
        channels = w.getnchannels()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:  # WAV 8-bit is unsigned, centered at 128
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return sr, samples


def _is_ppm(blob: bytes) -> bool:
    return blob[:2] in (b"P5", b"P6")


def _is_wav(blob: bytes) -> bool:
    return blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


def _decode_gray(b: bytes, meta, deterministic_fake: bool) -> np.ndarray:
    """Per-blob grayscale dispatch: real PPM/PGM decode when the blob parses
    as one, the md5 pseudo-decode when ``deterministic_fake``, else raise.
    A fake blob whose first bytes collide with the P5/P6 magic (~2^-16 per
    blob) must still fall back to the fake path, so decode failures are
    swallowed only in fake mode."""
    if _is_ppm(b):
        try:
            return _decode_ppm(b)
        except ValueError:
            if not deterministic_fake:
                raise
    if deterministic_fake:
        w, h = int(meta["width"]), int(meta["height"])
        return _fake_pixels(b, w, h).astype(np.float64)
    raise NotImplementedError(
        "only binary PPM/PGM decodes without PIL/opencv (absent in this "
        "container); pass deterministic_fake=True for other formats"
    )


def decode_image_features(
    df: DataFrame,
    deterministic_fake: bool = False,
    feature_dim: int = 8,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode image blobs → (dims, mean luminance, small feature vector).

    Binary PPM/PGM blobs (P5/P6 magic) decode FOR REAL via _decode_ppm;
    other formats need PIL/opencv (absent in this container) and fall back
    to the md5 pseudo-decode only when ``deterministic_fake=True``. The
    Spark plumbing (Arrow batching via mapInPandas, schema, repartition)
    is identical for both paths.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_luma": [],
                "feature": [],
            }
            # per-blob work is inherently row-wise (variable-size payloads),
            # but column zip avoids pandas' per-row Series construction
            for mid, blob, meta in zip(pdf["media_id"], pdf["blob"], pdf["meta"]):
                if blob is None:
                    continue  # missing/corrupt payload: no decoded row, like a dropped file
                px = _decode_gray(bytes(blob), meta, deterministic_fake)
                h, w = px.shape
                # feature: per-column-stripe means, fixed dim
                stripes = np.array_split(px, feature_dim, axis=1)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(float(px.mean()))
                out["feature"].append([float(s.mean()) for s in stripes])
            if out["media_id"]:
                # never yield an empty frame: pandas gives empty
                # columns float64 dtype, which Arrow cannot cast to
                # list/binary output fields
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
            for mid, blob, meta in zip(pdf["media_id"], pdf["blob"], pdf["meta"]):
                if blob is None:
                    continue  # missing/corrupt payload: no decoded row, like a dropped file
                blob = bytes(blob)
                n_frames = int(meta["n_frames"])
                frame_sz = max(1, len(blob) // max(n_frames, 1))
                for idx in range(0, n_frames, every_nth):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_blob"].append(
                        bytearray(blob[idx * frame_sz : (idx + 1) * frame_sz])
                    )
            if out["media_id"]:
                # never yield an empty frame: pandas gives empty
                # columns float64 dtype, which Arrow cannot cast to
                # list/binary output fields
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

    RIFF/WAVE blobs decode FOR REAL via the stdlib ``wave`` module (sample
    rate comes from the file header, not metadata); other formats need
    soundfile/librosa (absent in this container) and fall back to the
    int8-stream pseudo-decode only when ``deterministic_fake=True``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "sample_rate": [],
                "n_samples": [],
                "rms": [],
                "zero_crossings": [],
            }
            for mid, blob, meta in zip(pdf["media_id"], pdf["blob"], pdf["meta"]):
                if blob is None:
                    continue  # missing/corrupt payload: no decoded row, like a dropped file
                b = bytes(blob)
                sr = samples = None
                if _is_wav(b):
                    try:
                        sr, samples = _decode_wav(b)
                    except Exception:
                        if not deterministic_fake:
                            raise
                if samples is None:
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "only RIFF/WAVE decodes without soundfile/librosa "
                            "(absent in this container); pass "
                            "deterministic_fake=True for other formats"
                        )
                    sr = int(meta["sample_rate"])
                    samples = np.frombuffer(b, dtype=np.int8).astype(np.float64)
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(samples))
                out["rms"].append(round(float(np.sqrt(np.mean(samples**2))), 6))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(samples))))
                )
            if out["media_id"]:
                # never yield an empty frame: pandas gives empty
                # columns float64 dtype, which Arrow cannot cast to
                # list/binary output fields
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

    PPM/PGM blobs decode for real (as in decode_image_features); other
    formats use the md5 pseudo-decode when ``deterministic_fake=True``.
    The resample itself is a real nearest-neighbor in numpy either way —
    the Spark shape (mapInPandas, fixed output schema, blob out) is what a
    PIL/opencv-backed implementation would keep unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, blob, meta in zip(pdf["media_id"], pdf["blob"], pdf["meta"]):
                if blob is None:
                    continue  # missing/corrupt payload: no decoded row, like a dropped file
                px = _decode_gray(bytes(blob), meta, deterministic_fake).astype(np.uint8)
                h, w = px.shape
                ys = (np.arange(out_height) * h // out_height)
                xs = (np.arange(out_width) * w // out_width)
                small = px[np.ix_(ys, xs)]
                out["media_id"].append(mid)
                out["width"].append(out_width)
                out["height"].append(out_height)
                out["pixels"].append(bytearray(small.tobytes()))
            if out["media_id"]:
                # never yield an empty frame: pandas gives empty
                # columns float64 dtype, which Arrow cannot cast to
                # list/binary output fields
                yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)
