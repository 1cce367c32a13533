"""Multimodal column operators (SURVEY §2C): image/audio/video as opaque
``binary`` columns with typed metadata.

The container has no image/audio codecs, so the *decode kernels* are stubbed
(clearly marked, deterministic fakes for tests) while everything Spark-side —
schemas, batch shapes, ``mapInPandas`` plumbing, partition sizing — is real
and tested. Swapping the stub for Pillow/librosa/PyAV is a one-function
change per modality.

Scale notes: media rows are huge and skewed — the iterator-of-batches
``mapInPandas`` shape lets Arrow stream records without materializing a whole
partition; ``repartition`` by size-bucket before decode keeps task runtimes
even; metadata-only transforms never touch the payload column (column
pruning drops the bytes at the scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
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
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("phash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake decode. Real implementation:
    ``PIL.Image.open(io.BytesIO(payload)).size`` (Pillow not in container).
    The fake derives a stable (width, height) from the payload hash so tests
    are reproducible."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB — deterministic fake embedding (sha256-derived). Real
    implementation: a vision encoder over the decoded tensor."""
    h = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas decode + feature extraction for image rows.

    The UDF signature, Arrow batch shape, and output schema are the real
    production plumbing; only the two kernel stubs above are fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-wise assembly: only the decode/encode KERNELS are per-row
        # (inherent — they consume one blob each); everything else is Series
        # ops. iterrows cost ~10x on wide batches (BASELINE.md).
        for pdf in batches:
            payload = pdf["payload"].map(lambda p: b"" if p is None else bytes(p))
            dims = payload.map(_decode_image_stub)  # per-row kernel call
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": payload.map(len).astype("int64"),
                    "phash": payload.map(
                        lambda p: hashlib.sha256(p).hexdigest()[:16]
                    ),
                    "features": payload.map(_feature_stub),  # per-row kernel
                }
            )

    images = media.filter(F.col("kind") == "image")
    return images.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", FloatType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _resize_stub(payload: bytes, max_side: int) -> tuple[int, int, bytes]:
    """STUB — deterministic fake resize. Real implementation:
    ``PIL.Image.open(...).thumbnail((max_side, max_side))`` + re-encode.
    The fake scales the stub-decoded dims to fit ``max_side`` (aspect
    preserved) and derives a stable fake payload from the original hash, so
    the contract — output dims ≤ max_side, payload replaced — is testable."""
    w, h = _decode_image_stub(payload)
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    fake = hashlib.sha256(payload + b"|resized").digest() * (1 + nw * nh // 32)
    return nw, nh, fake[: nw * nh // 16 + 16]


def resize_images(media: DataFrame, max_side: int = 128) -> DataFrame:
    """mapInPandas image resize: payload in, (smaller) payload out. Unlike
    the metadata-only ops this both reads AND writes the binary column, so
    batches stream through Arrow without materializing a partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"].map(lambda p: b"" if p is None else bytes(p))
            resized = payload.map(lambda p: _resize_stub(p, max_side))  # kernel
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": resized.map(lambda r: r[0]).astype("int32"),
                    "height": resized.map(lambda r: r[1]).astype("int32"),
                    "payload": resized.map(lambda r: r[2]),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


def _decode_audio_stub(payload: bytes) -> tuple[int, float]:
    """STUB — deterministic fake audio decode. Real implementation:
    ``soundfile.read(io.BytesIO(payload))`` → (sample_rate, n_samples/rate).
    Fake derives a stable (rate, duration) from the payload hash."""
    h = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100)[h[2] % 4]
    return rate, round(0.5 + h[3] / 16.0, 3)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode + feature extraction for audio rows — same
    plumbing contract as extract_image_features (real schema/batching,
    stub kernel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"].map(lambda p: b"" if p is None else bytes(p))
            decoded = payload.map(_decode_audio_stub)  # per-row kernel call
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sample_rate": decoded.map(lambda d: d[0]).astype("int32"),
                    "duration_s": decoded.map(lambda d: d[1]).astype("float32"),
                    "n_bytes": payload.map(len).astype("int64"),
                    "features": payload.map(_feature_stub),  # per-row kernel
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into (media_id,
    frame_ts) rows from metadata only — the payload column is pruned out of
    the scan entirely (check .explain: ReadSchema excludes ``payload``).
    The per-frame decode would be a second mapInPandas over a payload join."""
    dur = F.get_json_object(F.col("meta_json"), "$.duration_s").cast("double")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.floor(dur / every_n_seconds).cast("int"), F.lit(0)),
                )
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_s", F.col("frame_idx") * every_n_seconds)
    )


def media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (no external files)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = (f"media-{i}".encode() * 7)[: 50 + i]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "meta_json": '{"duration_s": %d}' % (i * 5 % 60),
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
