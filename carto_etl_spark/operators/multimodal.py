"""Multimodal columns: images/audio/video as opaque binary columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``.

The decode step needs media libraries that are not in this container, so the
actual byte decoding is STUBBED: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake (hash-derived
dimensions + tiny feature vector) exercises the full Spark plumbing — schema,
batching, partitioning — which is the part that has to be right at 100 TB.

Scale notes: binary payloads ride in their own column so column pruning keeps
metadata-only queries off the bytes; `maxRecordsPerBatch` bounds Arrow batch
memory; `binaryFile` reads stream file contents without driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, kind: str = "image") -> DataFrame:
    """Distributed binary ingest via the ``binaryFile`` source -> MEDIA_SCHEMA."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.col("path"),
            F.regexp_extract("path", r"\.(\w+)$", 1).alias("format"),
            F.col("length").alias("bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real image decoder: dimensions and an
    8-dim feature derived from the content digest."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = [b / 255.0 for b in digest[2:10]]
    return width, height, 3, feats


def decode_image_features(
    df: DataFrame, *, fake: bool = False, batch_size_hint: int = 256
) -> DataFrame:
    """Image decode / feature-extract over ``mapInPandas`` (Arrow-batched).

    Real decoding requires PIL/cv2 which are unavailable here — pass
    ``fake=True`` for the deterministic stand-in, otherwise this raises
    NotImplementedError *at executor time* the way the real thing would
    surface import failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/cv2 (not in this container); "
                    "pass fake=True to exercise the pipeline"
                )
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                w, h, c, feats = _fake_decode(bytes(content or b""))
                rows.append((media_id, w, h, c, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "feature"]
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, every_n_seconds: float = 1.0, *, fake: bool = False
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx, ts_seconds)
    rows; the decoded frame payload is stubbed like ``decode_image_features``."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_seconds", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding unavailable; pass fake=True"
                )
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha256(bytes(content or b"")).digest()
                n_frames = 1 + digest[0] % 8  # fake duration
                for i in range(n_frames):
                    rows.append((media_id, i, i * every_n_seconds))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_seconds"])

    return df.select("media_id", "content").mapInPandas(run, schema=schema)
