"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): treat image/audio/video as
``binary`` columns with a typed metadata struct; decode / feature-
extract / resize / frame-sample run as Arrow-batched Pandas functions
over ``mapInPandas`` so each executor processes columnar batches without
per-row Python overhead.

The container has no image/audio codecs, so the *decode* step is a
deterministic stand-in (payload digest + byte stats) and the real-codec
entry points raise ``NotImplementedError`` with a clear marker. The
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested; swapping in PIL/ffmpeg later only
replaces the body of ``_decode_payload``.

Because the stand-in features are pure functions of the payload bytes,
``media_features`` still has a value-exact DuckDB oracle (md5/byte-length
of the same synthesized payloads) — the plumbing is verified end-to-end,
not just "it returns rows".
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_md5", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents: payload = utf-8 text.

    Stand-in for a real binary source (S3 blobs, tar shards). Metadata
    derives from doc_id so every engine agrees on it.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 64 * 16 + 256).cast("int").alias("width"),
        (F.col("doc_id") % 32 * 16 + 256).cast("int").alias("height"),
        (F.col("doc_id") % 300 * 1000).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "STUB: image decode needs PIL/opencv (not installed); "
        "media_features uses the deterministic byte-stat stand-in instead"
    )


def decode_audio(payload: bytes) -> object:
    """Real audio decode — requires soundfile/ffmpeg, absent here."""
    raise NotImplementedError("STUB: audio decode needs soundfile/ffmpeg")


def sample_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """Real video frame sampling — requires ffmpeg, absent here."""
    raise NotImplementedError("STUB: frame sampling needs ffmpeg")


def _decode_payload(payload: bytes) -> dict:
    """Deterministic stand-in decode: digest + byte statistics."""
    return {
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "payload_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "byte_sum_mod": sum(payload) % 1_000_003,
    }


def media_features(media: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each executor receives columnar pandas batches; the
    decode runs batch-at-a-time (vectorizable once a real codec is in).

    Python stages only parallelize across partitions. At 100 TB the
    scan is already wide (one partition per ~128 MB split) so no
    repartition is needed; pass ``min_partitions`` only when feeding a
    narrow source (e.g. one small file) whose decode cost justifies the
    shuffle + extra Python workers.
    """
    if min_partitions is not None:
        media = media.repartition(min_partitions)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_md5": [
                        hashlib.md5(p).hexdigest() for p in payloads
                    ],
                    "payload_bytes": [len(p) for p in payloads],
                    "first_byte": [p[0] if len(p) else -1 for p in payloads],
                    "byte_sum_mod": [sum(p) % 1_000_003 for p in payloads],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per sampled frame
    timestamp (``0, every_ms, 2·every_ms, … < duration_ms``).

    Pure metadata math — ``explode(sequence(...))`` fans each video out
    to its frame list JVM-side; the actual frame *decode* at each
    timestamp is the ``sample_frames`` codec stub. This is the shape a
    real pipeline keeps at scale: plan rows first (cheap, prunable,
    joinable against dedup/similarity filters), decode only what
    survives.
    """
    video = media.filter(
        (F.col("media_type") == "video") & (F.col("duration_ms") > 0)
    )
    idx = F.sequence(
        F.lit(0),
        F.floor((F.col("duration_ms") - 1) / F.lit(every_ms)).cast("int"),
    )
    return video.select(
        "media_id",
        "duration_ms",
        F.explode(idx).alias("frame_index"),
    ).select(
        "media_id",
        "duration_ms",
        F.col("frame_index").cast("int").alias("frame_index"),
        (F.col("frame_index") * every_ms).cast("bigint").alias("frame_ts_ms"),
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning (pure metadata math — no decode needed):
    target dimensions preserving aspect ratio, capped at ``max_side``."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "media_id",
        "media_type",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale).cast("int").alias("target_height"),
        F.round(scale, 6).alias("scale"),
    )
