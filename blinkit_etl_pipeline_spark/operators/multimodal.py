"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): treat image/audio/video as
``binary`` columns with a typed metadata struct; decode / feature-
extract / resize / frame-sample run as Arrow-batched Pandas functions
over ``mapInPandas`` so each executor processes columnar batches without
per-row Python overhead.

Image rows carry REAL image payloads: valid binary PPM (P6) files,
synthesized JVM-side, and :func:`decode_ppm` is a real pure-stdlib
decoder (header tokenizer with comment handling + raster slicing) that
runs inside the ``mapInPandas`` stage to produce pixel statistics
(per-channel means, parsed dimensions). Audio rows carry REAL mono
8-bit PCM WAV payloads and :func:`decode_wav` is a real chunk-walking
RIFF parser producing sample statistics (rate, count, mean amplitude).
Formats that need external codecs (JPEG/PNG via PIL, compressed audio
and video via ffmpeg) remain ``NotImplementedError`` stubs — the
decode *pipeline* is exercised end to end on PPM + WAV; swapping in
PIL/ffmpeg later only adds format branches.

Because the PPM pixels follow a closed-form generator, ``media_features``
has a value-exact DuckDB oracle: the oracle derives byte checksums and
channel means from the formula while Spark derives them by actually
parsing the bytes — an independent cross-check of the decoder, not an
echo of it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

#: audio synthesis constants: mono 8-bit PCM, fixed geometry so the
#: 44-byte canonical RIFF/WAVE header is ONE shared literal across
#: Spark, the decoder tests, and the DuckDB oracle.
AUDIO_SAMPLE_RATE = 8000
AUDIO_N_SAMPLES = 2048


def wav_header(n_samples: int = AUDIO_N_SAMPLES,
               rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for mono 8-bit PCM."""
    import struct

    data_size = n_samples  # 1 byte/sample, mono
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", data_size)
    )

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
        StructField("payload_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
        StructField("byte_weighted_mod", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("parsed_width", IntegerType()),
        StructField("parsed_height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("parsed_sample_rate", IntegerType()),
        StructField("parsed_n_samples", LongType()),
        StructField("mean_amplitude", DoubleType()),
    ]
)

CHECKSUM_MOD = 1_000_003

# image payload generator: pixel byte i of media m = (m*7 + i*13) % 256
PIX_A, PIX_B = 7, 13


def _img_w(doc_id: Column) -> Column:
    return (doc_id % 16 + 8).cast("int")


def _img_h(doc_id: Column) -> Column:
    return (doc_id % 12 + 8).cast("int")


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents.

    Image rows (doc_id % 3 == 0) get REAL binary PPM (P6) payloads and
    audio rows (doc_id % 3 == 1) REAL mono 8-bit PCM WAV payloads, both
    built entirely JVM-side: header + generated sample/raster hex folded
    through ``unhex`` — no UDF, no driver loop. Video rows keep utf-8
    text bytes (their codec is stubbed). Metadata width/height matches
    the actual PPM dimensions for images; the legacy formula stays for
    non-image rows so resize planning has varied shapes.
    """
    mid = F.col("doc_id")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (mid % 3 + 1).cast("int")
    )
    w, h = _img_w(mid), _img_h(mid)
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    n_pix_bytes = (w * h * 3).cast("bigint")

    def _gen_hex(n_bytes: Column) -> Column:
        """Hex string of ``n_bytes`` generator bytes ((mid·A + i·B) % 256)."""
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), n_bytes - 1),
                lambda i: F.lpad(F.hex((mid * PIX_A + i * PIX_B) % 256), 2, "0"),
            ),
            "",
        )

    ppm = F.unhex(F.concat(F.hex(F.encode(header, "utf-8")), _gen_hex(n_pix_bytes)))
    # audio rows carry REAL mono 8-bit PCM WAV: shared literal header +
    # generator sample bytes — decode_wav walks the RIFF chunks for real
    wav = F.unhex(
        F.concat(
            F.lit(wav_header().hex().upper()),
            _gen_hex(F.lit(AUDIO_N_SAMPLES).cast("bigint")),
        )
    )
    is_image = media_type == "image"
    is_audio = media_type == "audio"
    return docs.select(
        mid.alias("media_id"),
        media_type.alias("media_type"),
        F.when(is_image, ppm)
        .when(is_audio, wav)
        .otherwise(F.encode("text", "utf-8"))
        .alias("payload"),
        F.when(is_image, w)
        .otherwise((mid % 64 * 16 + 256).cast("int"))
        .alias("width"),
        F.when(is_image, h)
        .otherwise((mid % 32 * 16 + 256).cast("int"))
        .alias("height"),
        (mid % 300 * 1000).cast("int").alias("duration_ms"),
    )


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib binary PPM (P6) decoder → (width, height, raster).

    A real parser, not a fixed-offset slice: tokenizes the header
    (magic, width, height, maxval) across arbitrary whitespace and
    ``#`` comments per the netpbm spec, then takes exactly
    ``3·width·height`` raster bytes after the single post-maxval
    whitespace byte.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raster = payload[pos : pos + 3 * width * height]
    if len(raster) != 3 * width * height:
        raise ValueError("truncated PPM raster")
    return width, height, raster


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Image decode: PPM handled natively; other formats need PIL."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "STUB: non-PPM image decode needs PIL/opencv (not installed)"
    )


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib WAV (RIFF) decoder → (sample_rate, n_samples, pcm).

    A real chunk-walking parser, not a fixed-offset slice: validates the
    RIFF/WAVE container, iterates chunks honoring the spec's word
    alignment (odd-sized chunks pad one byte), reads the ``fmt `` block
    and requires uncompressed mono 8-bit PCM, then returns the ``data``
    payload. Unknown chunks (LIST, cue, …) are skipped, as a real
    decoder must.
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if (audio_format, channels, bits) != (1, 1, 8):
        raise ValueError(
            f"only mono 8-bit PCM supported, got fmt={audio_format} "
            f"ch={channels} bits={bits}"
        )
    return rate, len(data), data


def decode_audio(payload: bytes) -> tuple[int, int, bytes]:
    """Audio decode: WAV/PCM handled natively; compressed formats
    (mp3/ogg/flac) would need soundfile/ffmpeg."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "STUB: compressed audio decode needs soundfile/ffmpeg (not installed)"
    )


def sample_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """Real video frame sampling — requires ffmpeg, absent here."""
    raise NotImplementedError("STUB: frame sampling needs ffmpeg")


def _byte_stats(payload: bytes) -> tuple[int, int, int, int]:
    """(n_bytes, first_byte, sum mod, position-weighted sum mod) — the
    weighted term makes the checksum order-sensitive, so a decoder that
    shuffled bytes could not pass the oracle."""
    return (
        len(payload),
        payload[0] if payload else -1,
        sum(payload) % CHECKSUM_MOD,
        sum(v * (i + 1) for i, v in enumerate(payload)) % CHECKSUM_MOD,
    )


def media_features(media: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each executor receives columnar pandas batches.
    Image payloads go through the REAL :func:`decode_ppm` parse —
    parsed dimensions and per-channel pixel means are computed from the
    decoded raster; non-image payloads report byte statistics only
    (their codecs are stubbed).

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
            out = {
                "media_id": [], "media_type": [], "payload_bytes": [],
                "first_byte": [], "byte_sum_mod": [], "byte_weighted_mod": [],
                "width": [], "height": [], "parsed_width": [],
                "parsed_height": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "parsed_sample_rate": [], "parsed_n_samples": [],
                "mean_amplitude": [],
            }
            for mid, mtype, payload, w, h in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                n, first, s_mod, w_mod = _byte_stats(payload)
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["payload_bytes"].append(n)
                out["first_byte"].append(first)
                out["byte_sum_mod"].append(s_mod)
                out["byte_weighted_mod"].append(w_mod)
                out["width"].append(w)
                out["height"].append(h)
                img = aud = None
                if mtype == "image":
                    img = decode_image(bytes(payload))
                elif mtype == "audio":
                    aud = decode_audio(bytes(payload))
                if img is not None:
                    pw, ph, raster = img
                    npx = pw * ph
                    out["parsed_width"].append(pw)
                    out["parsed_height"].append(ph)
                    # raw int-sum/npx doubles; rounding happens JVM-side
                    # below (Python round() is banker's — wrong tie rule)
                    out["mean_r"].append(sum(raster[0::3]) / npx)
                    out["mean_g"].append(sum(raster[1::3]) / npx)
                    out["mean_b"].append(sum(raster[2::3]) / npx)
                else:
                    out["parsed_width"].append(None)
                    out["parsed_height"].append(None)
                    out["mean_r"].append(None)
                    out["mean_g"].append(None)
                    out["mean_b"].append(None)
                if aud is not None:
                    rate, nsamp, pcm = aud
                    out["parsed_sample_rate"].append(rate)
                    out["parsed_n_samples"].append(nsamp)
                    out["mean_amplitude"].append(sum(pcm) / max(nsamp, 1))
                else:
                    out["parsed_sample_rate"].append(None)
                    out["parsed_n_samples"].append(None)
                    out["mean_amplitude"].append(None)
            yield pd.DataFrame(out)

    feats = media.mapInPandas(extract, schema=FEATURES_SCHEMA)
    return feats.select(
        *[
            c
            for c in feats.columns
            if c not in ("mean_r", "mean_g", "mean_b", "mean_amplitude")
        ],
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("mean_amplitude", 6).alias("mean_amplitude"),
    )


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
