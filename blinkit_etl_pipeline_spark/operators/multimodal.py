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
:func:`decode_png` is a real pure-stdlib PNG decoder (chunk walk with
CRC verification, zlib inflate, per-scanline unfilter incl. Paeth) fed
by :func:`synthesize_png_media`'s JVM-built valid containers; GIF
decodes natively too (``functions/gif.py``: variable-width LZW with
dictionary growth, sub-block reassembly, interlace, local palettes)
fed by :func:`synthesize_gif_media`.
Baseline-sequential JPEG is a full native codec too
(``functions/jpeg.py``: forward/inverse DCT, two-pass optimized
Huffman, restart markers, 4:4:4/4:2:0 color), exercised end to end by
:func:`jpeg_roundtrip_stats`. IMA ADPCM compressed audio
(``functions/adpcm.py``) and MJPEG/AVI video (``functions/video.py``)
decode natively too. The only remaining stubs are genuinely
environment-limited: exotic image formats (TIFF/WebP/progressive JPEG
need PIL), PERCEPTUAL audio codecs (mp3/ogg need ffmpeg/soundfile),
and inter-frame video (H.264+ needs ffmpeg) — every modality has a
real compressed-codec path exercised end to end.

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

from ..functions.gif import GIF_HEADERS, decode_gif
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

#: GIF synthesis: 128-color global palette (7 bits/pixel), LZW minimum
#: code size 7 → all codes are exactly 8 bits wide while the dictionary
#: stays under 256 entries, so a CLEAR every GIF_GROUP literals keeps
#: the whole code stream byte-aligned and Catalyst-expressible. 100
#: literals after a CLEAR grow the dictionary to 229 < 256 — safely
#: inside 8-bit width for both early- and late-bump decoders.
GIF_GROUP = 100
GIF_N_COLORS = 128
#: palette entry j → (2j, 3j mod 256, (5j+7) mod 256): distinct
#: channels so a palette-index/channel mixup cannot cancel out in the
#: oracle's means. Constant across images → one shared hex literal.
GIF_PALETTE_HEX = "".join(
    f"{(2 * j) % 256:02X}{(3 * j) % 256:02X}{(5 * j + 7) % 256:02X}"
    for j in range(GIF_N_COLORS)
)


def _img_w(doc_id: Column) -> Column:
    return (doc_id % 16 + 8).cast("int")


def _img_h(doc_id: Column) -> Column:
    return (doc_id % 12 + 8).cast("int")


#: session-keyed memo for synthesize_media's projection list — see its
#: docstring; {"key": applicationId, "cols": [Column, ...]}
_SYNTH_COLS_MEMO: dict = {}


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents.

    Image rows (doc_id % 3 == 0) get REAL binary PPM (P6) payloads and
    audio rows (doc_id % 3 == 1) REAL mono 8-bit PCM WAV payloads, both
    built entirely JVM-side: header + generated sample/raster hex folded
    through ``unhex`` — no UDF, no driver loop. Video rows keep utf-8
    text bytes (their codec is stubbed). Metadata width/height matches
    the actual PPM dimensions for images; the legacy formula stays for
    non-image rows so resize planning has varied shapes.

    The projection list is memoized per session (r11): the container
    expressions are hundreds of Column nodes, each a py4j round-trip
    to build — ~0.3 s of pure DRIVER time per call that bench
    attestation (PLANS.md r11) showed was the whole apparent
    "regression" of ns_media_features. Columns are unresolved
    immutable expressions over ``doc_id``/``text``, so one list
    serves every docs frame with those columns.
    """
    key = docs.sparkSession.sparkContext.applicationId
    if _SYNTH_COLS_MEMO.get("key") == key:
        return docs.select(*_SYNTH_COLS_MEMO["cols"])
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
    cols = [
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
    ]
    _SYNTH_COLS_MEMO.clear()
    _SYNTH_COLS_MEMO.update({"key": key, "cols": cols})
    return docs.select(*cols)


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload) — one VALID PNG per document, built entirely
    JVM-side (zero UDFs), so the decode query's Python stage is only the
    decoder under test.

    Container anatomy, all assembled as Catalyst hex-string expressions
    and folded through one ``unhex``:

    - signature + IHDR (8-bit truecolor), CRC-32 via ``F.crc32``;
    - IDAT holding a zlib stream with a single *stored* deflate block
      (the raster is ≤ ~1.4 KB, far under the 65535-byte stored-block
      cap) and a real adler32 trailer computed as two modular sums with
      ``F.aggregate`` — ``s2`` uses the closed form
      ``n + Σ (n−p)·byte(p) (mod 65521)``;
    - IEND (constant bytes).

    Scanline filters alternate by row — None (0), Sub (1), Up (2) — so
    the oracle-checked query exercises real unfiltering, not just raster
    copies. The generator pixel ``pix(i) = (mid·7 + i·13) % 256`` is
    linear in ``i``, so the filtered bytes stay closed-form: Sub deltas
    are the constant ``3·13 = 39`` and Up deltas the constant
    ``stride·13 % 256``. The DECODED raster is filter-independent (the
    generator bytes), which is what gives ``ns_media_png`` a value-exact
    DuckDB oracle: DuckDB derives pixel statistics from the formula
    while Spark recovers them by actually parsing, inflating, and
    unfiltering the container — if any CRC, adler, stored-block length,
    or filter byte were wrong, the decoder raises and the query fails.
    Average/Paeth filters carry sequential dependencies that aren't
    Catalyst-expressible closed-form; the decoder's support for them is
    pinned by round-trip unit tests instead.
    """
    mid = F.col("doc_id")
    w, h = _img_w(mid), _img_h(mid)
    stride = (w * 3).cast("bigint")
    row_len = stride + 1  # filter byte + raster bytes
    n = (h.cast("bigint") * row_len).cast("bigint")  # decompressed size

    def be32(c) -> Column:
        return F.lpad(F.hex(c.cast("bigint")), 8, "0")

    def le16(c) -> Column:
        return F.concat(
            F.lpad(F.hex(F.pmod(c, 256)), 2, "0"),
            F.lpad(F.hex(F.shiftright(c.cast("int"), 8)), 2, "0"),
        )

    def png_byte(p: Column) -> Column:
        """Byte ``p`` of the decompressed (filtered) scanline stream."""
        r = F.floor(p / row_len).cast("bigint")  # scanline index
        k = F.pmod(p, row_len)  # 0 = filter byte, else raster offset+1
        j = k - 1  # byte offset within the row's raster
        i = r * stride + j  # raster index → generator input
        pix = F.pmod(mid * PIX_A + i * PIX_B, 256)
        fmod = F.pmod(r, 3)  # 0→None, 1→Sub, 2→Up
        return (
            F.when(k == 0, fmod)  # the filter-type byte itself
            .when(fmod == 0, pix)
            .when(fmod == 1, F.when(j < 3, pix).otherwise(F.lit(3 * PIX_B)))
            .otherwise(F.pmod(stride * PIX_B, 256))
        ).cast("bigint")

    seq = F.sequence(F.lit(0).cast("bigint"), n - 1)
    # Materialize the byte array once behind a Project boundary: the hex
    # join and both adler sums all read ``__png_data``, and Spark's
    # CollapseProject keeps the boundary when a non-cheap expression is
    # referenced more than once — so png_byte evaluates once per byte,
    # not once per consumer.
    docs = docs.withColumn("__png_data", F.transform(seq, png_byte))
    arr = F.col("__png_data")
    data_hex = F.array_join(
        F.transform(arr, lambda b: F.lpad(F.hex(b), 2, "0")), ""
    )
    byte_sum = F.aggregate(
        arr, F.lit(0).cast("bigint"), lambda acc, b: acc + b
    )
    # Σ (n−p)·b_p = n·Σb − Σ p·b_p (0-based p, matching transform's index)
    pos_sum = F.aggregate(
        F.transform(arr, lambda b, i: b * i.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    s1 = F.pmod(F.lit(1).cast("bigint") + byte_sum, 65521)
    s2 = F.pmod(n + n * byte_sum - pos_sum, 65521)
    adler_hex = be32(s2 * 65536 + s1)
    # zlib: CMF/FLG 0x7801, then one stored deflate block
    # (BFINAL=1 BTYPE=00 → 0x01, LEN, NLEN = LEN ^ 0xFFFF), then adler32
    zlib_hex = F.concat(
        F.lit("7801"), F.lit("01"), le16(n), le16(65535 - n), data_hex, adler_hex
    )
    ihdr_data_hex = F.concat(be32(w), be32(h), F.lit("0802000000"))
    ihdr_hex = F.concat(
        be32(F.lit(13)),
        F.lit("49484452"),  # "IHDR"
        ihdr_data_hex,
        be32(F.crc32(F.unhex(F.concat(F.lit("49484452"), ihdr_data_hex)))),
    )
    idat_hex = F.concat(
        be32(n + 11),  # zlib stream length: 2 hdr + 5 stored hdr + n + 4 adler
        F.lit("49444154"),  # "IDAT"
        zlib_hex,
        be32(F.crc32(F.unhex(F.concat(F.lit("49444154"), zlib_hex)))),
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),
        ihdr_hex,
        idat_hex,
        F.lit("0000000049454E44AE426082"),  # IEND (constant CRC)
    )
    return docs.select(
        mid.alias("media_id"), F.unhex(png_hex).alias("payload")
    )


def png_pixel_stats(png_media: DataFrame) -> DataFrame:
    """Decode PNG payloads → parsed dimensions + raster statistics.

    Arrow-batched ``mapInPandas`` around :func:`decode_png`; the raster
    checksums are position-weighted so a decoder that permuted or
    dropped bytes could not pass the oracle. Vectorized: the per-row
    work is numpy reductions over the decoded raster.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "parsed_width": [], "parsed_height": [],
                "raster_sum_mod": [], "raster_weighted_mod": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pw, ph, raster = decode_png(bytes(payload))
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                npx = pw * ph
                out["media_id"].append(mid)
                out["parsed_width"].append(pw)
                out["parsed_height"].append(ph)
                out["raster_sum_mod"].append(int(arr.sum()) % CHECKSUM_MOD)
                out["raster_weighted_mod"].append(
                    int((arr * np.arange(1, arr.size + 1, dtype=np.int64)).sum())
                    % CHECKSUM_MOD
                )
                # integer sums → exact doubles; rounding happens JVM-side
                out["mean_r"].append(int(arr[0::3].sum()) / npx)
                out["mean_g"].append(int(arr[1::3].sum()) / npx)
                out["mean_b"].append(int(arr[2::3].sum()) / npx)
            yield pd.DataFrame(out)

    feats = png_media.mapInPandas(
        extract,
        schema=(
            "media_id long, parsed_width int, parsed_height int,"
            " raster_sum_mod long, raster_weighted_mod long,"
            " mean_r double, mean_g double, mean_b double"
        ),
    )
    return feats.select(
        "media_id", "parsed_width", "parsed_height",
        "raster_sum_mod", "raster_weighted_mod",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload) — one VALID GIF89a per document, built
    entirely JVM-side (zero UDFs), so the decode query's Python stage
    is only the decoder under test.

    Container anatomy, assembled as Catalyst hex expressions:

    - header + logical screen descriptor (global table flag set, 128
      entries) + the constant 128-color palette (one shared literal);
    - image descriptor (full-frame, no local table, not interlaced);
    - LZW data with minimum code size 7: the pixel stream is cut into
      groups of ≤ ``GIF_GROUP`` indices, each emitted as its own
      sub-block ``[len][CLEAR][literals…]`` — with a CLEAR that often,
      the code width never leaves 8 bits, so every LZW code is exactly
      one byte and the stream is a closed-form function of position
      (see :data:`GIF_GROUP`); a final ``[1][EOI]`` sub-block, the
      0x00 terminator, and the 0x3B trailer close the file.

    Pixel index ``pix(i) = (mid·7 + i·13) % 128``; the decoded RGB
    raster is the palette image of that formula, which is what gives
    ``ns_media_gif`` a value-exact DuckDB oracle: DuckDB derives the
    statistics from palette(formula) while Spark recovers them by
    actually reassembling sub-blocks and LZW-decoding — the decoder's
    variable-width/dictionary-growth paths beyond 8-bit codes are
    pinned by round-trip unit tests against a real compressing
    encoder (tests/test_multimodal.py).
    """
    mid = F.col("doc_id")
    w, h = _img_w(mid), _img_h(mid)
    npx = (w.cast("bigint") * h).cast("bigint")
    # geometry is bounded (w≤23, h≤19 ⇒ npx≤437), so double-precision
    # floor/ceil here are exact
    n_groups = F.ceil(npx / GIF_GROUP).cast("bigint")
    rem = npx - (n_groups - 1) * GIF_GROUP
    base = (n_groups - 1) * (GIF_GROUP + 2)
    data_len = base + rem + 2  # last group: len byte + CLEAR + rem px

    def le16(c) -> Column:
        return F.concat(
            F.lpad(F.hex(F.pmod(c, 256)), 2, "0"),
            F.lpad(F.hex(F.shiftright(c.cast("int"), 8)), 2, "0"),
        )

    clear = F.lit(GIF_N_COLORS).cast("bigint")  # CLEAR code = 0x80

    def gif_byte(p: Column) -> Column:
        """Byte ``p`` of the LZW data region (sub-block framing
        included): closed-form in the pixel-generator formula."""
        q_full = F.pmod(p, GIF_GROUP + 2)
        i_full = (
            F.floor(p / (GIF_GROUP + 2)).cast("bigint") * GIF_GROUP
            + q_full
            - 2
        )
        q_last = p - base
        i_last = (n_groups - 1) * GIF_GROUP + q_last - 2
        pix_full = F.pmod(mid * PIX_A + i_full * PIX_B, GIF_N_COLORS)
        pix_last = F.pmod(mid * PIX_A + i_last * PIX_B, GIF_N_COLORS)
        return (
            F.when(
                p >= base,
                F.when(q_last == 0, rem + 1)
                .when(q_last == 1, clear)
                .otherwise(pix_last),
            ).otherwise(
                F.when(q_full == 0, F.lit(GIF_GROUP + 1).cast("bigint"))
                .when(q_full == 1, clear)
                .otherwise(pix_full)
            )
        ).cast("bigint")

    seq = F.sequence(F.lit(0).cast("bigint"), data_len - 1)
    data_hex = F.array_join(
        F.transform(seq, lambda p: F.lpad(F.hex(gif_byte(p)), 2, "0")), ""
    )
    gif_hex = F.concat(
        F.lit("474946383961"),  # "GIF89a"
        le16(w),
        le16(h),
        # packed: GCT flag | color-res 7 | size 2^(6+1)=128 → 0xF6
        F.lit("F60000"),
        F.lit(GIF_PALETTE_HEX),
        F.lit("2C00000000"),  # image descriptor @ (0,0)
        le16(w),
        le16(h),
        F.lit("00"),  # no local table, not interlaced
        F.lit("07"),  # LZW minimum code size
        data_hex,
        F.lit("0181"),  # final sub-block: EOI code
        F.lit("003B"),  # block terminator + trailer
    )
    return docs.select(mid.alias("media_id"), F.unhex(gif_hex).alias("payload"))


def gif_pixel_stats(gif_media: DataFrame) -> DataFrame:
    """Decode GIF payloads → parsed dimensions + raster statistics —
    the same contract as :func:`png_pixel_stats` (position-weighted
    checksums, per-channel means), via ``functions.gif.decode_gif``."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "parsed_width": [], "parsed_height": [],
                "raster_sum_mod": [], "raster_weighted_mod": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pw, ph, raster = decode_gif(bytes(payload))
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                npx = pw * ph
                out["media_id"].append(mid)
                out["parsed_width"].append(pw)
                out["parsed_height"].append(ph)
                out["raster_sum_mod"].append(int(arr.sum()) % CHECKSUM_MOD)
                out["raster_weighted_mod"].append(
                    int((arr * np.arange(1, arr.size + 1, dtype=np.int64)).sum())
                    % CHECKSUM_MOD
                )
                out["mean_r"].append(int(arr[0::3].sum()) / npx)
                out["mean_g"].append(int(arr[1::3].sum()) / npx)
                out["mean_b"].append(int(arr[2::3].sum()) / npx)
            yield pd.DataFrame(out)

    feats = gif_media.mapInPandas(
        extract,
        schema=(
            "media_id long, parsed_width int, parsed_height int,"
            " raster_sum_mod long, raster_weighted_mod long,"
            " mean_r double, mean_g double, mean_b double"
        ),
    )
    return feats.select(
        "media_id", "parsed_width", "parsed_height",
        "raster_sum_mod", "raster_weighted_mod",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


#: restart interval used by the oracle-checked JPEG query — restarts
#: are the segment-parallel-decode hook, so the checked path exercises
#: the resync logic, not just plain scans
JPEG_RESTART_MCUS = 2


def jpeg_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Baseline-JPEG correctness, end to end with a value-exact oracle.

    Per document: build a grayscale image whose 8×8 blocks are each
    constant (block ``b`` of media ``m`` has value ``(m·7 + b·13) %
    256``), encode it as a real baseline sequential JFIF JPEG
    (two-pass optimized Huffman, all-ones quantization, restart markers
    every :data:`JPEG_RESTART_MCUS` MCUs), then entropy-decode the
    container with :func:`..functions.jpeg.decode_jpeg` and report
    statistics over the DECODED raster.

    For flat blocks under an all-ones table the DCT roundtrip is
    bit-exact (only the DC coefficient survives, recovered within a
    ~1e-12 float error ≪ the 0.5 rounding radius), so DuckDB can derive
    the same statistics from the closed-form generator while Spark
    derives them by actually Huffman-decoding, dequantizing and
    IDCT-ing the bytes. A wrong bit anywhere in marker layout, Huffman
    table construction, entropy coding, restart resync, zigzag or the
    transforms hash-fails the query.

    Arrow-batched ``mapInPandas``; one Python stage holds both codec
    halves (unlike PNG, a JPEG entropy stream is not expressible as a
    Catalyst byte formula), so the independent check is the closed-form
    oracle plus the corruption/golden-payload unit tests in
    ``tests/test_jpeg.py``.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.jpeg import decode_jpeg, encode_jpeg

        ones = np.ones((8, 8), dtype=np.int64)
        for pdf in batches:
            out = {
                "media_id": [], "parsed_width": [], "parsed_height": [],
                "raster_sum_mod": [], "raster_weighted_mod": [],
                "mean_luma": [],
            }
            for mid in pdf["media_id"]:
                mid = int(mid)
                bw, bh = mid % 4 + 2, mid % 3 + 2
                blocks = (
                    mid * PIX_A
                    + np.arange(bh * bw, dtype=np.int64).reshape(bh, bw)
                    * PIX_B
                ) % 256
                img = np.kron(
                    blocks, np.ones((8, 8), dtype=np.int64)
                ).astype(np.uint8)
                payload = encode_jpeg(
                    img, quant=ones, restart_interval_mcus=JPEG_RESTART_MCUS
                )
                if len(payload) >= img.nbytes:
                    raise ValueError("JPEG did not compress a flat-block image")
                pw, ph, nc, raster = decode_jpeg(payload)
                if nc != 1:
                    raise ValueError("grayscale roundtrip changed components")
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                out["media_id"].append(mid)
                out["parsed_width"].append(pw)
                out["parsed_height"].append(ph)
                out["raster_sum_mod"].append(int(arr.sum()) % CHECKSUM_MOD)
                out["raster_weighted_mod"].append(
                    int(
                        (arr * np.arange(1, arr.size + 1, dtype=np.int64)).sum()
                    )
                    % CHECKSUM_MOD
                )
                out["mean_luma"].append(int(arr.sum()) / (pw * ph))
            yield pd.DataFrame(out)

    feats = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        work,
        schema=(
            "media_id long, parsed_width int, parsed_height int,"
            " raster_sum_mod long, raster_weighted_mod long, mean_luma double"
        ),
    )
    return feats.select(
        "media_id", "parsed_width", "parsed_height",
        "raster_sum_mod", "raster_weighted_mod",
        F.round("mean_luma", 6).alias("mean_luma"),
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int) -> bytes:
    """Reverse PNG scanline filtering (types 0–4, bpp=3) → RGB raster.

    Vectorized where the recurrence allows: None/Up are pure numpy;
    Sub is a per-channel modular cumsum (the recurrence
    ``recon[j] = d[j] + recon[j-3]`` telescopes per color lane);
    Average and Paeth carry an intra-row sequential dependency on the
    reconstructed left neighbor, so they fall back to a per-byte loop —
    they appear in arbitrary real PNGs (unit-tested), not in the
    synthesized payloads, so the hot path stays vectorized.
    """
    import numpy as np

    stride = 3 * width
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG raster size mismatch: expected {height * (stride + 1)}, "
            f"got {len(raw)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    recon = np.zeros((height, stride), dtype=np.int64)
    zero_row = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        ftype = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int64)
        prev = recon[r - 1] if r > 0 else zero_row
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub: cumsum per color lane, mod 256
            rec = cur.copy()
            for lane in range(3):
                rec[lane::3] = np.cumsum(cur[lane::3]) % 256
        elif ftype == 2:  # Up
            rec = (cur + prev) % 256
        elif ftype == 3:  # Average
            rec = np.empty_like(cur)
            for j in range(stride):
                a = rec[j - 3] if j >= 3 else 0
                rec[j] = (cur[j] + (a + prev[j]) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = np.empty_like(cur)
            for j in range(stride):
                a = rec[j - 3] if j >= 3 else 0
                c = prev[j - 3] if j >= 3 else 0
                b = prev[j]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[j] = (cur[j] + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        recon[r] = rec
    return recon.astype(np.uint8).tobytes()


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decoder → (width, height, RGB raster).

    A real, validating parser: checks the 8-byte signature, walks the
    chunk stream verifying every chunk's CRC-32, parses IHDR, concatenates
    the IDAT stream, inflates it with zlib (which also verifies the
    adler32 trailer), and reverses per-scanline filtering including
    Sub/Up/Average/Paeth (:func:`_png_unfilter`). Supports 8-bit
    truecolor (color type 2), non-interlaced — the shape
    :func:`synthesize_png_media` emits; other color types/interlacing
    raise with a clear message. A corrupted container (bad CRC, bad
    adler, truncated raster) fails loudly rather than returning wrong
    pixels.
    """
    import binascii
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if binascii.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "only 8-bit truecolor non-interlaced PNG supported, got "
            f"depth={depth} color={color} interlace={interlace}"
        )
    raw = zlib.decompress(b"".join(idat))  # verifies the adler32 trailer
    return width, height, _png_unfilter(raw, width, height)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Image decode: PPM, PNG, GIF and baseline JPEG handled natively
    (pure stdlib + numpy); exotic formats (TIFF/WebP/progressive JPEG)
    would need PIL."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:6] in GIF_HEADERS:
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg

        w, h, nc, raster = decode_jpeg(payload)
        if nc == 1:  # grayscale → replicate to the RGB interface
            import numpy as np

            gray = np.frombuffer(raster, dtype=np.uint8)
            raster = np.repeat(gray, 3).tobytes()
        return w, h, raster
    raise NotImplementedError(
        "STUB: TIFF/WebP/progressive-JPEG decode needs PIL/opencv "
        "(not installed); PPM, PNG and baseline JPEG decode natively"
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


def _wav_format_tag(payload: bytes) -> int:
    """Peek the fmt tag of a RIFF/WAVE payload (cheap chunk walk)."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            return int.from_bytes(payload[pos + 8 : pos + 10], "little")
        pos += 8 + size + (size % 2)
    raise ValueError("missing fmt chunk")


def decode_audio(payload: bytes) -> tuple[int, int, bytes]:
    """Audio decode: PCM WAV and IMA ADPCM (compressed, 4:1) handled
    natively; perceptual codecs (mp3/ogg/opus) would need soundfile/
    ffmpeg. ADPCM returns int16 little-endian sample bytes (16-bit
    decoded width), PCM8 returns the raw unsigned bytes."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from ..functions.adpcm import WAVE_FORMAT_IMA_ADPCM

        if _wav_format_tag(payload) == WAVE_FORMAT_IMA_ADPCM:
            from ..functions.adpcm import decode_ima_adpcm_wav

            rate, n, samples = decode_ima_adpcm_wav(payload)
            return rate, n, samples.tobytes()
        return decode_wav(payload)
    raise NotImplementedError(
        "STUB: perceptual audio decode (mp3/ogg/opus) needs soundfile/"
        "ffmpeg (not installed); PCM and IMA ADPCM decode natively"
    )


#: ADPCM synthesis geometry for the oracle-checked audio query: 12-byte
#: blocks → 17 samples each; sample values constant within each block
ADPCM_BLOCK_ALIGN = 12
ADPCM_SAMPLES_PER_BLOCK = 1 + (ADPCM_BLOCK_ALIGN - 4) * 2
ADPCM_VALUE_SCALE = 64  # lifts the 0..255 generator into 16-bit range


def adpcm_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Compressed-audio correctness, end to end with an exact oracle.

    Per document: build a mono int16 signal that is constant within
    each ADPCM block (block ``b`` of media ``m`` holds
    ``((m·7 + b·13) % 256) · 64``), encode it as a real IMA ADPCM WAV
    (4-bit adaptive-step nibbles), then decode the bitstream back and
    report statistics over the DECODED samples. Block-constant signals
    with initial step index 0 roundtrip bit-exactly (see
    ``functions/adpcm.py``), so DuckDB derives the same statistics from
    the closed-form generator while Spark derives them by actually
    unpacking nibbles and integrating the predictor.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.adpcm import (
            decode_ima_adpcm_wav,
            encode_ima_adpcm_wav,
        )

        for pdf in batches:
            out = {
                "media_id": [], "parsed_rate": [], "n_samples": [],
                "sample_sum_mod": [], "sample_weighted_mod": [],
                "mean_amplitude": [],
            }
            for mid in pdf["media_id"]:
                mid = int(mid)
                n_blocks = mid % 3 + 3
                vals = (
                    (mid * PIX_A + np.arange(n_blocks, dtype=np.int64) * PIX_B)
                    % 256
                ) * ADPCM_VALUE_SCALE
                samples = np.repeat(vals, ADPCM_SAMPLES_PER_BLOCK).astype(
                    np.int16
                )
                payload = encode_ima_adpcm_wav(
                    samples, AUDIO_SAMPLE_RATE, block_align=ADPCM_BLOCK_ALIGN
                )
                rate, n, dec = decode_ima_adpcm_wav(payload)
                arr = dec.astype(np.int64)
                out["media_id"].append(mid)
                out["parsed_rate"].append(rate)
                out["n_samples"].append(n)
                out["sample_sum_mod"].append(int(arr.sum()) % CHECKSUM_MOD)
                out["sample_weighted_mod"].append(
                    int(
                        (arr * np.arange(1, arr.size + 1, dtype=np.int64)).sum()
                    )
                    % CHECKSUM_MOD
                )
                out["mean_amplitude"].append(int(arr.sum()) / max(n, 1))
            yield pd.DataFrame(out)

    feats = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        work,
        schema=(
            "media_id long, parsed_rate int, n_samples long,"
            " sample_sum_mod long, sample_weighted_mod long,"
            " mean_amplitude double"
        ),
    )
    return feats.select(
        "media_id", "parsed_rate", "n_samples",
        "sample_sum_mod", "sample_weighted_mod",
        F.round("mean_amplitude", 6).alias("mean_amplitude"),
    )


def sample_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """Video frame sampling: MJPEG/AVI handled natively (container
    parse + per-frame baseline-JPEG decode, only the sampled frames
    are decoded); general codecs (H.264/VP9/…) would need ffmpeg."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from ..functions.video import sample_frames_mjpeg

        return [raster for _fi, _ts, _w, _h, raster in
                sample_frames_mjpeg(payload, every_ms)]
    raise NotImplementedError(
        "STUB: non-MJPEG frame decode needs ffmpeg (not installed)"
    )


#: MJPEG synthesis geometry for the oracle-checked video query: 16×16
#: frames (2×2 blocks of 8×8), 4 fps, frame count varies per doc
VIDEO_FRAME_W = 16
VIDEO_FRAME_H = 16
VIDEO_US_PER_FRAME = 250_000
VIDEO_FRAME_COEF = 31  # frame index term in the pixel generator


def mjpeg_frame_stats(docs: DataFrame, every_ms: int = 500) -> DataFrame:
    """MJPEG video sampling correctness, end to end with an exact oracle.

    Per document: build a tiny MJPEG/AVI video (``doc_id % 3 + 2``
    frames at 4 fps; frame ``f``'s 8×8 block ``b`` is the constant
    ``(mid·7 + f·31 + b·13) % 256``), then **sample** it at
    ``every_ms`` — container metadata parse, frame selection by
    timestamp, baseline-JPEG decode of only the selected frames — and
    report per-sampled-frame raster statistics. Flat blocks + unit
    quantization make each frame's decode bit-exact
    (see :func:`jpeg_roundtrip_stats`), so DuckDB derives the same
    statistics from the closed-form generator.

    One Arrow-batched Python stage holds synthesis + both codec halves;
    independence comes from the closed-form oracle plus the container/
    codec unit tests (``tests/test_jpeg.py``, ``tests/test_multimodal.py``).
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.video import encode_mjpeg_avi, sample_frames_mjpeg

        ones = np.ones((8, 8), dtype=np.int64)
        bw, bh = VIDEO_FRAME_W // 8, VIDEO_FRAME_H // 8
        for pdf in batches:
            out = {
                "media_id": [], "frame_index": [], "frame_ts_ms": [],
                "n_frames": [], "frame_sum_mod": [], "mean_luma": [],
            }
            for mid in pdf["media_id"]:
                mid = int(mid)
                n_frames = mid % 3 + 2
                frames = []
                for f in range(n_frames):
                    blocks = (
                        mid * PIX_A
                        + f * VIDEO_FRAME_COEF
                        + np.arange(bh * bw, dtype=np.int64).reshape(bh, bw)
                        * PIX_B
                    ) % 256
                    frames.append(
                        np.kron(
                            blocks, np.ones((8, 8), dtype=np.int64)
                        ).astype(np.uint8)
                    )
                payload = encode_mjpeg_avi(
                    frames, VIDEO_US_PER_FRAME, quant=ones
                )
                for fi, ts, w, h, raster in sample_frames_mjpeg(
                    payload, every_ms
                ):
                    arr = np.frombuffer(raster, dtype=np.uint8).astype(
                        np.int64
                    )
                    if arr.size != w * h:
                        raise ValueError("sampled frame size mismatch")
                    out["media_id"].append(mid)
                    out["frame_index"].append(fi)
                    out["frame_ts_ms"].append(int(ts))
                    out["n_frames"].append(n_frames)
                    out["frame_sum_mod"].append(
                        int(arr.sum()) % CHECKSUM_MOD
                    )
                    out["mean_luma"].append(int(arr.sum()) / (w * h))
            yield pd.DataFrame(out)

    feats = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        work,
        schema=(
            "media_id long, frame_index int, frame_ts_ms int,"
            " n_frames int, frame_sum_mod long, mean_luma double"
        ),
    )
    return feats.select(
        "media_id", "frame_index", "frame_ts_ms", "n_frames",
        "frame_sum_mod",
        F.round("mean_luma", 6).alias("mean_luma"),
    )


def _byte_stats(payload: bytes) -> tuple[int, int, int, int]:
    """(n_bytes, first_byte, sum mod, position-weighted sum mod) — the
    weighted term makes the checksum order-sensitive, so a decoder that
    shuffled bytes could not pass the oracle.

    numpy reductions, not per-byte Python: integer sums are exact either
    way, but the vectorized spelling is ~50× faster on kB payloads (the
    r3 bench regression was this loop). int64 is safe: the weighted sum
    is ≤ 255·n²/2, inside int64 for any payload under ~240 MB.
    """
    import numpy as np

    if not len(payload):
        return 0, -1, 0, 0
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    return (
        len(payload),
        int(arr[0]),
        int(arr.sum()) % CHECKSUM_MOD,
        int((arr * np.arange(1, arr.size + 1, dtype=np.int64)).sum())
        % CHECKSUM_MOD,
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
        import numpy as np

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
                    # numpy channel reductions over the decoded raster:
                    # integer sums are exact, so the doubles (and the
                    # JVM-side rounding below) match the per-byte
                    # Python spelling bit-for-bit — just ~50× faster
                    # (r3's bench regression was this loop)
                    px = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                    out["parsed_width"].append(pw)
                    out["parsed_height"].append(ph)
                    out["mean_r"].append(int(px[0::3].sum()) / npx)
                    out["mean_g"].append(int(px[1::3].sum()) / npx)
                    out["mean_b"].append(int(px[2::3].sum()) / npx)
                else:
                    out["parsed_width"].append(None)
                    out["parsed_height"].append(None)
                    out["mean_r"].append(None)
                    out["mean_g"].append(None)
                    out["mean_b"].append(None)
                if aud is not None:
                    rate, nsamp, pcm = aud
                    samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64)
                    out["parsed_sample_rate"].append(rate)
                    out["parsed_n_samples"].append(nsamp)
                    out["mean_amplitude"].append(
                        int(samples.sum()) / max(nsamp, 1)
                    )
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


def resize_nearest(raster: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of an RGB raster to (tw, th).

    Integer source mapping ``src = (dst · src_dim) // dst_dim`` — exact
    and engine-replayable (the oracle recomputes the same gather), and
    the standard nearest kernel when shrinking.
    """
    import numpy as np

    if tw <= 0 or th <= 0:
        raise ValueError("target dimensions must be positive")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    iy = (np.arange(th, dtype=np.int64) * h) // th
    ix = (np.arange(tw, dtype=np.int64) * w) // tw
    return arr[iy][:, ix].tobytes()


def resize_exec_stats(docs: DataFrame) -> DataFrame:
    """Resize EXECUTION correctness (the plan-only twin is
    :func:`resize_plan`): decode each synthesized PPM, nearest-resample
    to half size, and report statistics over the RESIZED raster. The
    gather positions are closed-form integers, so DuckDB re-derives the
    same pixels from the generator formula — a wrong index anywhere in
    decode or resample hash-fails."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "src_width": [], "src_height": [],
                "dst_width": [], "dst_height": [],
                "resized_sum_mod": [], "resized_weighted_mod": [],
                "mean_r": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_image(bytes(payload))
                tw, th = max(w // 2, 1), max(h // 2, 1)
                resized = resize_nearest(raster, w, h, tw, th)
                arr = np.frombuffer(resized, dtype=np.uint8).astype(np.int64)
                out["media_id"].append(mid)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["dst_width"].append(tw)
                out["dst_height"].append(th)
                out["resized_sum_mod"].append(int(arr.sum()) % CHECKSUM_MOD)
                out["resized_weighted_mod"].append(
                    int(
                        (arr * np.arange(1, arr.size + 1, dtype=np.int64)).sum()
                    )
                    % CHECKSUM_MOD
                )
                out["mean_r"].append(int(arr[0::3].sum()) / (tw * th))
            yield pd.DataFrame(out)

    images = synthesize_media(docs).filter(F.col("media_type") == "image")
    feats = images.select("media_id", "payload").mapInPandas(
        work,
        schema=(
            "media_id long, src_width int, src_height int,"
            " dst_width int, dst_height int,"
            " resized_sum_mod long, resized_weighted_mod long, mean_r double"
        ),
    )
    return feats.select(
        "media_id", "src_width", "src_height", "dst_width", "dst_height",
        "resized_sum_mod", "resized_weighted_mod",
        F.round("mean_r", 6).alias("mean_r"),
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


#: dHash geometry: 8×8 downsample, 7 column-adjacent comparisons per
#: row → 56 bits (stays inside a positive BIGINT on every engine)
DHASH_SIDE = 8
DHASH_BITS_PER_ROW = DHASH_SIDE - 1


def perceptual_dhash(raster: bytes, w: int, h: int) -> int:
    """Difference-hash of an RGB raster: nearest-resample to 8×8 gray,
    then one bit per adjacent-column comparison (gray[x+1] > gray[x]).

    Deterministic integer arithmetic end to end (the nearest gather is
    the exact ``(dst·src)//dst`` mapping, gray is the integer mean), so
    the hash is engine-replayable. Invariant to any monotone intensity
    transform and — the property the dedup query exercises — to the
    CODEC the image travelled through, as long as decode is faithful.
    """
    import numpy as np

    small = np.frombuffer(
        resize_nearest(raster, w, h, DHASH_SIDE, DHASH_SIDE), dtype=np.uint8
    ).reshape(DHASH_SIDE, DHASH_SIDE, 3)
    gray = small.astype(np.int64).sum(axis=2) // 3
    bits = gray[:, 1:] > gray[:, :-1]  # 8 rows × 7 comparisons
    weights = 1 << (
        np.arange(DHASH_SIDE * DHASH_BITS_PER_ROW, dtype=np.int64)
    )
    return int((bits.reshape(-1) * weights).sum())


def phash_dedup_stats(docs: DataFrame) -> DataFrame:
    """Cross-format perceptual dedup, end to end with an exact oracle.

    Per document, the SAME flat-block image is encoded twice — once as
    binary PPM, once as a real baseline JPEG (unit quantization, so its
    decode is bit-exact) — and both payloads go through the format-
    routing :func:`decode_image` and :func:`perceptual_dhash`. Re-
    encodings of one image MUST collapse into one hash group; documents
    whose flat-block layouts produce the same gradient signs merge too
    (dHash coarseness, replayed exactly by the oracle). Output: one row
    per (doc, format) with the hash, its group's canonical media_id
    (min) and the group size.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.jpeg import encode_jpeg

        ones = np.ones((8, 8), dtype=np.int64)
        for pdf in batches:
            out = {"media_id": [], "fmt": [], "dhash": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                bw, bh = mid % 4 + 2, mid % 3 + 2
                blocks = (
                    mid * PIX_A
                    + np.arange(bh * bw, dtype=np.int64).reshape(bh, bw)
                    * PIX_B
                ) % 256
                img = np.kron(
                    blocks, np.ones((8, 8), dtype=np.int64)
                ).astype(np.uint8)
                h_, w_ = img.shape
                ppm = (
                    f"P6\n{w_} {h_}\n255\n".encode()
                    + np.repeat(img.reshape(-1), 3).tobytes()
                )
                jpg = encode_jpeg(img, quant=ones)
                for fmt, payload in (("ppm", ppm), ("jpeg", jpg)):
                    dw, dh, raster = decode_image(payload)
                    if (dw, dh) != (w_, h_):
                        raise ValueError(f"{fmt} decode changed geometry")
                    out["media_id"].append(mid * 2 + (fmt == "jpeg"))
                    out["fmt"].append(fmt)
                    out["dhash"].append(
                        perceptual_dhash(raster, dw, dh)
                    )
            yield pd.DataFrame(out)

    hashes = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        work, schema="media_id long, fmt string, dhash long"
    )
    groups = hashes.groupBy("dhash").agg(
        F.min("media_id").alias("canonical_media_id"),
        F.count("*").cast("bigint").alias("group_size"),
    )
    return hashes.join(groups, "dhash").select(
        "media_id", "fmt", "dhash", "canonical_media_id", "group_size"
    )


#: audio fingerprint geometry: 16 equal frames → 15 energy-delta bits
AUDIO_FP_FRAMES = 16


def audio_fingerprint(samples) -> int:
    """Energy-delta fingerprint of an integer sample array: split into
    :data:`AUDIO_FP_FRAMES` equal frames (remainder dropped), one bit
    per adjacent-frame comparison (Σ|x| rising). Pure integer
    arithmetic; invariant under positive linear rescaling (bit-depth
    changes) and under any codec that reproduces the samples — the
    audio counterpart of :func:`perceptual_dhash`.
    """
    import numpy as np

    x = np.abs(np.asarray(samples, dtype=np.int64))
    frame = len(x) // AUDIO_FP_FRAMES
    if frame == 0:
        raise ValueError("too few samples for a fingerprint")
    e = x[: frame * AUDIO_FP_FRAMES].reshape(AUDIO_FP_FRAMES, frame).sum(axis=1)
    bits = e[1:] > e[:-1]
    weights = 1 << np.arange(AUDIO_FP_FRAMES - 1, dtype=np.int64)
    return int((bits * weights).sum())


def audio_fp_dedup_stats(docs: DataFrame) -> DataFrame:
    """Cross-codec audio dedup, end to end with an exact oracle.

    Per document the SAME block-constant signal (ADPCM-exact by
    construction, 8-bit-representable values) is encoded twice — as
    PCM8 WAV and as IMA ADPCM WAV — decoded through the fmt-routing
    :func:`decode_audio`, and fingerprinted. Re-encodings must collapse
    into one group; the oracle derives every fingerprint closed-form
    from the generator, cross-checking both audio decoders at once.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.adpcm import encode_ima_adpcm_wav

        spb = ADPCM_SAMPLES_PER_BLOCK
        for pdf in batches:
            out = {"media_id": [], "fmt": [], "audio_fp": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                n_blocks = mid % 3 + 5  # 85..119 samples: ≥ 16 frames
                vals = (
                    mid * PIX_A
                    + np.arange(n_blocks, dtype=np.int64) * PIX_B
                ) % 256
                sig = np.repeat(vals, spb)
                pcm8 = wav_header(len(sig)) + sig.astype(np.uint8).tobytes()
                adpcm = encode_ima_adpcm_wav(
                    sig.astype(np.int16),
                    AUDIO_SAMPLE_RATE,
                    block_align=ADPCM_BLOCK_ALIGN,
                )
                for fmt, payload, dtype in (
                    ("pcm8", pcm8, np.uint8),
                    ("adpcm", adpcm, np.int16),
                ):
                    rate, n, data = decode_audio(payload)
                    samples = np.frombuffer(data, dtype=dtype)
                    if n != len(sig):
                        raise ValueError(f"{fmt} decode changed length")
                    out["media_id"].append(mid * 2 + (fmt == "adpcm"))
                    out["fmt"].append(fmt)
                    out["audio_fp"].append(audio_fingerprint(samples))
            yield pd.DataFrame(out)

    fps = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        work, schema="media_id long, fmt string, audio_fp long"
    )
    groups = fps.groupBy("audio_fp").agg(
        F.min("media_id").alias("canonical_media_id"),
        F.count("*").cast("bigint").alias("group_size"),
    )
    return fps.join(groups, "audio_fp").select(
        "media_id", "fmt", "audio_fp", "canonical_media_id", "group_size"
    )
