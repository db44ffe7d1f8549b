"""Real PPM decode: parser robustness + end-to-end pixel stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.operators import multimodal

from conftest import SF_SMOKE

RASTER = bytes(range(24))  # 4x2 RGB


def test_decode_ppm_header_variants():
    for header in (
        b"P6\n4 2\n255\n",
        b"P6 # trailing comment\n# full-line comment\n 4  2 \n255\n",
        b"P6\t4\n2\r255\n",
    ):
        w, h, raster = multimodal.decode_ppm(header + RASTER)
        assert (w, h, raster) == (4, 2, RASTER)


def test_decode_ppm_rejects_bad_payloads():
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5\n4 2\n255\n" + RASTER)  # wrong magic
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 2\n65535\n" + RASTER)  # 16-bit maxval
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 2\n255\n" + RASTER[:-1])  # truncated
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG....")  # non-PPM needs PIL


def test_synthesized_ppm_roundtrips_through_decoder(spark):
    """The JVM-side PPM builder and the Python decoder must agree on
    every byte: parsed dims == metadata dims, means == formula."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    media = multimodal.synthesize_media(docs)
    rows = (
        multimodal.media_features(media)
        .filter(F.col("media_type") == "image")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["parsed_width"] == r["width"]
        assert r["parsed_height"] == r["height"]
        mid, w, h = r["media_id"], r["width"], r["height"]
        npx = w * h
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            expect = (
                sum(
                    (mid * multimodal.PIX_A + (p * 3 + ch) * multimodal.PIX_B) % 256
                    for p in range(npx)
                )
                / npx
            )
            assert abs(r[col] - expect) < 1e-6, (mid, col)


def test_decode_wav_parses_real_riff_structure():
    """Chunk-walking: unknown chunks skipped, odd sizes word-aligned,
    fmt validated, data extracted."""
    import struct

    pcm = bytes(range(100))
    # non-canonical layout: a LIST chunk (odd-sized, padded) before fmt
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 5 + 1 + 8 + 16 + 8 + len(pcm)) + b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rate, n, data = multimodal.decode_wav(payload)
    assert (rate, n, data) == (8000, 100, pcm)


def test_decode_wav_rejects_bad_payloads():
    import struct

    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFX....WAVE")  # wrong container magic
    stereo = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 16000, 2, 8)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        multimodal.decode_wav(stereo)  # stereo unsupported
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x04...")  # mp3 needs ffmpeg


def test_synthesized_wav_roundtrips_through_decoder(spark):
    """JVM-side WAV builder and the Python RIFF parser must agree:
    parsed rate/count == constants, mean amplitude == formula."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    media = multimodal.synthesize_media(docs)
    rows = (
        multimodal.media_features(media)
        .filter(F.col("media_type") == "audio")
        .collect()
    )
    assert rows
    n = multimodal.AUDIO_N_SAMPLES
    for r in rows:
        assert r["parsed_sample_rate"] == multimodal.AUDIO_SAMPLE_RATE
        assert r["parsed_n_samples"] == n
        mid = r["media_id"]
        expect = (
            sum((mid * multimodal.PIX_A + i * multimodal.PIX_B) % 256 for i in range(n))
            / n
        )
        assert abs(r["mean_amplitude"] - expect) < 1e-6, mid


def _encode_png(width, height, raster, filters):
    """Reference PNG encoder for decoder tests: real zlib compression
    (unlike the stored-block Spark synthesis) and an arbitrary filter
    type per scanline, so Average/Paeth get exercised."""
    import binascii
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = 3 * width
    prev = bytes(stride)
    raw = bytearray()
    for r in range(height):
        row = raster[r * stride : (r + 1) * stride]
        f = filters[r % len(filters)]
        raw.append(f)
        for j in range(stride):
            a = row[j - 3] if j >= 3 else 0
            b = prev[j]
            c = prev[j - 3] if j >= 3 else 0
            if f == 0:
                d = row[j]
            elif f == 1:
                d = (row[j] - a) % 256
            elif f == 2:
                d = (row[j] - b) % 256
            elif f == 3:
                d = (row[j] - (a + b) // 2) % 256
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                d = (row[j] - pred) % 256
            raw.append(d)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        multimodal.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filter_types_roundtrip():
    """decode_png must reverse every PNG filter type — None, Sub, Up,
    Average, AND Paeth — on real zlib-compressed containers."""
    import random

    rng = random.Random(42)
    w, h = 11, 10
    raster = bytes(rng.randrange(256) for _ in range(3 * w * h))
    # each filter alone, then a mix cycling through all five
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = _encode_png(w, h, raster, filters)
        pw, ph, got = multimodal.decode_png(payload)
        assert (pw, ph) == (w, h)
        assert got == raster, f"filters={filters}"


def test_decode_png_rejects_corruption():
    import pytest

    payload = bytearray(_encode_png(4, 4, bytes(range(48)), [4]))
    # flip one raster-affecting byte inside IDAT → chunk CRC mismatch
    idat_pos = payload.find(b"IDAT")
    payload[idat_pos + 8] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        multimodal.decode_png(bytes(payload))
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"\x89PNX" + bytes(12))
    # JPEG magic now routes to the native decoder, which must fail
    # loudly on a garbage body; truly exotic formats stay stubbed
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"II*\x00 fake tiff")


def test_synthesized_png_is_valid_and_exact(spark):
    """The JVM-built containers must be VALID PNGs (CRC32 + adler32
    verified by the decoder) whose decoded raster equals the pixel
    generator — across None/Sub/Up filtered scanlines."""
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 7, 44, 191)], "doc_id bigint"
    )
    for r in multimodal.synthesize_png_media(docs).collect():
        mid = r["media_id"]
        w, h, raster = multimodal.decode_png(bytes(r["payload"]))
        assert (w, h) == (mid % 16 + 8, mid % 12 + 8)
        expect = bytes(
            (mid * multimodal.PIX_A + i * multimodal.PIX_B) % 256
            for i in range(3 * w * h)
        )
        assert raster == expect, mid


# ----------------------------------------------------------------------
# MJPEG / AVI container
# ----------------------------------------------------------------------


def test_avi_container_roundtrips_and_validates():
    import numpy as np

    from blinkit_etl_pipeline_spark.functions.video import (
        encode_mjpeg_avi,
        parse_avi,
        sample_frames_mjpeg,
    )

    ones = np.ones((8, 8), dtype=np.int64)
    rng = np.random.RandomState(11)
    flat = [
        np.kron(
            rng.randint(0, 256, size=(2, 3)), np.ones((8, 8), dtype=np.int64)
        ).astype(np.uint8)
        for _ in range(5)
    ]
    payload = encode_mjpeg_avi(flat, us_per_frame=200_000, quant=ones)
    meta = parse_avi(payload)
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["n_frames"] == 5 and meta["us_per_frame"] == 200_000
    # every stored frame is an independently decodable, exact JPEG
    from blinkit_etl_pipeline_spark.functions.jpeg import decode_jpeg

    for f, p in zip(flat, meta["frames"]):
        w, h, nc, raster = decode_jpeg(p)
        assert (w, h, nc) == (24, 16, 1)
        assert np.frombuffer(raster, dtype=np.uint8).reshape(16, 24).tolist() == f.tolist()
    # 5 frames × 200 ms = 1000 ms; 300 ms sampling → ts 0/300/600/900
    picks = sample_frames_mjpeg(payload, every_ms=300)
    assert [fi for fi, *_ in picks] == [0, 1, 3, 4]
    assert [ts for _fi, ts, *_ in picks] == [0, 300, 600, 900]
    for fi, _ts, w, h, raster in picks:
        assert np.frombuffer(raster, dtype=np.uint8).reshape(16, 24).tolist() == flat[fi].tolist()


def test_avi_parser_rejects_bad_payloads():
    import numpy as np
    import pytest as _pytest

    from blinkit_etl_pipeline_spark.functions.video import (
        encode_mjpeg_avi,
        parse_avi,
    )

    frame = np.zeros((8, 8), dtype=np.uint8)
    payload = encode_mjpeg_avi([frame, frame], us_per_frame=100_000)
    with _pytest.raises(ValueError):
        parse_avi(b"RIFX" + payload[4:])
    # corrupt the declared frame count in avih (offset: find 'avih')
    i = payload.index(b"avih") + 8 + 16  # dwTotalFrames field
    bad = payload[:i] + (99).to_bytes(4, "little") + payload[i + 4 :]
    with _pytest.raises(ValueError):
        parse_avi(bad)


def test_sample_frames_routes_avi_and_stubs_other_codecs():
    import numpy as np
    import pytest as _pytest

    from blinkit_etl_pipeline_spark.functions.video import encode_mjpeg_avi

    frame = np.full((8, 8), 77, dtype=np.uint8)
    payload = encode_mjpeg_avi(
        [frame], us_per_frame=1_000_000,
        quant=np.ones((8, 8), dtype=np.int64),
    )
    # one 1000 ms frame sampled at 500 ms → picked at ts 0 and ts 500
    rasters = multimodal.sample_frames(payload, every_ms=500)
    assert len(rasters) == 2
    assert set(rasters[0]) == {77} and rasters[0] == rasters[1]
    with _pytest.raises(NotImplementedError):
        multimodal.sample_frames(b"\x00\x00\x00\x20ftypisom", every_ms=500)


# ----------------------------------------------------------------------
# IMA ADPCM compressed audio
# ----------------------------------------------------------------------


def test_adpcm_block_constant_roundtrip_is_bit_exact():
    import numpy as np

    from blinkit_etl_pipeline_spark.functions.adpcm import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )

    spb = multimodal.ADPCM_SAMPLES_PER_BLOCK
    vals = np.array([100, -5000, 16320, 0, -32768], dtype=np.int16)
    sig = np.repeat(vals, spb)
    payload = encode_ima_adpcm_wav(
        sig, 8000, block_align=multimodal.ADPCM_BLOCK_ALIGN
    )
    rate, n, dec = decode_ima_adpcm_wav(payload)
    assert (rate, n) == (8000, len(sig))
    assert (dec == sig).all()
    # genuinely compressed: 4-bit nibbles + headers ≪ 16-bit PCM
    assert len(payload) < sig.nbytes


def test_adpcm_tracks_a_sine_within_adaptive_step_error():
    import numpy as np

    from blinkit_etl_pipeline_spark.functions.adpcm import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )

    t = np.arange(4000)
    sig = (8000 * np.sin(t / 25)).astype(np.int16)
    payload = encode_ima_adpcm_wav(sig, 16000)
    rate, n, dec = decode_ima_adpcm_wav(payload)
    assert (rate, n) == (16000, 4000)
    err = np.abs(dec.astype(int) - sig.astype(int))
    # steady-state tracking: small mean error; transients bounded by
    # the max step size
    assert err.mean() < 100 and err.max() < 33000
    assert len(payload) < 0.3 * sig.nbytes  # ~4:1 with block headers


def test_adpcm_decoder_validates_and_trims_via_fact():
    import numpy as np
    import pytest as _pytest

    from blinkit_etl_pipeline_spark.functions.adpcm import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )

    sig = (300 * np.sin(np.arange(100) / 3)).astype(np.int16)
    payload = encode_ima_adpcm_wav(sig, 8000, block_align=16)
    rate, n, dec = decode_ima_adpcm_wav(payload)
    assert n == 100 and len(dec) == 100  # padding trimmed via fact
    with _pytest.raises(ValueError):
        decode_ima_adpcm_wav(b"RIFX" + payload[4:])
    # truncated data chunk: no longer a whole number of blocks
    i = payload.index(b"data")
    bad = payload[: i + 4] + (7).to_bytes(4, "little") + payload[i + 8 : i + 15]
    with _pytest.raises(ValueError):
        decode_ima_adpcm_wav(bad)


def test_decode_audio_routes_pcm_and_adpcm():
    import numpy as np
    import pytest as _pytest

    from blinkit_etl_pipeline_spark.functions.adpcm import (
        encode_ima_adpcm_wav,
    )

    sig = np.repeat(
        np.array([1000], dtype=np.int16), multimodal.ADPCM_SAMPLES_PER_BLOCK
    )
    payload = encode_ima_adpcm_wav(
        sig, 8000, block_align=multimodal.ADPCM_BLOCK_ALIGN
    )
    rate, n, raw = multimodal.decode_audio(payload)
    assert (rate, n) == (8000, len(sig))
    assert np.frombuffer(raw, dtype=np.int16).tolist() == sig.tolist()
    # PCM8 still routes through the PCM decoder
    pcm = multimodal.wav_header(4) + bytes((1, 2, 3, 4))
    assert multimodal.decode_audio(pcm) == (8000, 4, bytes((1, 2, 3, 4)))
    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x04...mp3ish")


def test_resize_nearest_gathers_expected_pixels():
    import numpy as np

    # 4x2 RGB with distinct per-pixel values
    src = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = multimodal.resize_nearest(src.tobytes(), 4, 2, 2, 1)
    arr = np.frombuffer(out, dtype=np.uint8).reshape(1, 2, 3)
    # iy = [0]; ix = [0, 2] under (dst*src)//dst_dim mapping
    assert arr[0, 0].tolist() == src[0, 0].tolist()
    assert arr[0, 1].tolist() == src[0, 2].tolist()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.resize_nearest(src.tobytes(), 4, 2, 0, 1)


def test_perceptual_dhash_invariances():
    """dHash must be invariant to monotone intensity shifts and to the
    codec an image travelled through (PPM vs unit-quant JPEG of the
    same raster), and must differ for a genuinely different image."""
    import numpy as np

    from blinkit_etl_pipeline_spark.functions.jpeg import encode_jpeg

    rng = np.random.RandomState(5)
    gray = rng.randint(0, 200, size=(24, 32)).astype(np.uint8)
    rgb = np.repeat(gray.reshape(-1), 3).tobytes()
    h0 = multimodal.perceptual_dhash(rgb, 32, 24)

    # +20 brightness (no clipping: values < 200) → same gradients
    shifted = np.repeat((gray + 20).reshape(-1), 3).tobytes()
    assert multimodal.perceptual_dhash(shifted, 32, 24) == h0

    # flat-block image through two codecs → identical hash
    blocks = rng.randint(0, 256, size=(2, 3))
    img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    ppm = b"P6\n24 16\n255\n" + np.repeat(img.reshape(-1), 3).tobytes()
    jpg = encode_jpeg(img, quant=np.ones((8, 8), dtype=np.int64))
    wp, hp, rp = multimodal.decode_image(ppm)
    wj, hj, rj = multimodal.decode_image(jpg)
    assert multimodal.perceptual_dhash(rp, wp, hp) == multimodal.perceptual_dhash(rj, wj, hj)

    # a different image hashes differently (not a constant function)
    other = np.repeat(gray.T.copy().reshape(-1), 3).tobytes()
    assert multimodal.perceptual_dhash(other, 24, 32) != h0


def test_sample_frames_exact_integer_boundaries():
    """Frame selection is exact integer µs arithmetic: the final sample
    before the duration boundary picks the last frame, the boundary
    instant itself is excluded, and awkward frame intervals never
    overflow into an IndexError."""
    import numpy as np

    from blinkit_etl_pipeline_spark.functions.video import (
        encode_mjpeg_avi,
        sample_frames_mjpeg,
    )

    ones = np.ones((8, 8), dtype=np.int64)
    frames = [np.full((8, 8), 10 * i, dtype=np.uint8) for i in range(4)]
    payload = encode_mjpeg_avi(frames, us_per_frame=250_000, quant=ones)
    picks = sample_frames_mjpeg(payload, every_ms=250)
    assert [fi for fi, *_ in picks] == [0, 1, 2, 3]  # t=1000ms excluded
    # prime-ish interval: 333333 µs/frame, 3 frames ≈ 999999 µs
    p2 = encode_mjpeg_avi(frames[:3], us_per_frame=333_333, quant=ones)
    picks2 = sample_frames_mjpeg(p2, every_ms=333)
    assert [fi for fi, *_ in picks2][-1] == 2 and len(picks2) == 4


# ----------------------------------------------------------------------
# GIF / LZW
# ----------------------------------------------------------------------


def _lzw_encode(min_code_size, indices):
    """Real compressing GIF-LZW encoder (test-side reference): greedy
    longest-match dictionary, variable-width codes with the width bump
    AFTER emitting the boundary code (giflib semantics), CLEAR on full
    dictionary. Exercises decoder paths the byte-aligned synthesizer
    never reaches (9..12-bit codes, KwKwK, dict-full resets)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1
    next_code = eoi + 1

    def emit(code):
        nonlocal acc, nbits, width
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # post-write check: affects the NEXT code (giflib pairing)
        if next_code >= (1 << width) and width < 12:
            width += 1

    table = {bytes([i]): i for i in range(clear)}
    emit(clear)
    cur = b""
    for sym in indices:
        nxt = cur + bytes([sym])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        else:
            table[nxt] = next_code
            next_code += 1
        cur = bytes([sym])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _encode_gif(width, height, indices, palette, *, interlaced=False,
                local_palette=False, min_code_size=None):
    """Full test-side GIF encoder: compressing LZW, optional interlace
    (rows emitted in four-pass order), global or local palette."""
    import struct as _s

    from blinkit_etl_pipeline_spark.functions import gif as G

    n_colors = len(palette) // 3
    depth = max(2, (n_colors - 1).bit_length())
    if min_code_size is None:
        min_code_size = depth
    if interlaced:
        rows = [indices[r * width : (r + 1) * width] for r in range(height)]
        order = []
        for first, step in G._INTERLACE_PASSES:
            order.extend(range(first, height, step))
        indices = b"".join(rows[r] for r in order)
    pal = palette + b"\x00" * (3 * ((1 << depth) - n_colors))
    buf = bytearray(b"GIF89a")
    packed = (0 if local_palette else 0x80) | 0x70 | (depth - 1)
    buf += _s.pack("<HHBBB", width, height, packed, 0, 0)
    if not local_palette:
        buf += pal
    # a skippable extension before the image (exercises block walking)
    buf += b"\x21\xfe" + _subblocks(b"test comment")
    ipacked = (0x80 if local_palette else 0) | (0x40 if interlaced else 0) | (
        (depth - 1) if local_palette else 0
    )
    buf += b"\x2c" + _s.pack("<HHHHB", 0, 0, width, height, ipacked)
    if local_palette:
        buf += pal
    buf.append(min_code_size)
    buf += _subblocks(_lzw_encode(min_code_size, indices))
    buf.append(0x3B)
    return bytes(buf)


def test_gif_lzw_real_compression_roundtrips():
    """lzw_decode must invert a genuinely compressing encoder across
    code widths 3..12 — including KwKwK sequences and a dictionary
    driven past the 9/10/11-bit boundaries by a redundant stream."""
    import random

    from blinkit_etl_pipeline_spark.functions.gif import lzw_decode

    rng = random.Random(7)
    for mcs in (2, 4, 7, 8):
        # highly redundant → deep dictionary chains and width growth;
        # alphabet bounded by the code size's literal range
        motif = bytes(rng.randrange(1 << min(mcs, 4)) for _ in range(40))
        stream = (motif * 300)[:9000]
        data = _lzw_encode(mcs, stream)
        assert len(data) < len(stream)  # it actually compressed
        assert lzw_decode(mcs, data, max_pixels=len(stream)) == stream
    # KwKwK: aaa… emits cScSc patterns immediately
    runs = b"\x00" * 500 + b"\x01" * 500 + b"\x00\x01\x00\x01" * 250
    for mcs in (2, 7):
        data = _lzw_encode(mcs, runs)
        assert lzw_decode(mcs, data, max_pixels=len(runs)) == runs


def test_decode_gif_interlaced_local_palette_and_extensions():
    import random

    from blinkit_etl_pipeline_spark.functions.gif import decode_gif

    rng = random.Random(13)
    w, h = 17, 11
    n_colors = 32
    palette = bytes(rng.randrange(256) for _ in range(3 * n_colors))
    indices = bytes(rng.randrange(n_colors) for _ in range(w * h))
    for interlaced in (False, True):
        for local in (False, True):
            payload = _encode_gif(
                w, h, indices, palette, interlaced=interlaced,
                local_palette=local,
            )
            pw, ph, raster = decode_gif(payload)
            assert (pw, ph) == (w, h)
            expect = b"".join(
                palette[3 * i : 3 * i + 3] for i in indices
            )
            assert raster == expect, (interlaced, local)


def test_decode_gif_rejects_corruption():
    import pytest

    from blinkit_etl_pipeline_spark.functions.gif import GifError, decode_gif

    palette = bytes(range(48))  # 16 colors
    payload = _encode_gif(4, 4, bytes(range(16)), palette)
    assert decode_gif(payload)[0] == 4
    with pytest.raises(GifError, match="not a GIF"):
        decode_gif(b"JIF89a" + payload[6:])
    with pytest.raises(GifError):
        decode_gif(payload[:20])  # truncated mid-structure
    # truncate inside the LZW sub-blocks → missing EOI / overrun
    with pytest.raises(GifError):
        decode_gif(payload[:-6])
    # corrupt the image descriptor's declared width (13-byte header +
    # 48-byte padded global palette + 16-byte comment extension → the
    # 0x2C block at 77; width field at +5) → pixel-count mismatch
    bad = bytearray(payload)
    assert bad[77] == 0x2C
    bad[82] ^= 0x01
    with pytest.raises(GifError):
        decode_gif(bytes(bad))


def test_decode_gif_corruption_fuzz_never_hangs_or_miscrashes():
    """Arbitrary single-byte corruption anywhere in a valid GIF must
    either still decode cleanly or raise GifError — never a foreign
    exception, hang, or memory balloon (the max_pixels guard)."""
    import random

    from blinkit_etl_pipeline_spark.functions.gif import GifError, decode_gif

    rng = random.Random(99)
    palette = bytes(rng.randrange(256) for _ in range(3 * 64))
    indices = bytes(rng.randrange(64) for _ in range(23 * 19))
    payload = _encode_gif(23, 19, indices, palette)
    for _ in range(300):
        bad = bytearray(payload)
        bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            w, h, raster = decode_gif(bytes(bad))
            assert len(raster) == 3 * w * h
        except GifError:
            pass  # loud, typed failure is the contract


def test_synthesized_gif_is_valid_and_exact(spark):
    """The JVM-built containers must be VALID GIFs whose decoded
    raster equals palette(pixel generator)."""
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 7, 44, 191)], "doc_id bigint"
    )
    for r in multimodal.synthesize_gif_media(docs).collect():
        mid = r["media_id"]
        w, h, raster = multimodal.decode_gif(bytes(r["payload"]))
        assert (w, h) == (mid % 16 + 8, mid % 12 + 8)
        expect = bytearray()
        for i in range(w * h):
            j = (mid * multimodal.PIX_A + i * multimodal.PIX_B) % 128
            expect += bytes(((2 * j) % 256, (3 * j) % 256, (5 * j + 7) % 256))
        assert raster == bytes(expect), mid


def test_gif_lzw_dictionary_full_reset_roundtrips():
    """Drive the dictionary to the 4096-entry cap so the encoder emits
    a mid-stream CLEAR and the decoder resets widths 9→10→11→12 and
    back — the deepest LZW path, untouched by shorter streams."""
    import random

    from blinkit_etl_pipeline_spark.functions.gif import lzw_decode

    rng = random.Random(21)
    stream = bytes(rng.randrange(256) for _ in range(30_000))
    data = _lzw_encode(8, stream)
    assert lzw_decode(8, data, max_pixels=len(stream)) == stream
    # low-entropy variant: long runs reach the cap with fewer symbols
    runs = b"".join(bytes([i % 7]) * 40 for i in range(1200))
    data = _lzw_encode(2, bytes(b % 4 for b in runs))
    dec = lzw_decode(2, data, max_pixels=len(runs))
    assert dec == bytes(b % 4 for b in runs)
