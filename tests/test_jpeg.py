"""Baseline JPEG codec unit tests (pure Python — no SparkSession).

These pin the codec halves independently of the `ns_media_jpeg` oracle
query: table construction validity, zigzag interop order, roundtrip
bounds, restart resync, loud failure on corrupt/unsupported input, and
a golden-payload hash that freezes the encoder's wire output (so the
oracle query can't be green via compensating encoder+decoder drift).
"""

from __future__ import annotations

import hashlib
import heapq

import numpy as np
import pytest

from blinkit_etl_pipeline_spark.functions.jpeg import (
    MAX_CODE_LEN,
    UNZIGZAG,
    ZIGZAG,
    _package_merge_lengths,
    assign_codes,
    build_optimal_table,
    decode_jpeg,
    encode_jpeg,
    synthetic_quant_table,
)
from blinkit_etl_pipeline_spark.operators import multimodal

ONES = np.ones((8, 8), dtype=np.int64)


def _flat_block_image(mid: int, bw: int, bh: int) -> np.ndarray:
    blocks = (
        mid * multimodal.PIX_A
        + np.arange(bh * bw, dtype=np.int64).reshape(bh, bw) * multimodal.PIX_B
    ) % 256
    return np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


# ----------------------------------------------------------------------
# Tables / permutations
# ----------------------------------------------------------------------


def test_zigzag_is_the_t81_scan_order():
    # T.81 figure 5: first ten scan positions
    expected = [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    for pos, (r, c) in enumerate(expected):
        assert ZIGZAG[r, c] == pos
    # a true permutation, and UNZIGZAG is its inverse as a gather
    flat = ZIGZAG.reshape(64)
    assert sorted(flat) == list(range(64))
    assert (flat[UNZIGZAG] == np.arange(64)).all()


def test_package_merge_matches_unlimited_huffman_when_shallow():
    rng = np.random.RandomState(7)
    freqs = {s: int(f) for s, f in enumerate(rng.randint(1, 1000, size=40))}
    lengths = _package_merge_lengths(freqs, MAX_CODE_LEN)
    # unlimited Huffman via heapq
    heap = [(f, [s]) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth = dict.fromkeys(freqs, 0)
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    opt = sum(freqs[s] * depth[s] for s in freqs)
    got = sum(freqs[s] * lengths[s] for s in freqs)
    assert max(depth.values()) <= MAX_CODE_LEN  # premise: limit not binding
    assert got == opt


def test_package_merge_respects_length_limit():
    # Fibonacci weights force unbounded Huffman past 16 levels
    fib = [1, 1]
    while len(fib) < 24:
        fib.append(fib[-1] + fib[-2])
    freqs = {s: f for s, f in enumerate(fib)}
    lengths = _package_merge_lengths(freqs, MAX_CODE_LEN)
    assert max(lengths.values()) <= MAX_CODE_LEN
    assert sum(2.0 ** -l for l in lengths.values()) <= 1.0 + 1e-12


def test_optimal_table_is_valid_and_reserves_all_ones():
    rng = np.random.RandomState(3)
    freqs = {s: int(f) for s, f in enumerate(rng.randint(1, 500, size=100))}
    bits, huffval = build_optimal_table(freqs)
    assert len(bits) == 16 and sum(bits) == len(huffval) == len(freqs)
    codes = assign_codes(bits, huffval)
    # prefix-free: no code is a prefix of another
    as_bits = {
        s: format(c, f"0{l}b") for s, (c, l) in codes.items()
    }
    vals = sorted(as_bits.values())
    for a, b in zip(vals, vals[1:]):
        assert not b.startswith(a)
    # the all-ones codeword of the maximum used length is never assigned
    lmax = max(l for _, l in codes.values())
    assert all(
        not (l == lmax and c == (1 << l) - 1) for c, l in codes.values()
    )


# ----------------------------------------------------------------------
# Roundtrips
# ----------------------------------------------------------------------


@pytest.mark.parametrize("mid", [0, 5, 11, 12345])
def test_flat_block_grayscale_roundtrip_is_bit_exact(mid):
    img = _flat_block_image(mid, bw=mid % 4 + 2, bh=mid % 3 + 2)
    payload = encode_jpeg(img, quant=ONES, restart_interval_mcus=2)
    w, h, nc, raster = decode_jpeg(payload)
    assert (w, h, nc) == (img.shape[1], img.shape[0], 1)
    assert np.frombuffer(raster, dtype=np.uint8).reshape(h, w).tolist() == img.tolist()
    assert len(payload) < img.nbytes  # it actually compressed


def test_random_grayscale_roundtrip_bounded_error_and_odd_dims():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(19, 21)).astype(np.uint8)
    payload = encode_jpeg(img, quant=ONES)
    w, h, nc, raster = decode_jpeg(payload)
    assert (w, h, nc) == (21, 19, 1)  # padding cropped back off
    dec = np.frombuffer(raster, dtype=np.uint8).reshape(h, w).astype(int)
    # unit quantization: per-coefficient rounding error ≤ 0.5 → spatial
    # error well under the sum-of-basis bound; empirical max is ~2
    assert np.abs(dec - img.astype(int)).max() <= 4


def test_color_444_and_420_roundtrip_bounds():
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    rgb = np.stack(
        [(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    for sub, bound in (("444", 6), ("420", 10)):
        payload = encode_jpeg(rgb, quant=ONES, subsampling=sub)
        w, h, nc, raster = decode_jpeg(payload)
        assert (w, h, nc) == (40, 24, 3)
        dec = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).astype(int)
        err = np.abs(dec - rgb.astype(int)).max()
        assert err <= bound, (sub, err)


def test_default_quant_table_roundtrip_error_scales_with_strength():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)

    def roundtrip_err(q):
        payload = encode_jpeg(img, quant=q)
        w, h, _, raster = decode_jpeg(payload)
        dec = np.frombuffer(raster, dtype=np.uint8).reshape(h, w).astype(int)
        return np.abs(dec - img.astype(int)).mean()

    e1 = roundtrip_err(ONES)
    e2 = roundtrip_err(synthetic_quant_table(2))
    e8 = roundtrip_err(synthetic_quant_table(8))
    assert e1 <= e2 <= e8  # coarser tables, coarser pixels


def test_restart_markers_resync_and_equal_output():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    plain = encode_jpeg(img, quant=ONES)
    rst = encode_jpeg(img, quant=ONES, restart_interval_mcus=3)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI emitted
    assert any(bytes((0xFF, 0xD0 + i)) in rst for i in range(8))
    out_a = decode_jpeg(plain)
    out_b = decode_jpeg(rst)
    assert out_a == out_b


# ----------------------------------------------------------------------
# Loud failure + wire stability
# ----------------------------------------------------------------------


def test_decoder_rejects_bad_magic_truncation_and_progressive():
    img = _flat_block_image(3, 2, 2)
    payload = encode_jpeg(img, quant=ONES)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + payload[2:])
    with pytest.raises(Exception):
        decode_jpeg(payload[: len(payload) // 2])
    # flip SOF0 → SOF2 (progressive): must refuse, not mis-decode
    sof = payload.index(b"\xff\xc0")
    with pytest.raises(NotImplementedError):
        decode_jpeg(payload[:sof] + b"\xff\xc2" + payload[sof + 2 :])


def test_missing_restart_marker_is_detected():
    img = _flat_block_image(9, 3, 3)
    payload = encode_jpeg(img, quant=ONES, restart_interval_mcus=2)
    rst0 = payload.index(b"\xff\xd0")
    broken = payload[:rst0] + b"\xff\xd5" + payload[rst0 + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(broken)


def test_golden_payload_hash_pins_the_wire_format():
    """Freezes the encoder's exact output for a fixed input. If this
    changes, the `ns_media_jpeg` oracle's independence argument must be
    re-reviewed (encoder and decoder live in the same module)."""
    img = _flat_block_image(7, bw=3, bh=2)
    payload = encode_jpeg(img, quant=ONES, restart_interval_mcus=2)
    assert hashlib.sha256(payload).hexdigest() == GOLDEN_SHA256


GOLDEN_SHA256 = "a791795a057b2058496bab8ac6f566791351a48a9f4bfe29949754c6bac54e9e"


def test_decode_image_routes_jpeg_and_replicates_gray_to_rgb():
    img = _flat_block_image(5, 2, 2)
    payload = encode_jpeg(img, quant=ONES)
    w, h, raster = multimodal.decode_image(payload)
    assert (w, h) == (16, 16)
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    assert (arr[:, :, 0] == img).all()
    assert (arr[:, :, 0] == arr[:, :, 1]).all()
    assert (arr[:, :, 1] == arr[:, :, 2]).all()


# ----------------------------------------------------------------------
# Property + fuzz hardening (pure Python, no Spark)
# ----------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_bounded_error_property(w, h, seed):
    """ANY geometry (including non-multiples of 8 and 1-pixel edges)
    roundtrips with unit quantization within the DCT rounding bound."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    payload = encode_jpeg(img, quant=ONES)
    dw, dh, nc, raster = decode_jpeg(payload)
    assert (dw, dh, nc) == (w, h, 1)
    dec = np.frombuffer(raster, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 4


@settings(max_examples=40, deadline=None)
@given(
    pos=st.integers(2, 10_000),
    flip=st.integers(1, 255),
    seed=st.integers(0, 1000),
)
def test_jpeg_decoder_never_hangs_or_crashes_on_corruption(pos, flip, seed):
    """Single-byte corruption anywhere must yield either a clean decode
    (the bit happened not to matter / decoded differently) or a raised
    Exception — never a hang, segfault, or non-Exception failure."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    payload = bytearray(encode_jpeg(img, quant=ONES))
    p = pos % (len(payload) - 2) + 1
    payload[p] ^= flip
    try:
        decode_jpeg(bytes(payload))
    except Exception:
        pass  # loud failure is a correct outcome


@settings(max_examples=40, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    flip=st.integers(1, 255),
)
def test_container_parsers_survive_corruption(pos, flip):
    """AVI and ADPCM parsers: corrupt bytes raise or parse, never
    crash the interpreter or loop forever."""
    from blinkit_etl_pipeline_spark.functions.adpcm import (
        decode_ima_adpcm_wav,
        encode_ima_adpcm_wav,
    )
    from blinkit_etl_pipeline_spark.functions.video import (
        encode_mjpeg_avi,
        parse_avi,
    )

    frame = np.full((8, 8), 33, dtype=np.uint8)
    avi = bytearray(encode_mjpeg_avi([frame, frame], us_per_frame=100_000,
                                     quant=ONES))
    p = pos % (len(avi) - 1)
    avi[p] ^= flip
    try:
        parse_avi(bytes(avi))
    except Exception:
        pass

    sig = np.repeat(np.array([100, -100], dtype=np.int16), 17)
    wav = bytearray(encode_ima_adpcm_wav(sig, 8000, block_align=12))
    p = pos % (len(wav) - 1)
    wav[p] ^= flip
    try:
        decode_ima_adpcm_wav(bytes(wav))
    except Exception:
        pass


def test_decoder_accepts_t81_fill_bytes_between_segments():
    """Markers may be preceded by 0xFF fill bytes (T.81 B.1.1.2):
    padding inserted before DQT/SOF/SOS must not change the decode."""
    img = _flat_block_image(4, 2, 2)
    payload = encode_jpeg(img, quant=ONES)
    ref = decode_jpeg(payload)
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xda"):
        i = payload.index(marker)
        padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
        assert decode_jpeg(padded) == ref, marker
