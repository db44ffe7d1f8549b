"""Motion-JPEG video in an AVI container, pure stdlib + numpy.

Retires the video branch of the multimodal codec stub for the one
video format this environment can genuinely handle end to end: MJPEG
(every frame an independent baseline JPEG, carried in a RIFF/AVI
container). General codecs (H.264/VP9/AV1) remain environment-limited
(ffmpeg); the *pipeline* shape — parse container metadata cheaply,
plan which frames to decode, decode only those — is identical.

- **Encoder** (`encode_mjpeg_avi`): valid RIFF/AVI with `hdrl`
  (avih + one `vids`/`MJPG` stream with strh/strf), a `movi` LIST of
  `00dc` frame chunks (each a real JPEG from
  :mod:`blinkit_etl_pipeline_spark.functions.jpeg`), and an `idx1`
  index. Chunks are word-aligned per the RIFF spec.
- **Parser** (`parse_avi`): LIST-aware RIFF walk (same chunk
  discipline as the WAV decoder, plus recursion into LISTs) returning
  stream geometry (width, height, µs/frame, frame count) and the
  frame chunk payloads WITHOUT decoding them.
- **Sampler** (`sample_frames_mjpeg`): timestamp-driven frame
  selection — computes the frame index for each sample instant from
  container metadata and entropy-decodes ONLY the selected frames.
  That plan-then-decode split is the 100 TB shape: at scale the
  metadata parse is a cheap scan-side operation and decode cost is
  proportional to *sampled* frames, not stored frames.

Scale note: frames are independent JPEGs, so frame decode parallelizes
trivially inside Arrow batches and across partitions; no inter-frame
state exists (the property that makes MJPEG the standard 'easy case'
for distributed video processing).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(
    frames: list[np.ndarray],
    us_per_frame: int,
    *,
    quant: np.ndarray | None = None,
) -> bytes:
    """Encode grayscale/RGB uint8 frames as an MJPEG AVI.

    All frames must share one geometry. ``us_per_frame`` is the frame
    interval in microseconds (avih dwMicroSecPerFrame; also expressed
    as strh rate/scale = 1e6/us_per_frame).
    """
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one geometry")
    payloads = [encode_jpeg(f, quant=quant) for f in frames]

    avih = struct.pack(
        "<14I",
        us_per_frame,
        0,  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        max(len(p) for p in payloads),
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            1,  # dwScale
            max(round(1_000_000 / us_per_frame), 1),  # dwRate
            0,  # start
            len(frames),
            max(len(p) for p in payloads),
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (varies per frame)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets are measured from the 'movi' fourcc position
        idx_entries.append((len(movi_body), len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)
            for off, size in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi(payload: bytes) -> dict:
    """Parse an AVI container WITHOUT decoding frames.

    Returns {width, height, us_per_frame, n_frames, frames:[bytes]}.
    Validating: bad magic, missing headers, or a frame count that
    disagrees with the movi chunk list raise rather than guessing.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    avih = None
    frames: list[bytes] = []

    def walk(data: bytes) -> None:
        nonlocal avih
        pos = 0
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])  # skip the list type fourcc, recurse
            elif cid == b"avih":
                avih = struct.unpack("<14I", body[:56])
            elif cid[2:4] in (b"dc", b"db"):  # compressed/uncompressed frame
                frames.append(body)
            pos += 8 + size + (size % 2)  # word alignment

    walk(payload[12:])
    if avih is None:
        raise ValueError("AVI missing avih header")
    us_per_frame, n_frames, w, h = avih[0], avih[4], avih[8], avih[9]
    if len(frames) != n_frames:
        raise ValueError(
            f"avih declares {n_frames} frames but movi holds {len(frames)}"
        )
    return {
        "width": w,
        "height": h,
        "us_per_frame": us_per_frame,
        "n_frames": n_frames,
        "frames": frames,
    }


def sample_frames_mjpeg(
    payload: bytes, every_ms: int
) -> list[tuple[int, int, int, int, bytes]]:
    """Sample frames at ``0, every_ms, 2·every_ms, …`` < duration.

    Returns [(frame_index, frame_ts_ms, width, height, raster), …]
    where raster is the DECODED grayscale/RGB bytes of that frame.
    Only the selected frames are entropy-decoded (plan-then-decode).
    """
    meta = parse_avi(payload)
    # exact integer arithmetic in microseconds: float ms-per-frame
    # could round a boundary instant to frame n_frames (IndexError) or
    # to the wrong adjacent frame
    us_per_frame = meta["us_per_frame"]
    duration_us = meta["n_frames"] * us_per_frame
    out = []
    t = 0
    while t * 1000 < duration_us:
        fi = (t * 1000) // us_per_frame
        w, h, _nc, raster = decode_jpeg(meta["frames"][fi])
        out.append((fi, t, w, h, raster))
        t += every_ms
    return out
