"""Pure-stdlib GIF decoder (GIF87a/89a, LZW).

The reference pipeline treats media as opaque objects in object
storage; this engine's north-star multimodal surface decodes them
natively inside Arrow-batched stages (`operators/multimodal.py`). GIF
completes the lossless-image formats next to PPM and PNG: a real
variable-width LZW decompressor (dictionary growth, width bumps at
2^width, CLEAR/EOI handling, deferred-clear tolerant), sub-block
reassembly, global/local color tables, and interlace (four-pass)
reordering.

Scope (honest): decodes the FIRST image frame to RGB via its palette.
Graphic-control/comment/application extensions are skipped per spec
framing; animation composition (frame disposal blending) is out of
scope — frame 1 of an animated GIF decodes fine.

Like the PNG path, the oracle-checked query feeds this decoder
JVM-synthesized valid containers whose pixels follow a closed-form
generator, so every statistic has an independent DuckDB replay.
"""

from __future__ import annotations

import struct

GIF_HEADERS = (b"GIF87a", b"GIF89a")

#: interlace pass layout: (first row, row step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifError(ValueError):
    """Malformed GIF container or LZW stream."""


def lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    """GIF-flavor LZW: variable-width codes starting at
    ``min_code_size + 1`` bits, LSB-first bit packing, dictionary grown
    by one entry per decoded code, width bump when the next free slot
    reaches ``2^width`` (capped at 12 bits — further codes reuse the
    full dictionary, per spec), CLEAR resets, EOI terminates.

    ``max_pixels`` bounds output so a corrupt stream cannot balloon
    memory (decompression-bomb guard — the caller knows width×height).
    """
    if not 2 <= min_code_size <= 8:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear_code = 1 << min_code_size
    eoi_code = clear_code + 1

    # dictionary as parallel arrays: prefix link + last byte, so an
    # entry append is O(1) and entry expansion walks the chain
    prefix = [-1] * 4096
    suffix = bytearray(4096)
    for i in range(clear_code):
        suffix[i] = i

    def reset():
        return clear_code + 2, min_code_size + 1

    next_code, width = reset()
    out = bytearray()
    prev = -1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    entry = bytearray()
    while True:
        while nbits < width:
            if pos >= n:
                raise GifError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear_code:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi_code:
            break
        if prev < 0:
            # first code after (re)start must be a literal
            if code >= clear_code:
                raise GifError(f"non-literal first code {code}")
            out.append(code)
            prev = code
            continue
        if code > next_code or code == next_code == 4096:
            raise GifError(f"LZW code {code} beyond dictionary {next_code}")
        # expand `code` (or the KwKwK case: prev + first byte of prev)
        entry.clear()
        c = prev if code == next_code else code
        while c >= 0:
            entry.append(suffix[c])
            c = prefix[c]
        entry.reverse()
        first = entry[0]
        if code == next_code:
            entry.append(first)
        out += entry
        if len(out) > max_pixels:
            raise GifError("LZW output exceeds declared raster size")
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            # late width bump, capped at 12 bits (GIF spec)
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return bytes(out)


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks; returns (data, newpos)
    with ``newpos`` past the 0x00 terminator."""
    parts = []
    while True:
        if pos >= len(buf):
            raise GifError("truncated sub-block chain")
        ln = buf[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > len(buf):
            raise GifError("sub-block overruns payload")
        parts.append(buf[pos : pos + ln])
        pos += ln


def _deinterlace(idx: bytes, width: int, height: int) -> bytes:
    rows = [b""] * height
    src = 0
    for first, step in _INTERLACE_PASSES:
        for r in range(first, height, step):
            rows[r] = idx[src : src + width]
            src += width
    return b"".join(rows)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame → ``(width, height, rgb_raster)``.

    Walks header → logical screen descriptor → global color table →
    extension blocks (skipped per framing) → first image descriptor
    (local palette wins when present; interlaced rasters reordered) →
    LZW-decompress → palette-map to 3-byte RGB.
    """
    if len(payload) < 13 or payload[:6] not in GIF_HEADERS:
        raise GifError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated global color table")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise GifError("no image descriptor before EOF")
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            raise GifError("trailer before any image data")
        if intro == 0x21:  # extension: label byte + sub-blocks
            if pos >= len(payload):
                raise GifError("truncated extension")
            pos += 1
            _, pos = _read_subblocks(payload, pos)
            continue
        if intro != 0x2C:
            raise GifError(f"unexpected block introducer 0x{intro:02x}")
        break
    if pos + 9 > len(payload):
        raise GifError("truncated image descriptor")
    _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    # uint16 fields can't be negative; zero is the only invalid value
    # (real-world GIFs DO declare frames beyond the logical screen, so
    # that is tolerated — the max_pixels LZW guard bounds memory)
    if w == 0 or h == 0:
        raise GifError(f"bad image dimensions {w}x{h}")
    pal = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated local color table")
        pal = payload[pos : pos + 3 * n]
        pos += 3 * n
    if pal is None:
        raise GifError("no color table (neither global nor local)")
    if pos >= len(payload):
        raise GifError("missing LZW minimum code size")
    min_code_size = payload[pos]
    pos += 1
    data, pos = _read_subblocks(payload, pos)
    idx = lzw_decode(min_code_size, data, max_pixels=w * h)
    if len(idx) != w * h:
        raise GifError(f"decoded {len(idx)} pixels, expected {w * h}")
    if ipacked & 0x40:
        idx = _deinterlace(idx, w, h)
    n_colors = len(pal) // 3
    if max(idx) >= n_colors:
        raise GifError("pixel index beyond palette")
    # palette map via one translation pass (256-entry table → fast)
    table = [pal[3 * i : 3 * i + 3] for i in range(n_colors)]
    raster = b"".join(table[i] for i in idx)
    return w, h, raster
