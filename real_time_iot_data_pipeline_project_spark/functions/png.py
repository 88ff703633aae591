"""Minimal pure-stdlib PNG codec (RFC 2083) — the real-decode path for
the multimodal tier in an environment with no image libraries.

Supports the common web subset: 8-bit greyscale (color type 0),
truecolor RGB (2), and RGBA (6); all five scanline filters on decode;
non-interlaced only. This is deliberately NOT a general image library —
it exists so ``operators.multimodal.extract_features`` can exercise a
genuine decode → pixel-statistics path (and be oracle-tested against
encode round-trips) without optional dependencies. On a cluster with
real codecs, swap the per-payload decoder; the Spark plumbing
(mapInPandas signature, Arrow batching, output schema) is identical.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, ``channels`` bytes per
    pixel) as a non-interlaced PNG using filter 0 on every scanline."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"expected {width * height * ch} pixel bytes, got {len(pixels)}")
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` — pixels are
    raw 8-bit bytes, row-major, unfiltered. Raises ``ValueError`` on ANY
    malformed payload: non-PNG, unsupported variants (palette, 16-bit,
    Adam7), and corrupt data. A truncated chunk header (struct.error) or
    a broken deflate stream (zlib.error) is normalized to ValueError so
    callers need exactly one except clause — at corpus scale a poison
    payload must surface as a recordable error, never a task-killing
    exception type the caller didn't anticipate. MemoryError is
    deliberately NOT normalized: a valid-but-huge image under executor
    memory pressure is a resource failure that warrants task retry, not
    a 'corrupt data' audit entry."""
    try:
        return _decode_png_impl(data)
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt PNG: {type(e).__name__}: {e}") from e


def _decode_png_impl(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, width, height, color_type, idat = 8, 0, 0, 0, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or color_type not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant: depth={depth} "
                    f"color_type={color_type} interlace={interlace}")
            if width < 1 or height < 1:
                raise ValueError(
                    f"corrupt PNG: degenerate dimensions {width}x{height}")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt PNG: scanline payload size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"corrupt PNG: unknown filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)
