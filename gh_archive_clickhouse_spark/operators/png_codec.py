"""Minimal pure-stdlib PNG codec (zlib + struct) — the in-container
"real decode" path for the multimodal operators.

The container ships no media libraries, but PNG's format is simple
enough that a correct 8-bit decoder/encoder needs only ``zlib``: this
gives the multimodal surface a GENUINE bytes→pixels→bytes kernel to
run under Spark (operators/multimodal.py tries Pillow first and falls
back here for ``image/png``), instead of a declared stub.

Scope (raises ``NotImplementedError`` outside it): 8-bit depth, color
types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), no interlace — the
overwhelmingly common subset. All five scanline filters (None, Sub,
Up, Average, Paeth) are decoded; the encoder emits filter 0 rows.

Decode returns a numpy ``uint8`` array of shape (height, width,
channels); encode accepts the same.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array (height, width, channels)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    width = height = color_type = None
    while pos + 8 <= len(data):
        (length,), ctype = (
            struct.unpack(">I", data[pos : pos + 4]),
            data[pos + 4 : pos + 8],
        )
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + 4  # chunk + CRC
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt, interlace
             ) = struct.unpack(">IIBBBBB", chunk)
            if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG (bit_depth={bit_depth}, "
                    f"color_type={color_type}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 pixel array (height, width, channels) → PNG bytes
    (filter-0 scanlines, one zlib-compressed IDAT)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3:
        raise ValueError("expected uint8 array of shape (h, w, ch)")
    height, width, ch = pixels.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    raw = b"".join(
        b"\x00" + pixels[y].tobytes() for y in range(height)
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[ch], 0, 0, 0
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
