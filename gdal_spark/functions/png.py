"""Deterministic pure-stdlib PNG codec for tile-byte oracles.

The reference's named tile-render oracle family asserts CHECKSUMS OF THE
EMITTED PNG TILES (autotest/pyscripts/test_gdal2tiles.py:101-148 —
``expected_cs`` per band of e.g. ``0/0/0.png``).  This module closes that
gap without an image library: an 8-bit grayscale PNG writer built from the
PNG 1.2 spec with fully pinned choices so the byte stream is deterministic —

* filter type 0 (None) on every scanline,
* one IDAT chunk, zlib level 9, default strategy,
* no ancillary chunks.

``decode_png_gray8`` is the independent structural check used by tests:
parse chunks, verify CRCs, inflate, un-filter, reshape.  The raw (pre-zlib)
scanline stream's crc32 is also exposed: unlike the compressed bytes it is
byte-defined by the PNG spec alone, independent of the zlib build.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def quantize_u8(arr: np.ndarray) -> np.ndarray:
    """float → uint8 with the engine's stable rounding (floor(x+0.5)),
    clamped to [0, 255] — deterministic across numpy builds."""
    return np.clip(np.floor(np.asarray(arr, dtype=np.float64) + 0.5),
                   0, 255).astype(np.uint8)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
    )


def raw_scanlines_gray8(img: np.ndarray) -> bytes:
    """Filter-0 scanline stream (1 filter byte + row bytes per row) — the
    spec-defined pre-compression byte stream."""
    h, _w = img.shape
    return b"".join(b"\x00" + img[y].tobytes() for y in range(h))


def encode_png_gray8(img: np.ndarray) -> bytes:
    """8-bit grayscale PNG bytes of a (h, w) uint8 array."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(raw_scanlines_gray8(img), 9)
    return (
        PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png_gray8(data: bytes) -> np.ndarray:
    """Structural inverse of encode_png_gray8 (filter-0 grayscale only);
    verifies signature and every chunk CRC."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if binascii.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    out = np.empty((h, w), dtype=np.uint8)
    stride = w + 1
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        if row[0] != 0:
            raise ValueError("only filter 0 supported")
        out[y] = np.frombuffer(row[1:], dtype=np.uint8)
    return out


def raw_crc32_gray8(img: np.ndarray) -> int:
    """crc32 of the spec-defined filter-0 scanline stream — independent of
    the zlib compressor build (unlike the IDAT bytes)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    return binascii.crc32(raw_scanlines_gray8(img)) & 0xFFFFFFFF
