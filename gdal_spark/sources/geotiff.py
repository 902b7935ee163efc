"""GeoTIFF raster driver — pure-numpy codec over the public TIFF 6.0 and
OGC GeoTIFF 1.1 (19-008r4) specifications.

Reference semantics: ``frmts/gtiff/`` (gt_overview/geotiff.cpp tag I/O,
gt_citation GeoKey handling).  No GDAL/libtiff code — the byte layout is
re-derived from the published specs:

* Classic little-endian TIFF: ``II 2A 00`` header, single IFD of ascending
  tags, out-of-line values appended after the IFD.
* Sample types: Int32 (BitsPerSample 32 / SampleFormat 2) and Float64
  (64 / 3) — both roundtrip BIT-EXACTLY (the gate contract).
* Storage: strips (RowsPerStrip + StripOffsets/ByteCounts) or tiles
  (TileWidth/TileLength multiples of 16 per spec §15, edge tiles padded to
  the full tile size); Compression 1 (none) or 8 (zlib DEFLATE — the
  Adobe/zlib code GDAL writes by default for DEFLATE).
* Georeferencing: ModelPixelScaleTag (33550) + ModelTiepointTag (33922)
  raster→model transform, GeoKeyDirectoryTag (34735) with
  GTModelTypeGeoKey=2 (geographic), GTRasterTypeGeoKey=1 (PixelIsArea),
  GeographicTypeGeoKey=4326 — the exact key set gdal writes for EPSG:4326.

Spark mapping — a GeoTIFF is a single-file unit in the reference too; the
distributed contract is file-level parallelism exactly like the vector
drivers: one .tif per partition (block of raster rows) on write via
``applyInPandas``, one task per file on read via ``binaryFile`` bytes +
vectorized ``np.frombuffer`` decode.  Tiled files additionally support
WINDOW-PRUNED reads: the reader seeks TileOffsets and inflates ONLY the
tiles intersecting the query window (the COG access pattern — at 100 TB
a dashboard window touches a handful of tiles, never the whole raster).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# TIFF tag ids (TIFF 6.0 §8; GeoTIFF 1.1 §7.1)
_T_SUBFILE = 254  # NewSubfileType: 1 = reduced-resolution (overview) page
_T_WIDTH, _T_LENGTH, _T_BPS, _T_COMP, _T_PHOTO = 256, 257, 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = 273, 277, 278, 279
_T_PLANAR = 284
_T_TILE_W, _T_TILE_L, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_PREDICTOR = 317
_T_SAMPLE_FMT = 339
_T_PIXEL_SCALE, _T_TIEPOINT, _T_GEOKEYS = 33550, 33922, 34735

# Compression tag values (TIFF 6.0 §7/§9/§14 + Adobe DEFLATE note)
_COMP_CODES = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, ClearCode
    256 / EOI 257, EARLY code-width change (widths bump when NextCode hits
    511/1023/2047), table reset at 4094.  Re-derived from the spec's
    pseudo-code — no libtiff."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nacc = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, nacc
        acc = (acc << nbits) | code
        nacc += nbits
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    nbits = 9
    emit(CLEAR, nbits)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for b in raw:
        ch = bytes([b])
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], nbits)
        table[wc] = next_code
        next_code += 1
        if next_code in (511, 1023, 2047):
            nbits += 1
        elif next_code == 4094:
            emit(CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code, nbits = 258, 9
        w = ch
    if w:
        emit(table[w], nbits)
        next_code += 1
        if next_code in (511, 1023, 2047):
            nbits += 1
    emit(EOI, nbits)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """Inverse of ``_lzw_encode`` — decoder switches width one entry
    earlier (510/1022/2046), per the spec's early-change convention."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    total_bits = len(data) * 8
    bitpos, nbits = 0, 9
    table: list[bytes] = []
    prev = b""
    while bitpos + nbits <= total_bits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits, prev = 9, b""
            continue
        if not table:
            raise ValueError("lzw: data does not start with ClearCode")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"lzw: bad code {code}")
        if prev:
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) in (510, 1022, 2046):
            nbits += 1
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9): runs of 2+ equal bytes as (257-n, byte),
    literals as (n-1, bytes)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and raw[j] == raw[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(raw[i])
            i = j
            continue
        j = i + 1
        while (j < n and j - i < 128
               and not (j + 1 < n and raw[j] == raw[j + 1])):
            j += 1
        out.append(j - i - 1)
        out += raw[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop, per spec
    return bytes(out)


def _predict2(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing (Predictor=2, TIFF 6.0 §14) — integer
    samples only; modulo arithmetic in the sample width."""
    out = block.copy()
    out[:, 1:] -= block[:, :-1]
    return out


def _unpredict2(block: np.ndarray) -> np.ndarray:
    return np.cumsum(block.astype(block.dtype), axis=1,
                     dtype=block.dtype)

_TY_SHORT, _TY_LONG, _TY_DOUBLE = 3, 4, 12

_DTYPES = {
    # (BitsPerSample, SampleFormat) -> numpy dtype (little-endian)
    (32, 2): np.dtype("<i4"),
    (64, 3): np.dtype("<f8"),
}


def _geokey_directory(epsg: int = 4326) -> np.ndarray:
    """GeoKeyDirectory short array: version header + the 3-key set GDAL
    writes for a geographic CRS (GeoTIFF 1.1 §7.1.1)."""
    keys = [
        (1024, 0, 1, 2),      # GTModelTypeGeoKey: 2 = geographic
        (1025, 0, 1, 1),      # GTRasterTypeGeoKey: 1 = PixelIsArea
        (2048, 0, 1, epsg),   # GeographicTypeGeoKey
    ]
    head = [1, 1, 0, len(keys)]
    return np.asarray(
        head + [v for k in keys for v in k], dtype="<u2")


def write_geotiff_bytes(
    arr: np.ndarray,
    origin: tuple[float, float],
    res: tuple[float, float],
    epsg: int = 4326,
    tiled: bool = False,
    tile_size: int = 32,
    deflate: bool = False,
    rows_per_strip: int = 16,
    compression: str | None = None,
    predictor: int = 1,
) -> bytes:
    """Serialize a 2-D int32/float64 array as a classic little-endian
    GeoTIFF.  ``origin`` = model (X, Y) of the raster's top-left CORNER
    (PixelIsArea); ``res`` = (xres, yres) with yres positive (north-up,
    Y decreases down rows) — the ModelTiepoint/PixelScale contract.
    ``compression``: none / deflate / lzw / packbits (``deflate=True`` is
    the legacy spelling); Predictor=2 = horizontal differencing."""
    page = dict(
        arr=arr, origin=origin, res=res, epsg=epsg, tiled=tiled,
        tile_size=tile_size, deflate=deflate, rows_per_strip=rows_per_strip,
        predictor=predictor,
    )
    if compression is not None:
        page["compression"] = compression
    return write_geotiff_pages([page])


def _compress_block(block: np.ndarray, compression: str,
                    predictor: int) -> bytes:
    if predictor == 2:
        if not np.issubdtype(block.dtype, np.integer):
            raise ValueError("Predictor=2 requires integer samples")
        block = _predict2(block)
    elif predictor != 1:
        raise ValueError(f"unsupported predictor {predictor}")
    raw = block.astype(block.dtype.newbyteorder("<")).tobytes()
    if compression == "deflate":
        return zlib.compress(raw, 6)
    if compression == "lzw":
        return _lzw_encode(raw)
    if compression == "packbits":
        return _packbits_encode(raw)
    return raw


def _page_blocks(arr: np.ndarray, tiled: bool, tile_size: int,
                 compression: str, rows_per_strip: int,
                 predictor: int = 1) -> list[bytes]:
    h, w = arr.shape
    blocks: list[bytes] = []
    if tiled:
        if tile_size % 16:
            raise ValueError("TileWidth/TileLength must be multiples of 16")
        tx = (w + tile_size - 1) // tile_size
        ty = (h + tile_size - 1) // tile_size
        for j in range(ty):
            for i in range(tx):
                tile = np.zeros((tile_size, tile_size), dtype=arr.dtype)
                part = arr[j * tile_size:(j + 1) * tile_size,
                           i * tile_size:(i + 1) * tile_size]
                tile[:part.shape[0], :part.shape[1]] = part
                blocks.append(_compress_block(tile, compression, predictor))
    else:
        for y0 in range(0, h, rows_per_strip):
            blocks.append(_compress_block(
                arr[y0:y0 + rows_per_strip], compression, predictor))
    return blocks


def _page_entries(page: dict, offsets: list[int], counts: list[int],
                  overview: bool) -> list[tuple[int, int, int, object]]:
    """IFD tag table for one page (ascending ids, TIFF 6.0 §2).  Overview
    pages carry NewSubfileType=1 (reduced-resolution, per the COG layout)
    and no geo tags — georeference lives on IFD0 only, as GDAL writes."""
    arr = page["arr"]
    if arr.dtype == np.int32:
        bps, sfmt = 32, 2
    elif arr.dtype == np.float64:
        bps, sfmt = 64, 3
    else:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    h, w = arr.shape
    entries: list[tuple[int, int, int, object]] = [
        (_T_WIDTH, _TY_LONG, 1, w),
        (_T_LENGTH, _TY_LONG, 1, h),
        (_T_BPS, _TY_SHORT, 1, bps),
        (_T_COMP, _TY_SHORT, 1, _COMP_CODES[page["compression"]]),
        (_T_PHOTO, _TY_SHORT, 1, 1),
        (_T_SPP, _TY_SHORT, 1, 1),
        (_T_PLANAR, _TY_SHORT, 1, 1),
        (_T_SAMPLE_FMT, _TY_SHORT, 1, sfmt),
    ]
    if page.get("predictor", 1) == 2:
        entries.append((_T_PREDICTOR, _TY_SHORT, 1, 2))
    if overview:
        entries.append((_T_SUBFILE, _TY_LONG, 1, 1))
    else:
        geokeys = _geokey_directory(page["epsg"])
        res = page["res"]
        origin = page["origin"]
        scale = np.asarray([res[0], res[1], 0.0], dtype="<f8")
        tiepoint = np.asarray(
            [0.0, 0.0, 0.0, origin[0], origin[1], 0.0], dtype="<f8")
        entries += [
            (_T_PIXEL_SCALE, _TY_DOUBLE, 3, scale.tobytes()),
            (_T_TIEPOINT, _TY_DOUBLE, 6, tiepoint.tobytes()),
            (_T_GEOKEYS, _TY_SHORT, geokeys.size, geokeys.tobytes()),
        ]
    off_arr = np.asarray(offsets, dtype="<u4")
    cnt_arr = np.asarray(counts, dtype="<u4")
    if page["tiled"]:
        entries += [
            (_T_TILE_W, _TY_LONG, 1, page["tile_size"]),
            (_T_TILE_L, _TY_LONG, 1, page["tile_size"]),
            (_T_TILE_OFF, _TY_LONG, len(offsets), off_arr.tobytes()),
            (_T_TILE_CNT, _TY_LONG, len(offsets), cnt_arr.tobytes()),
        ]
    else:
        entries += [
            (_T_STRIP_OFF, _TY_LONG, len(offsets), off_arr.tobytes()),
            (_T_RPS, _TY_LONG, 1, page["rows_per_strip"]),
            (_T_STRIP_CNT, _TY_LONG, len(offsets), cnt_arr.tobytes()),
        ]
    entries.sort(key=lambda e: e[0])
    return entries


def _encode_ifd(entries: list, ifd_offset: int, next_ifd: int) -> bytes:
    """One IFD + its out-of-line values; values >4 bytes go right after
    the IFD (offsets absolute)."""
    n_tags = len(entries)
    overflow_base = ifd_offset + 2 + 12 * n_tags + 4
    ifd = struct.pack("<H", n_tags)
    overflow = b""
    for tag, ty, count, val in entries:
        if isinstance(val, bytes):
            if len(val) <= 4:
                ifd += struct.pack("<HHI", tag, ty, count) + val.ljust(4, b"\0")
            else:
                ifd += struct.pack(
                    "<HHII", tag, ty, count, overflow_base + len(overflow))
                overflow += val
        elif ty == _TY_SHORT:
            ifd += struct.pack("<HHIHH", tag, ty, count, int(val), 0)
        else:
            ifd += struct.pack("<HHII", tag, ty, count, int(val))
    ifd += struct.pack("<I", next_ifd)
    return ifd + overflow


def write_geotiff_pages(pages: list[dict]) -> bytes:
    """Multi-IFD writer: page 0 = full resolution (georeferenced), pages
    1..n = reduced-resolution overviews (NewSubfileType=1) chained via the
    next-IFD pointer — the COG internal-overview layout."""
    for p in pages:
        p.setdefault("tiled", False)
        p.setdefault("tile_size", 32)
        p.setdefault("deflate", False)
        p.setdefault("compression",
                     "deflate" if p["deflate"] else "none")
        p.setdefault("predictor", 1)
        p.setdefault("rows_per_strip", 16)
        p.setdefault("epsg", 4326)
    all_blocks: list[list[bytes]] = [
        _page_blocks(p["arr"], p["tiled"], p["tile_size"],
                     p["compression"], p["rows_per_strip"],
                     p["predictor"])
        for p in pages
    ]
    pos = 8
    page_offsets: list[tuple[list[int], list[int]]] = []
    for blocks in all_blocks:
        offs, cnts = [], []
        for b in blocks:
            offs.append(pos)
            cnts.append(len(b))
            pos += len(b)
        page_offsets.append((offs, cnts))

    # lay out the IFD chain after the data; sizes are deterministic so the
    # next-IFD pointers can be computed up front
    entry_sets = [
        _page_entries(p, offs, cnts, overview=(k > 0))
        for k, (p, (offs, cnts)) in enumerate(zip(pages, page_offsets))
    ]

    def _ifd_size(entries: list) -> int:
        body = 2 + 12 * len(entries) + 4
        extra = sum(
            len(v) for _, _, _, v in entries
            if isinstance(v, bytes) and len(v) > 4)
        return body + extra

    ifd_offsets = []
    cur = pos
    for es in entry_sets:
        ifd_offsets.append(cur)
        cur += _ifd_size(es)
    ifds = b"".join(
        _encode_ifd(
            es, ifd_offsets[k],
            ifd_offsets[k + 1] if k + 1 < len(entry_sets) else 0)
        for k, es in enumerate(entry_sets)
    )
    data = b"".join(b for blocks in all_blocks for b in blocks)
    return struct.pack("<2sHI", b"II", 42, ifd_offsets[0]) + data + ifds


class GeoTIFF:
    """Parsed single-band GeoTIFF page: tag dict + lazy block decode.
    ``page`` selects an IFD from the chain (0 = full resolution,
    1.. = internal overviews in the COG layout); ``n_pages`` reports the
    chain length."""

    def __init__(self, buf: bytes, page: int = 0):
        self.buf = buf
        order, magic = struct.unpack_from("<2sH", buf, 0)
        if order not in (b"II", b"MM") or (
                magic != 42 and not (order == b"MM" and magic == 10752)):
            raise ValueError("not a classic TIFF")
        self.end = "<" if order == b"II" else ">"
        (ifd_off,) = struct.unpack_from(self.end + "I", buf, 4)
        chain = []
        while ifd_off:
            chain.append(ifd_off)
            (n,) = struct.unpack_from(self.end + "H", buf, ifd_off)
            (ifd_off,) = struct.unpack_from(
                self.end + "I", buf, ifd_off + 2 + 12 * n)
        self.n_pages = len(chain)
        ifd_off = chain[page]
        (n_tags,) = struct.unpack_from(self.end + "H", buf, ifd_off)
        self.tags: dict[int, np.ndarray] = {}
        ty_dtype = {3: "u2", 4: "u4", 12: "f8", 2: "u1", 1: "u1"}
        for k in range(n_tags):
            tag, ty, count = struct.unpack_from(
                self.end + "HHI", buf, ifd_off + 2 + 12 * k)
            if ty not in ty_dtype:
                continue
            dt = np.dtype(self.end + ty_dtype[ty])
            nbytes = dt.itemsize * count
            voff = ifd_off + 2 + 12 * k + 8
            if nbytes > 4:
                (voff,) = struct.unpack_from(self.end + "I", buf, voff)
            self.tags[tag] = np.frombuffer(buf, dt, count, voff)

        self.width = int(self.tags[_T_WIDTH][0])
        self.height = int(self.tags[_T_LENGTH][0])
        self.compression = int(self.tags.get(_T_COMP, [1])[0])
        self.predictor = int(self.tags.get(_T_PREDICTOR, [1])[0])
        bps = int(self.tags[_T_BPS][0])
        sfmt = int(self.tags.get(_T_SAMPLE_FMT, [1])[0])
        self.dtype = _DTYPES[(bps, sfmt)]
        self.tiled = _T_TILE_OFF in self.tags
        self.is_overview = int(self.tags.get(_T_SUBFILE, [0])[0]) == 1
        # geotransform (GDALGetGeoTransform layout): north-up from
        # tiepoint(0,0)->model + pixel scale; overview pages carry none
        if _T_PIXEL_SCALE in self.tags:
            scale = self.tags[_T_PIXEL_SCALE]
            tie = self.tags[_T_TIEPOINT]
            self.geotransform = (
                float(tie[3]), float(scale[0]), 0.0,
                float(tie[4]), 0.0, -float(scale[1]),
            )
        else:
            self.geotransform = None
        self.epsg = None
        gk = self.tags.get(_T_GEOKEYS)
        if gk is not None:
            for k in range(int(gk[3])):
                kid, loc, cnt, val = gk[4 + 4 * k: 8 + 4 * k]
                if kid == 2048 and loc == 0:
                    self.epsg = int(val)

    def _block(self, idx: int, off_tag: int, cnt_tag: int,
               shape: tuple[int, int]) -> np.ndarray:
        off = int(self.tags[off_tag][idx])
        cnt = int(self.tags[cnt_tag][idx])
        raw = self.buf[off:off + cnt]
        if self.compression == 8:
            raw = zlib.decompress(raw)
        elif self.compression == 5:
            raw = _lzw_decode(raw)
        elif self.compression == 32773:
            raw = _packbits_decode(raw)
        elif self.compression != 1:
            raise ValueError(f"unsupported compression {self.compression}")
        block = np.frombuffer(raw, self.dtype).reshape(shape)
        if self.predictor == 2:
            block = _unpredict2(block)
        return block

    def read_array(self) -> np.ndarray:
        """Decode the full raster."""
        if self.tiled:
            ts = int(self.tags[_T_TILE_W][0])
            tx = (self.width + ts - 1) // ts
            ty = (self.height + ts - 1) // ts
            out = np.zeros((ty * ts, tx * ts), dtype=self.dtype)
            for j in range(ty):
                for i in range(tx):
                    out[j * ts:(j + 1) * ts, i * ts:(i + 1) * ts] = \
                        self._block(j * tx + i, _T_TILE_OFF, _T_TILE_CNT,
                                    (ts, ts))
            return out[:self.height, :self.width]
        rps = int(self.tags[_T_RPS][0])
        rows = [
            self._block(
                s, _T_STRIP_OFF, _T_STRIP_CNT,
                (min(rps, self.height - s * rps), self.width))
            for s in range(len(self.tags[_T_STRIP_OFF]))
        ]
        return np.vstack(rows)

    def read_window(self, x0: int, y0: int, x1: int, y1: int
                    ) -> tuple[np.ndarray, int]:
        """Decode ONLY the tiles intersecting pixel window
        [x0, x1) × [y0, y1); returns (window array, tiles decoded) — the
        COG pruned-read contract.  Striped files fall back to pruning at
        strip granularity."""
        if not self.tiled:
            rps = int(self.tags[_T_RPS][0])
            s0, s1 = y0 // rps, (y1 - 1) // rps + 1
            rows = [
                self._block(
                    s, _T_STRIP_OFF, _T_STRIP_CNT,
                    (min(rps, self.height - s * rps), self.width))
                for s in range(s0, s1)
            ]
            full = np.vstack(rows)
            return (full[y0 - s0 * rps:y1 - s0 * rps, x0:x1], s1 - s0)
        ts = int(self.tags[_T_TILE_W][0])
        tx = (self.width + ts - 1) // ts
        i0, i1 = x0 // ts, (x1 - 1) // ts + 1
        j0, j1 = y0 // ts, (y1 - 1) // ts + 1
        out = np.zeros(((j1 - j0) * ts, (i1 - i0) * ts), dtype=self.dtype)
        n = 0
        for j in range(j0, j1):
            for i in range(i0, i1):
                out[(j - j0) * ts:(j - j0 + 1) * ts,
                    (i - i0) * ts:(i - i0 + 1) * ts] = \
                    self._block(j * tx + i, _T_TILE_OFF, _T_TILE_CNT,
                                (ts, ts))
                n += 1
        return (out[y0 - j0 * ts:y1 - j0 * ts,
                    x0 - i0 * ts:x1 - i0 * ts], n)


# ---------------------------------------------------------------------------
# Spark-level sink / source
# ---------------------------------------------------------------------------


def write_cell_geotiffs(
    cells: DataFrame,
    directory: str,
    width: int,
    height: int,
    block_rows: int,
    origin: tuple[float, float] = (10.0, 50.0),
    res: float = 1.0 / 1024.0,
    dtype: str = "int32",
    tiled: bool = False,
    tile_size: int = 32,
    deflate: bool = False,
    compression: str | None = None,
    predictor: int = 1,
) -> int:
    """Distributed GeoTIFF sink over a (gx, gy, val) cell table: one .tif
    per horizontal block of ``block_rows`` raster rows (groupBy block key →
    applyInPandas — map-side after one shuffle on the block id, exactly the
    shapefile/gpkg per-partition contract).  Each file is a standalone
    north-up GeoTIFF whose tiepoint encodes the block's model-space origin,
    so readers recover GLOBAL pixel coordinates from the geotransform
    alone.  ``res`` defaults to a dyadic 1/1024 deg so origin arithmetic
    is float-exact on both engines.  Returns files written."""
    import os

    os.makedirs(directory, exist_ok=True)
    np_dtype = np.int32 if dtype == "int32" else np.float64
    keyed = cells.withColumn(
        "_blk", (F.col("gy") / F.lit(block_rows)).cast("long"))

    def build(key, pdf):
        blk = int(key[0])
        y0 = blk * block_rows
        h = min(block_rows, height - y0)
        arr = np.zeros((h, width), dtype=np_dtype)
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64) - y0
        arr[gy, gx] = pdf["val"].to_numpy().astype(np_dtype)
        buf = write_geotiff_bytes(
            arr, (origin[0], origin[1] - y0 * res), (res, res),
            tiled=tiled, tile_size=tile_size, deflate=deflate,
            compression=compression, predictor=predictor)
        final = f"{directory}/block-{blk:05d}.tif"
        with open(final, "wb") as fh:
            fh.write(buf)
        return pd.DataFrame({"path": [final], "n_pixels": [len(pdf)]})

    manifest = keyed.groupBy("_blk").applyInPandas(
        build, "path string, n_pixels long")
    return manifest.count()


def read_geotiffs(
    spark: SparkSession,
    directory: str,
    origin: tuple[float, float] = (10.0, 50.0),
    res: float = 1.0 / 1024.0,
) -> DataFrame:
    """Distributed GeoTIFF scan: binaryFile bytes → numpy IFD/strip decode
    → (gx, gy, val, epsg) pixels with GLOBAL pixel coordinates recovered
    from each file's geotransform (one task per file)."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.tif") \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                tif = GeoTIFF(bytes(buf))
                arr = tif.read_array()
                gt = tif.geotransform
                x_off = int(round((gt[0] - origin[0]) / res))
                y_off = int(round((origin[1] - gt[3]) / res))
                yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
                yield pd.DataFrame({
                    "gx": (xx + x_off).ravel().astype(np.int64),
                    "gy": (yy + y_off).ravel().astype(np.int64),
                    "val": arr.ravel().astype(np.float64),
                    "epsg": np.full(arr.size, tif.epsg, dtype=np.int64),
                })

    return files.mapInPandas(
        parse, "gx long, gy long, val double, epsg long")


def read_geotiff_window(
    spark: SparkSession,
    path: str,
    x0: int, y0: int, x1: int, y1: int,
) -> DataFrame:
    """Window-pruned scan of one tiled GeoTIFF: decode ONLY intersecting
    tiles (TileOffsets seek), surface the decoded-tile count so a gate can
    pin the pruning (n_tiles = exactly the ceil-range product, never the
    whole file)."""
    files = spark.read.format("binaryFile").load(path) \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                tif = GeoTIFF(bytes(buf))
                win, n_tiles = tif.read_window(x0, y0, x1, y1)
                n_total = len(tif.tags[_T_TILE_OFF]) if tif.tiled \
                    else len(tif.tags[_T_STRIP_OFF])
                yy, xx = np.mgrid[y0:y1, x0:x1]
                yield pd.DataFrame({
                    "gx": xx.ravel().astype(np.int64),
                    "gy": yy.ravel().astype(np.int64),
                    "val": win.ravel().astype(np.float64),
                    "n_tiles_decoded": np.full(
                        win.size, n_tiles, dtype=np.int64),
                    "n_tiles_total": np.full(
                        win.size, n_total, dtype=np.int64),
                })

    return files.mapInPandas(
        parse,
        "gx long, gy long, val double, "
        "n_tiles_decoded long, n_tiles_total long")


# ---------------------------------------------------------------------------
# COG internal overviews
# ---------------------------------------------------------------------------


def build_overviews(arr: np.ndarray, levels: int) -> list[np.ndarray]:
    """2×2 'average' decimation chain (even dims; float64).  Integer base
    values make every level a dyadic rational, so iterated averaging is
    float-EXACT and equals the direct 2^L-block mean — the same invariant
    the overview-pyramid gate relies on."""
    out = []
    cur = arr.astype(np.float64)
    for _ in range(levels):
        cur = (
            (cur[0::2, 0::2] + cur[0::2, 1::2])
            + cur[1::2, 0::2] + cur[1::2, 1::2]
        ) / 4.0
        out.append(cur)
    return out


def write_cog_bytes(
    arr: np.ndarray,
    origin: tuple[float, float],
    res: tuple[float, float],
    levels: int = 2,
    tile_size: int = 32,
    deflate: bool = True,
) -> bytes:
    """Cloud-optimized layout: tiled full-resolution IFD0 + chained tiled
    reduced-resolution overview IFDs (NewSubfileType=1)."""
    pages = [dict(arr=arr, origin=origin, res=res, tiled=True,
                  tile_size=tile_size, deflate=deflate)]
    for ov in build_overviews(arr, levels):
        pages.append(dict(arr=ov, origin=origin, res=res, tiled=True,
                          tile_size=tile_size, deflate=deflate))
    return write_geotiff_pages(pages)


def read_cog_levels(spark: SparkSession, path: str) -> DataFrame:
    """Scan EVERY page of a COG (full res + internal overviews) →
    (level, gx, gy, val) pixels; one task per file, pages walked via the
    next-IFD chain.  An overview consumer at scale reads ONLY the level it
    needs — this gate-facing reader surfaces all of them so correctness
    can pin the whole pyramid."""
    files = spark.read.format("binaryFile").load(path) \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                b = bytes(buf)
                n_pages = GeoTIFF(b).n_pages
                for lvl in range(n_pages):
                    t = GeoTIFF(b, page=lvl)
                    arr = t.read_array()
                    yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
                    yield pd.DataFrame({
                        "level": np.full(arr.size, lvl, dtype=np.int64),
                        "gx": xx.ravel().astype(np.int64),
                        "gy": yy.ravel().astype(np.int64),
                        "val": arr.ravel().astype(np.float64),
                    })

    return files.mapInPandas(
        parse, "level long, gx long, gy long, val double")


def write_cell_cog(
    cells: DataFrame,
    directory: str,
    width: int,
    height: int,
    block_rows: int,
    levels: int = 2,
    origin: tuple[float, float] = (10.0, 50.0),
    res: float = 1.0 / 1024.0,
    tile_size: int = 32,
) -> int:
    """Distributed COG sink: one cloud-optimized .tif per row-block, each
    carrying its own internal overview chain (exactly how COG generation
    distributes at scale — overviews are block-local, no cross-file
    dependency).  ``block_rows`` must be divisible by 2^levels."""
    import os

    if block_rows % (1 << levels):
        raise ValueError("block_rows must be divisible by 2^levels")
    os.makedirs(directory, exist_ok=True)
    keyed = cells.withColumn(
        "_blk", (F.col("gy") / F.lit(block_rows)).cast("long"))

    def build(key, pdf):
        blk = int(key[0])
        y0 = blk * block_rows
        h = min(block_rows, height - y0)
        arr = np.zeros((h, width), dtype=np.int32)
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64) - y0
        arr[gy, gx] = pdf["val"].to_numpy().astype(np.int32)
        buf = write_cog_bytes(
            arr, (origin[0], origin[1] - y0 * res), (res, res),
            levels=levels, tile_size=tile_size)
        final = f"{directory}/block-{blk:05d}.tif"
        with open(final, "wb") as fh:
            fh.write(buf)
        return pd.DataFrame({"path": [final], "n_pixels": [len(pdf)]})

    manifest = keyed.groupBy("_blk").applyInPandas(
        build, "path string, n_pixels long")
    return manifest.count()
