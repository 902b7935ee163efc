"""FARSITE LCP landscape driver — from-scratch codec of the PUBLIC
FARSITE v.4 landscape-file format (reference
``frmts/raw/lcpdataset.cpp``).

Layout: a fixed 7316-byte little-endian header, then band-interleaved-
by-PIXEL (BIP) int16 samples — pixel stride = nbands·2, band offset =
(band−1)·2, line stride = nbands·2·width (lcpdataset.cpp:318).

Header fields this driver honours (lcpdataset.cpp:250-296, 124-154):

  off 0     int32  crown-fuels flag: 21 = present, 20 = absent
  off 4     int32  ground-fuels flag: 21 / 20
  off 8     int32  latitude (whole degrees)
  off 4164  int32  width;  off 4168  int32 height
  off 4172  f64 east, 4180 west, 4188 north, 4196 south
  off 4204  int32  linear unit (0 = meters, 1 = feet)
  off 4208  f64 cellX, 4216 f64 cellY
  off 6804  char[] description (NUL-terminated)

Band count is DERIVED from the two flags exactly as the reference does:
5 (base: elevation/slope/aspect/fuel/cover), +3 crown fuels, +2 ground
fuels → 5/7/8/10.

Spark mapping — the one-task-per-slab raw-raster contract
(sources/ehdr.py): a row-block slab preads its contiguous BIP rows and
strides out each band; the sink pre-extends the file and each slab
task pwrites all bands of its rows (a row-block is the contiguous
unit under BIP)."""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEADER_SIZE = 7316

_BAND_COUNT = {(False, False): 5, (False, True): 7,
               (True, False): 8, (True, True): 10}


def header_bytes(w: int, h: int, *, crown: bool, ground: bool,
                 latitude: int = 45, west: float = 0.0,
                 north: float = 0.0, cell: float = 30.0,
                 description: str = "gdal_spark landscape") -> bytes:
    buf = bytearray(HEADER_SIZE)
    struct.pack_into("<i", buf, 0, 21 if crown else 20)
    struct.pack_into("<i", buf, 4, 21 if ground else 20)
    struct.pack_into("<i", buf, 8, latitude)
    struct.pack_into("<2i", buf, 4164, w, h)
    east = west + w * cell
    south = north - h * cell
    struct.pack_into("<4d", buf, 4172, east, west, north, south)
    struct.pack_into("<i", buf, 4204, 0)  # meters
    struct.pack_into("<2d", buf, 4208, cell, cell)
    desc = description.encode("ascii")[:511]
    buf[6804:6804 + len(desc)] = desc
    return bytes(buf)


def parse_header(path: str) -> dict:
    with open(path, "rb") as fh:
        buf = fh.read(HEADER_SIZE)
    if len(buf) < HEADER_SIZE:
        raise ValueError("lcp: file shorter than the 7316-byte header")
    crown_flag = struct.unpack_from("<i", buf, 0)[0]
    ground_flag = struct.unpack_from("<i", buf, 4)[0]
    if crown_flag not in (20, 21) or ground_flag not in (20, 21):
        raise ValueError(
            f"lcp: bad crown/ground flags {crown_flag}/{ground_flag} "
            "(want 20 or 21)")
    crown, ground = crown_flag == 21, ground_flag == 21
    w, h = struct.unpack_from("<2i", buf, 4164)
    east, west, north, south = struct.unpack_from("<4d", buf, 4172)
    cellx, celly = struct.unpack_from("<2d", buf, 4208)
    desc = buf[6804:].split(b"\x00", 1)[0].decode("ascii", "replace")
    return {
        "w": w, "h": h, "bands": _BAND_COUNT[(crown, ground)],
        "crown": crown, "ground": ground,
        "latitude": struct.unpack_from("<i", buf, 8)[0],
        "west": west, "north": north, "east": east, "south": south,
        "cellx": cellx, "celly": celly, "description": desc,
    }


def read_lcp(spark: SparkSession, path: str,
             block_rows: int = 64) -> DataFrame:
    """Distributed BIP scan → (band, gy, gx, val long): one task per
    row-block slab; one contiguous pread per slab, numpy stride view
    per band."""
    hdr = parse_header(path)
    w, h, bands = hdr["w"], hdr["h"], hdr["bands"]
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(n_blocks).toDF("slab").repartition(
        min(n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    blk = int(s)
                    y0 = blk * block_rows
                    rows = min(block_rows, h - y0)
                    blob = os.pread(fd, rows * w * bands * 2,
                                    HEADER_SIZE + y0 * w * bands * 2)
                    arr = np.frombuffer(blob, dtype="<i2").reshape(
                        rows, w, bands)
                    for b in range(bands):
                        yy, xx = np.mgrid[0:rows, 0:w]
                        yield pd.DataFrame({
                            "band": np.full(rows * w, b, dtype=np.int64),
                            "gy": (yy.ravel() + y0).astype(np.int64),
                            "gx": xx.ravel().astype(np.int64),
                            "val": arr[:, :, b].ravel().astype(np.int64),
                        })
        finally:
            os.close(fd)

    return slabs.mapInPandas(
        read_slab, "band long, gy long, gx long, val long")


def write_lcp(
    cells: DataFrame, path: str, w: int, h: int,
    *, crown: bool = True, ground: bool = False,
    block_rows: int = 64, fill: int = -9999, **hdr_kw,
) -> None:
    """Distributed BIP sink over (band, gy, gx, val): header +
    pre-extended body driver-side, one row-block pwrite per task."""
    bands = _BAND_COUNT[(crown, ground)]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(header_bytes(w, h, crown=crown, ground=ground, **hdr_kw))
        row = np.full(w * bands, fill, dtype="<i2").tobytes()
        for _ in range(h):
            fh.write(row)

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w, bands), fill, dtype="<i2")
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64),
            pdf["band"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy(np.int64).astype("<i2"))
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"),
                      HEADER_SIZE + y0 * w * bands * 2)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [blk], "n": [len(pdf)]})

    (
        cells.withColumn(
            "_slab",
            F.floor(F.col("gy") / F.lit(block_rows)).cast("long"))
        .groupBy("_slab")
        .applyInPandas(write_slab, "slab long, n long")
        .collect()
    )
