"""NGS GEOID (.bin) driver — from-scratch codec of the PUBLIC NOAA/NGS
binary geoid-height grid format (reference
``frmts/ngsgeoid/ngsgeoiddataset.cpp``).

Layout: a 44-byte header (4 doubles + 3 ints, HEADER_SIZE = 4·8+3·4),
then NLAT·NLON float32 geoid heights with the FIRST row at the SOUTH
edge (the reference flips at ngsgeoiddataset.cpp:107-110):

    f64 SLAT   south latitude of the first row (cell center)
    f64 WLON   west longitude of the first column (0..360 convention)
    f64 DLAT, DLON   cell sizes (degrees)
    i32 NLAT, NLON   row/column counts
    i32 IKIND  = 1, doubling as the ENDIANNESS marker: the reader
                 tries little-endian first, then big-endian
                 (ngsgeoiddataset.cpp:163-186); all header and data
                 words share the detected order.

Spark mapping — the one-task-per-slab raw-raster contract
(sources/ehdr.py) with the bottom-up flip in the slab offsets."""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEADER_SIZE = 4 * 8 + 3 * 4


def header_bytes(nlat: int, nlon: int, *, slat: float, wlon: float,
                 dlat: float, dlon: float, big_endian: bool = False) -> bytes:
    e = ">" if big_endian else "<"
    return struct.pack(f"{e}4d", slat, wlon, dlat, dlon) + \
        struct.pack(f"{e}3i", nlat, nlon, 1)


def parse_header(path: str) -> dict:
    with open(path, "rb") as fh:
        buf = fh.read(HEADER_SIZE)
    if len(buf) < HEADER_SIZE:
        raise ValueError("ngsgeoid: truncated header")
    for e, name in (("<", "little"), (">", "big")):
        ikind = struct.unpack_from(f"{e}i", buf, HEADER_SIZE - 4)[0]
        if ikind == 1:
            slat, wlon, dlat, dlon = struct.unpack_from(f"{e}4d", buf, 0)
            nlat, nlon = struct.unpack_from(f"{e}2i", buf, 32)
            if nlat <= 0 or nlon <= 0 or dlat <= 1e-15 or dlon <= 1e-15:
                raise ValueError("ngsgeoid: invalid header ranges")
            return {"slat": slat, "wlon": wlon, "dlat": dlat,
                    "dlon": dlon, "h": nlat, "w": nlon,
                    "endian": name, "dtype": f"{e}f4"}
    raise ValueError("ngsgeoid: IKIND marker != 1 in either byte order")


def read_ngsgeoid(spark: SparkSession, path: str,
                  block_rows: int = 64) -> DataFrame:
    """Distributed scan → (gy, gx, val double, lat, lon double), gy
    top-down; lat/lon are the cell-center coordinates the header
    describes (row 0 of the FILE is the south edge)."""
    hdr = parse_header(path)
    w, h = hdr["w"], hdr["h"]
    np_dt = np.dtype(hdr["dtype"])
    slat, wlon = hdr["slat"], hdr["wlon"]
    dlat, dlon = hdr["dlat"], hdr["dlon"]
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(n_blocks).toDF("slab").repartition(
        min(n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    blk = int(s)
                    y0 = blk * block_rows  # top-down block start
                    rows = min(block_rows, h - y0)
                    frow0 = h - (y0 + rows)
                    blob = os.pread(fd, rows * w * 4,
                                    HEADER_SIZE + frow0 * w * 4)
                    arr = np.frombuffer(blob, dtype=np_dt).reshape(
                        rows, w)[::-1]
                    yy, xx = np.mgrid[0:rows, 0:w]
                    gy = (yy.ravel() + y0).astype(np.int64)
                    gx = xx.ravel().astype(np.int64)
                    yield pd.DataFrame({
                        "gy": gy, "gx": gx,
                        "val": arr.ravel().astype(np.float64),
                        "lat": slat + (h - 1 - gy) * dlat,
                        "lon": wlon + gx * dlon,
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(
        read_slab,
        "gy long, gx long, val double, lat double, lon double")


def write_ngsgeoid(
    cells: DataFrame, path: str, w: int, h: int,
    *, slat: float = 24.0, wlon: float = 230.0,
    dlat: float = 1.0 / 60.0, dlon: float = 1.0 / 60.0,
    big_endian: bool = False, block_rows: int = 64,
) -> None:
    """Distributed sink over (gy, gx, val): 44-byte header driver-side,
    one row-block pwrite per task at the south-first flipped offset."""
    np_dt = np.dtype((">" if big_endian else "<") + "f4")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(header_bytes(h, w, slat=slat, wlon=wlon, dlat=dlat,
                              dlon=dlon, big_endian=big_endian))
        fh.truncate(HEADER_SIZE + h * w * 4)

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.zeros((rows, w), dtype=np_dt)
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy(np.float64).astype(np_dt, copy=False))
        frow0 = h - (y0 + rows)
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, buf[::-1].tobytes(order="C"),
                      HEADER_SIZE + frow0 * w * 4)
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
