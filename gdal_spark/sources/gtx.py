"""NOAA VDatum .gtx vertical-shift grid driver — the PUBLIC binary grid
format PROJ and the reference read (``frmts/gtx/gtxdataset.cpp``).

Format (big-endian): 40-byte header — f64 lat of lower-left, f64 lon of
lower-left (0..360 convention), f64 delta lat, f64 delta lon, i32 rows,
i32 cols — followed by rows×cols float32 shift values, SOUTH row first
(bottom-up), -88.8888 as nodata by convention.

Spark mapping: the grid is a dimension-scale artifact (vertical datums are
a few MB), so write stays a bounded single-file sink; the READ is the
distributed path — one task per row-block ``pread``-ing its byte range,
emitting (row, col, lat, lon, shift) for the broadcast-sample join the
warp/transformer family uses.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NODATA = -88.8888


def gtx_bytes(arr: np.ndarray, lat0: float, lon0: float,
              dlat: float, dlon: float) -> bytes:
    """Serialize one grid (SOUTH row first, per the spec)."""
    rows, cols = arr.shape
    head = struct.pack(">ddddii", lat0, lon0, dlat, dlon, rows, cols)
    return head + arr.astype(">f4").tobytes(order="C")


def parse_gtx_header(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(40)
    lat0, lon0, dlat, dlon, rows, cols = struct.unpack(">ddddii", head)
    if rows <= 0 or cols <= 0 or not (0.0 < dlat < 90.0):
        raise ValueError(f"gtx: implausible header in {path!r}")
    return {"lat0": lat0, "lon0": lon0, "dlat": dlat, "dlon": dlon,
            "rows": rows, "cols": cols}


def write_gtx(arr: np.ndarray, path: str, lat0: float, lon0: float,
              dlat: float, dlon: float) -> None:
    with open(path, "wb") as fh:
        fh.write(gtx_bytes(arr, lat0, lon0, dlat, dlon))


def read_gtx(spark: SparkSession, path: str,
             block_rows: int = 64) -> DataFrame:
    """Distributed scan → (row, col, lat, lon, shift), nodata dropped;
    one task per row-block pread (header parsed driver-side only)."""
    h = parse_gtx_header(path)
    rows, cols = h["rows"], h["cols"]
    n_blocks = (rows + block_rows - 1) // block_rows
    lat0, lon0, dlat, dlon = h["lat0"], h["lon0"], h["dlat"], h["dlon"]

    blocks = spark.range(n_blocks).toDF("blk").repartition(
        min(n_blocks, 32), "blk")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for b in pdf["blk"].to_numpy():
                    r0 = int(b) * block_rows
                    nr = min(block_rows, rows - r0)
                    raw = os.pread(fd, nr * cols * 4, 40 + r0 * cols * 4)
                    arr = np.frombuffer(raw, dtype=">f4").reshape(nr, cols)
                    rr, cc = np.mgrid[0:nr, 0:cols]
                    vals = arr.astype(np.float64)
                    keep = np.abs(vals - NODATA) > 1e-4
                    rrk = (rr + r0)[keep]
                    cck = cc[keep]
                    yield pd.DataFrame({
                        "row": rrk.ravel().astype(np.int64),
                        "col": cck.ravel().astype(np.int64),
                        "lat": lat0 + rrk.ravel() * dlat,
                        "lon": lon0 + cck.ravel() * dlon,
                        "shift": vals[keep].ravel(),
                    })
        finally:
            os.close(fd)

    return blocks.mapInPandas(
        fetch, "row long, col long, lat double, lon double, shift double")
