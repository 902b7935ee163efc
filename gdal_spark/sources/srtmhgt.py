"""SRTM HGT driver — from-scratch codec of the PUBLIC NASA SRTM .hgt tile
format (reference reads it in ``frmts/srtmhgt/srtmhgtdataset.cpp``).

Format (public SRTM documentation):

* filename ``[NS]yy[EW]xxx.hgt`` names the SOUTH-WEST corner of a 1x1
  degree cell (``N51E010.hgt`` covers lat [51,52), lon [10,11));
* contents are an ``n x n`` grid of BIG-ENDIAN signed 16-bit elevations,
  ``n = 3601`` (SRTM1) or ``1201`` (SRTM3) in the wild — ``n`` is inferred
  from the file size (the reference does the same, srtmhgtdataset.cpp
  Identify/Open), so any perfect-square payload parses;
* rows run NORTH to SOUTH, columns WEST to EAST; sample spacing is
  ``1/(n-1)`` degrees (edge rows/cols are shared with neighbour tiles);
* voids are ``-32768``.

Spark mapping — the repo's standard format-driver contract:

* **write**: one ``.hgt`` file per 1-degree tile via ``applyInPandas``
  over the tile key (a tile is bounded: <=3601^2 * 2 bytes = 26 MB);
* **read**: ``binaryFile`` one task per tile, vectorized ``frombuffer``
  parse, voids dropped (the reference's nodata mask), emitting global
  (lon, lat, elev) so downstream DEM operators are tile-agnostic.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOID = -32768

_NAME_RE = re.compile(r"([NS])(\d{2})([EW])(\d{3})\.hgt$", re.IGNORECASE)


def hgt_name(lat_sw: int, lon_sw: int) -> str:
    """SW-corner tile name (``N51E010.hgt``), the format's georeferencing."""
    ns = "N" if lat_sw >= 0 else "S"
    ew = "E" if lon_sw >= 0 else "W"
    return f"{ns}{abs(lat_sw):02d}{ew}{abs(lon_sw):03d}.hgt"


def parse_hgt_name(path: str) -> tuple[int, int]:
    """→ (lat_sw, lon_sw) from the filename (the only georef the format
    carries)."""
    m = _NAME_RE.search(os.path.basename(path))
    if not m:
        raise ValueError(f"srtmhgt: not an SRTM tile name: {path!r}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def hgt_bytes(arr: np.ndarray) -> bytes:
    """Serialize one tile: square int16 grid, big-endian, N->S rows."""
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        raise ValueError(f"srtmhgt: tile must be square, got {arr.shape}")
    return arr.astype(">i2").tobytes(order="C")


def parse_hgt(buf: bytes) -> np.ndarray:
    """→ (n, n) int16 array (native byte order), N->S rows.  ``n`` is
    inferred from the byte length exactly like the reference's Open()."""
    n2 = len(buf) // 2
    n = int(round(n2 ** 0.5))
    if n * n != n2 or len(buf) % 2:
        raise ValueError(f"srtmhgt: {len(buf)} bytes is not a square grid")
    return np.frombuffer(buf, dtype=">i2").reshape(n, n).astype(np.int16)


def write_hgt_tiles(cells: DataFrame, directory: str, n: int) -> int:
    """Distributed .hgt sink over (lat_sw, lon_sw, row, col, elev) —
    row 0 = the tile's NORTH edge (spec order).  Cells absent from the
    input are written as VOID; one file per 1-degree tile."""
    os.makedirs(directory, exist_ok=True)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lat_sw, lon_sw = int(key[0]), int(key[1])
        arr = np.full((n, n), VOID, dtype=np.int16)
        arr[pdf["row"].to_numpy(np.int64),
            pdf["col"].to_numpy(np.int64)] = (
            pdf["elev"].to_numpy(np.int64).astype(np.int16))
        path = f"{directory}/{hgt_name(lat_sw, lon_sw)}"
        with open(path, "wb") as fh:
            fh.write(hgt_bytes(arr))
        return pd.DataFrame({"path": [path], "n_cells": [len(pdf)]})

    manifest = cells.groupBy("lat_sw", "lon_sw").applyInPandas(
        build, "path string, n_cells long")
    return manifest.count()


def read_hgt(spark: SparkSession, directory: str) -> DataFrame:
    """Distributed .hgt scan → (lat_sw, lon_sw, row, col, elev, lon, lat);
    voids dropped.  lon/lat are the sample's geographic position from the
    SW-corner name + 1/(n-1) spacing (the reference's geotransform)."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.hgt") \
        .select("path", F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, buf in zip(pdf["path"], pdf["buf"]):
                lat_sw, lon_sw = parse_hgt_name(str(path))
                arr = parse_hgt(bytes(buf))
                n = arr.shape[0]
                step = 1.0 / (n - 1)
                rr, cc = np.mgrid[0:n, 0:n]
                keep = arr != VOID
                rows, cols = rr[keep], cc[keep]
                yield pd.DataFrame({
                    "lat_sw": np.full(rows.size, lat_sw, dtype=np.int64),
                    "lon_sw": np.full(rows.size, lon_sw, dtype=np.int64),
                    "row": rows.astype(np.int64),
                    "col": cols.astype(np.int64),
                    "elev": arr[keep].astype(np.int64),
                    "lon": lon_sw + cols * step,
                    "lat": lat_sw + 1.0 - rows * step,
                })

    return files.mapInPandas(
        parse,
        "lat_sw long, lon_sw long, row long, col long, elev long,"
        " lon double, lat double",
    )
