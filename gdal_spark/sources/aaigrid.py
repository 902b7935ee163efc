"""Arc/Info ASCII Grid driver (public ESRI ASCII raster format; reference
``frmts/aaigrid/aaigriddataset.cpp``).

Format: a 6-line text header —

    ncols <w>
    nrows <h>
    xllcorner <x>      (lower-LEFT corner, note: not the GeoTIFF top-left)
    yllcorner <y>
    cellsize <res>
    NODATA_value <v>

— followed by ``nrows`` whitespace-separated rows, TOP row first.  Values
here are written as integers or shortest-roundtrip decimals, so they
survive the text container exactly (same contract as the GeoJSON/KML
drivers).

Spark mapping: the standard format-driver contract — one ``.asc`` per
row-block on write (``applyInPandas``), one task per file on read with a
single vectorized ``np.loadtxt``-free ``np.fromstring`` parse.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODATA = -9999


def aaigrid_bytes(arr: np.ndarray, xll: float, yll: float,
                  cellsize: float, nodata: int = NODATA) -> bytes:
    """Serialize one grid (top row first, per the spec)."""
    h, w = arr.shape
    head = (
        f"ncols {w}\nnrows {h}\nxllcorner {xll!r}\nyllcorner {yll!r}\n"
        f"cellsize {cellsize!r}\nNODATA_value {nodata}\n"
    )
    if np.issubdtype(arr.dtype, np.integer):
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in arr)
    else:
        body = "\n".join(" ".join(repr(float(v)) for v in row)
                         for row in arr)
    return (head + body + "\n").encode("ascii")


def parse_aaigrid(buf: bytes) -> tuple[dict, np.ndarray]:
    """→ (header dict, float64 array top-row-first)."""
    text = buf.decode("ascii")
    lines = text.split("\n")
    hdr: dict = {}
    i = 0
    while i < len(lines):
        parts = lines[i].split()
        if len(parts) == 2 and parts[0].lower() in (
                "ncols", "nrows", "xllcorner", "yllcorner", "cellsize",
                "nodata_value"):
            hdr[parts[0].lower()] = float(parts[1])
            i += 1
        else:
            break
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    vals = np.array(" ".join(lines[i:]).split(), dtype=np.float64)
    return hdr, vals[:w * h].reshape(h, w)


def write_cell_aaigrids(
    cells: DataFrame, directory: str, width: int, height: int,
    block_rows: int,
    xll: float = 10.0, yll_top: float = 50.0, cellsize: float = 1.0 / 1024.0,
) -> int:
    """Distributed .asc sink over a (gx, gy, val) cell table: one grid per
    row-block; each block's yllcorner follows from its BOTTOM row (the
    lower-left-corner convention)."""
    os.makedirs(directory, exist_ok=True)
    keyed = cells.withColumn(
        "_blk", (F.col("gy") / F.lit(block_rows)).cast("long"))

    def build(key, pdf):
        blk = int(key[0])
        y0 = blk * block_rows
        h = min(block_rows, height - y0)
        arr = np.full((h, width), NODATA, dtype=np.int64)
        gx = pdf["gx"].to_numpy(np.int64)
        gy = pdf["gy"].to_numpy(np.int64) - y0
        arr[gy, gx] = pdf["val"].to_numpy().astype(np.int64)
        yll = yll_top - (y0 + h) * cellsize
        buf = aaigrid_bytes(arr, xll, yll, cellsize)
        final = f"{directory}/block-{blk:05d}.asc"
        with open(final, "wb") as fh:
            fh.write(buf)
        return pd.DataFrame({"path": [final], "n_pixels": [len(pdf)]})

    manifest = keyed.groupBy("_blk").applyInPandas(
        build, "path string, n_pixels long")
    return manifest.count()


def read_aaigrids(
    spark: SparkSession, directory: str,
    xll: float = 10.0, yll_top: float = 50.0, cellsize: float = 1.0 / 1024.0,
) -> DataFrame:
    """Distributed .asc scan → (gx, gy, val) with GLOBAL pixel rows
    recovered from each header's yllcorner; NODATA cells dropped (the
    reference's mask semantics)."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.asc") \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                hdr, arr = parse_aaigrid(bytes(buf))
                h = int(hdr["nrows"])
                y0 = int(round(
                    (yll_top - hdr["yllcorner"]) / hdr["cellsize"])) - h
                nod = hdr.get("nodata_value", NODATA)
                yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
                keep = arr != nod
                yield pd.DataFrame({
                    "gx": xx[keep].astype(np.int64),
                    "gy": (yy[keep] + y0).astype(np.int64),
                    "val": arr[keep].astype(np.float64),
                })

    return files.mapInPandas(parse, "gx long, gy long, val double")
