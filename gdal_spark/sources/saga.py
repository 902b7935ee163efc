"""SAGA GIS binary grid driver — from-scratch codec of the PUBLIC SAGA
``.sgrd`` header + ``.sdat`` raw grid format (reference
``frmts/saga/sagadataset.cpp``).

Format: a ``KEY\\t= value`` text ``.sgrd`` header —

    NAME / DESCRIPTION / UNIT
    DATAFILE_OFFSET = 0
    DATAFORMAT      = BYTE_UNSIGNED|SHORTINT|INTEGER|FLOAT|DOUBLE
    BYTEORDER_BIG   = FALSE
    POSITION_XMIN   = <x of CENTER of west column>
    POSITION_YMIN   = <y of CENTER of south row>
    CELLCOUNT_X/Y, CELLSIZE, Z_FACTOR = 1, NODATA_VALUE
    TOPTOBOTTOM     = FALSE

— next to a single-band raw ``.sdat``.  The format's two quirks, both
preserved from the reference (sagadataset.cpp:508-560, 816-828):

* rows are stored BOTTOM-TO-TOP (``TOPTOBOTTOM = FALSE`` is the only
  layout SAGA itself writes, and the only one the reference reads —
  file row 0 is the SOUTH edge);
* ``POSITION_XMIN/YMIN`` name the CENTER of the south-west cell, not
  its outer corner.

Spark mapping — the engine's one-task-per-slab raw-raster contract:
read parallelizes one row-block per task (``pread`` of its disjoint
range, with gy flipped from the bottom-up file row), write pre-extends
the file and one task per row-block ``pwrite``s its rows.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {"BYTE_UNSIGNED": "u1", "SHORTINT": "<i2",
           "SHORTINT_UNSIGNED": "<u2", "INTEGER": "<i4",
           "INTEGER_UNSIGNED": "<u4", "FLOAT": "<f4", "DOUBLE": "<f8"}
_OF_NP = {"u1": "BYTE_UNSIGNED", "i2": "SHORTINT", "u2": "SHORTINT_UNSIGNED",
          "i4": "INTEGER", "u4": "INTEGER_UNSIGNED",
          "f4": "FLOAT", "f8": "DOUBLE"}


def sgrd_bytes(w: int, h: int, dataformat: str,
               xmin_center: float, ymin_center: float,
               cellsize: float, nodata: float) -> bytes:
    return (
        "NAME\t= gdal_spark\nDESCRIPTION\t=\nUNIT\t=\n"
        "DATAFILE_OFFSET\t= 0\n"
        f"DATAFORMAT\t= {dataformat}\n"
        "BYTEORDER_BIG\t= FALSE\n"
        f"POSITION_XMIN\t= {xmin_center!r}\n"
        f"POSITION_YMIN\t= {ymin_center!r}\n"
        f"CELLCOUNT_X\t= {w}\nCELLCOUNT_Y\t= {h}\n"
        f"CELLSIZE\t= {cellsize!r}\n"
        "Z_FACTOR\t= 1.000000\n"
        f"NODATA_VALUE\t= {nodata!r}\n"
        "TOPTOBOTTOM\t= FALSE\n"
    ).encode("ascii")


def parse_sgrd(path: str) -> dict:
    kv: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            if "=" not in line:
                continue
            k, v = line.split("=", 1)
            kv[k.strip().upper()] = v.strip()
    if kv.get("TOPTOBOTTOM", "FALSE").upper().startswith("TRUE"):
        # the reference rejects TOPTOBOTTOM grids too (sagadataset.cpp:553)
        raise ValueError("saga: TOPTOBOTTOM grids not supported")
    if kv.get("BYTEORDER_BIG", "FALSE").upper().startswith("TRUE"):
        raise ValueError("saga: big-endian grids not supported")
    df = kv.get("DATAFORMAT", "DOUBLE").upper()
    if df not in _DTYPES:
        raise ValueError(f"saga: unhandled DATAFORMAT={df!r}")
    return {
        "w": int(kv["CELLCOUNT_X"]), "h": int(kv["CELLCOUNT_Y"]),
        "dtype": _DTYPES[df],
        "offset": int(kv.get("DATAFILE_OFFSET", "0")),
        "xmin_center": float(kv.get("POSITION_XMIN", "0")),
        "ymin_center": float(kv.get("POSITION_YMIN", "0")),
        "cellsize": float(kv.get("CELLSIZE", "1")),
        "nodata": float(kv.get("NODATA_VALUE", "nan")),
    }


def _raw_path(sgrd_path: str) -> str:
    base = sgrd_path[:-5] if sgrd_path.endswith(".sgrd") else sgrd_path
    return base + ".sdat"


def read_saga(
    spark: SparkSession, sgrd_path: str, block_rows: int = 64,
) -> DataFrame:
    """Distributed scan → (gy, gx, val double) with gy 0 = NORTH (the
    engine's raster convention) recovered from the file's bottom-up
    rows; one row-block pread per task."""
    hdr = parse_sgrd(sgrd_path)
    w, h = hdr["w"], hdr["h"]
    np_dt = np.dtype(hdr["dtype"])
    item = np_dt.itemsize
    raw = _raw_path(sgrd_path)
    offset = hdr["offset"]
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(n_blocks).toDF("slab").repartition(
        min(n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(raw, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    blk = int(s)
                    fy0 = blk * block_rows          # file row (south-up)
                    rows = min(block_rows, h - fy0)
                    pos = offset + fy0 * w * item
                    arr = np.frombuffer(
                        os.pread(fd, rows * w * item, pos),
                        dtype=np_dt).reshape(rows, w)
                    fyy, xx = np.mgrid[0:rows, 0:w]
                    yield pd.DataFrame({
                        # file row fy -> north-up gy = h - 1 - fy
                        "gy": (h - 1 - (fyy.ravel() + fy0)).astype(np.int64),
                        "gx": xx.ravel().astype(np.int64),
                        "val": arr.ravel().astype(np.float64),
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(read_slab, "gy long, gx long, val double")


def write_saga(
    cells: DataFrame, sgrd_path: str, w: int, h: int,
    *, dtype: str = "f4", block_rows: int = 64, fill: float = 0.0,
    xmin: float = 10.0, ymax: float = 50.0,
    cellsize: float = 1.0 / 1024.0, nodata: float = -99999.0,
) -> None:
    """Distributed sink over (gy, gx, val) with gy 0 = north: rows are
    flipped into the format's bottom-up order; POSITION_XMIN/YMIN are
    written as CELL CENTERS per the spec.  One row-block pwrite per
    task."""
    if dtype not in _OF_NP:
        raise ValueError(f"saga write: unsupported dtype {dtype!r}")
    np_dt = np.dtype(_DTYPES[_OF_NP[dtype]])
    item = np_dt.itemsize
    raw = _raw_path(sgrd_path)
    os.makedirs(os.path.dirname(sgrd_path) or ".", exist_ok=True)
    with open(sgrd_path, "wb") as fh:
        fh.write(sgrd_bytes(
            w, h, _OF_NP[dtype],
            xmin + cellsize / 2.0,
            (ymax - h * cellsize) + cellsize / 2.0,
            cellsize, nodata))
    n_blocks = (h + block_rows - 1) // block_rows
    with open(raw, "wb") as fh:
        if fill == 0.0:
            fh.truncate(h * w * item)  # sparse zeros
        else:
            row = np.full(w, fill, dtype=np_dt).tobytes()
            for _ in range(h):
                fh.write(row)

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])                 # block of FILE rows (south-up)
        fy0 = blk * block_rows
        rows = min(block_rows, h - fy0)
        buf = np.full((rows, w), fill, dtype=np_dt)
        fy = h - 1 - pdf["gy"].to_numpy(np.int64)  # north-up -> file row
        buf[fy - fy0, pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype(np_dt, copy=False))
        fd = os.open(raw, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"), fy0 * w * item)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [blk], "n": [len(pdf)]})

    (
        cells.withColumn(
            "_slab",
            F.floor((F.lit(h - 1) - F.col("gy")) / F.lit(block_rows))
            .cast("long"))
        .groupBy("_slab")
        .applyInPandas(write_slab, "slab long, n long")
        .collect()  # bounded: one row per row-block
    )
