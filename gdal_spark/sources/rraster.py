"""RRASTER driver — from-scratch codec of the PUBLIC R ``raster``
package native grid format (reference ``frmts/raw/rrasterdataset.cpp``).

Format: a key=value text ``.grd`` sidecar —

    [general]
    creator=...
    [georeference]
    nrows=<h>   ncols=<w>
    xmin=<..> ymin=<..> xmax=<..> ymax=<..>   (CELL EDGES, unlike EHdr)
    [data]
    datatype=INT1U|INT2S|INT4S|FLT4S|FLT8S    (R's size/sign type codes)
    byteorder=little
    nbands=<b>
    bandorder=BIP|BIL|BSQ
    nodatavalue=<v>
    minvalue=<v1:v2:..>  maxvalue=<..>        (per-band colon lists)

— next to a raw ``.gri`` file.  Section headers are decorative (the
reference parser keys on names only, rrasterdataset.cpp:1071-1095).
This driver's write path emits BIP (band-interleaved-by-PIXEL — all
bands of one pixel adjacent), completing the interleave triple next to
the ENVI driver's BSQ and the EHdr driver's BIL; the read path handles
all three bandorders.

Spark mapping — the engine's one-task-per-slab raw-raster contract
(sources/envi.py): driver parses only the tiny .grd; read parallelizes
one (band, row-block) slab per task (``pread`` of the block, strided
view per interleave); write pre-extends the file and one task per
row-block ``pwrite``s its range.  Per-band min/max for the header are
computed as a bounded Spark aggregate, not a driver pass.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# R raster datatype code -> numpy little-endian dtype
_DTYPES = {"INT1U": "u1", "INT2S": "<i2", "INT2U": "<u2",
           "INT4S": "<i4", "FLT4S": "<f4", "FLT8S": "<f8"}
_OF_NP = {"u1": "INT1U", "i2": "INT2S", "u2": "INT2U",
          "i4": "INT4S", "f4": "FLT4S", "f8": "FLT8S"}


def grd_bytes(w: int, h: int, bands: int, datatype: str, bandorder: str,
              xmin: float, ymin: float, xmax: float, ymax: float,
              nodata: float, minv: list[float], maxv: list[float]) -> bytes:
    return (
        "[general]\ncreator=gdal_spark\n"
        "[georeference]\n"
        f"nrows={h}\nncols={w}\n"
        f"xmin={xmin!r}\nymin={ymin!r}\nxmax={xmax!r}\nymax={ymax!r}\n"
        "[data]\n"
        f"datatype={datatype}\nbyteorder=little\n"
        f"nbands={bands}\nbandorder={bandorder}\n"
        f"nodatavalue={nodata!r}\n"
        f"minvalue={':'.join(repr(v) for v in minv)}\n"
        f"maxvalue={':'.join(repr(v) for v in maxv)}\n"
    ).encode("ascii")


def parse_grd(path: str) -> dict:
    kv: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("["):
                continue  # section headers are decorative
            if "=" in line:
                k, v = line.split("=", 1)
                kv[k.strip().lower()] = v.strip()
    dt = kv.get("datatype", "")
    if dt not in _DTYPES:
        raise ValueError(f"rraster: unhandled datatype={dt!r}")
    if kv.get("byteorder", "little").lower() != "little":
        raise ValueError("rraster: only byteorder=little supported")
    bandorder = kv.get("bandorder", "BIL").upper()
    if bandorder not in ("BIP", "BIL", "BSQ"):
        raise ValueError(f"rraster: unknown bandorder={bandorder!r}")
    out = {
        "w": int(kv["ncols"]), "h": int(kv["nrows"]),
        "bands": int(kv.get("nbands", "1")),
        "dtype": _DTYPES[dt], "bandorder": bandorder,
        "xmin": float(kv["xmin"]), "ymin": float(kv["ymin"]),
        "xmax": float(kv["xmax"]), "ymax": float(kv["ymax"]),
        "nodata": float(kv["nodatavalue"])
        if "nodatavalue" in kv else None,
    }
    for k in ("minvalue", "maxvalue"):
        if k in kv:
            out[k] = [float(x) for x in kv[k].split(":")]
    return out


def _raw_path(grd_path: str) -> str:
    base = grd_path[:-4] if grd_path.endswith(".grd") else grd_path
    return base + ".gri"


def read_rraster(
    spark: SparkSession, grd_path: str, block_rows: int = 64,
) -> DataFrame:
    """Distributed scan → (band, gy, gx, val double): one task per
    (band, row-block) slab; the pread block is reshaped per the header's
    bandorder (BIP / BIL / BSQ)."""
    hdr = parse_grd(grd_path)
    w, h, bands = hdr["w"], hdr["h"], hdr["bands"]
    order = hdr["bandorder"]
    np_dt = np.dtype(hdr["dtype"])
    item = np_dt.itemsize
    raw = _raw_path(grd_path)
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(bands * n_blocks).toDF("slab").repartition(
        min(bands * n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(raw, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    b, blk = divmod(int(s), n_blocks)
                    y0 = blk * block_rows
                    rows = min(block_rows, h - y0)
                    if order == "BSQ":
                        pos = (b * h + y0) * w * item
                        arr = np.frombuffer(
                            os.pread(fd, rows * w * item, pos),
                            dtype=np_dt).reshape(rows, w)
                    else:  # BIP / BIL share one interleaved block read
                        pos = y0 * bands * w * item
                        blob = os.pread(fd, rows * bands * w * item, pos)
                        cube = np.frombuffer(blob, dtype=np_dt)
                        if order == "BIP":
                            arr = cube.reshape(rows, w, bands)[:, :, b]
                        else:
                            arr = cube.reshape(rows, bands, w)[:, b, :]
                    yy, xx = np.mgrid[0:rows, 0:w]
                    yield pd.DataFrame({
                        "band": np.full(arr.size, b, dtype=np.int64),
                        "gy": (yy.ravel() + y0).astype(np.int64),
                        "gx": xx.ravel().astype(np.int64),
                        "val": arr.ravel().astype(np.float64),
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(
        read_slab, "band long, gy long, gx long, val double")


def write_rraster(
    cells: DataFrame, grd_path: str, w: int, h: int, bands: int,
    *, dtype: str = "f4", block_rows: int = 64, fill: float = 0.0,
    xmin: float = 10.0, ymax: float = 50.0,
    cellsize: float = 1.0 / 1024.0, nodata: float = -9999.0,
) -> None:
    """Distributed BIP sink over (band, gy, gx, val): .grd + pre-extended
    .gri driver-side, one task per row-block ``pwrite``s all bands of its
    rows (BIP makes the row-block the contiguous unit).  Header min/max
    come from a bounded per-band Spark aggregate."""
    if dtype not in _OF_NP:
        raise ValueError(f"rraster write: unsupported dtype {dtype!r}")
    np_dt = np.dtype(_DTYPES[_OF_NP[dtype]])
    item = np_dt.itemsize
    raw = _raw_path(grd_path)
    os.makedirs(os.path.dirname(grd_path) or ".", exist_ok=True)

    stats = {
        int(r["band"]): (float(r["mn"]), float(r["mx"]))
        for r in cells.groupBy("band").agg(
            F.min("val").alias("mn"), F.max("val").alias("mx")).collect()
    }  # bounded: one row per band
    minv = [stats.get(b, (nodata, nodata))[0] for b in range(bands)]
    maxv = [stats.get(b, (nodata, nodata))[1] for b in range(bands)]
    with open(grd_path, "wb") as fh:
        fh.write(grd_bytes(
            w, h, bands, _OF_NP[dtype], "BIP",
            xmin, ymax - h * cellsize, xmin + w * cellsize, ymax,
            nodata, minv, maxv))
    with open(raw, "wb") as fh:
        if fill == 0.0:
            fh.truncate(h * w * bands * item)  # sparse zeros
        else:
            px = np.full(w * bands, fill, dtype=np_dt).tobytes()
            for _ in range(h):
                fh.write(px)

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w, bands), fill, dtype=np_dt)
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64),
            pdf["band"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype(np_dt, copy=False))
        fd = os.open(raw, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"),
                      y0 * w * bands * item)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [blk], "n": [len(pdf)]})

    (
        cells.withColumn(
            "_slab",
            F.floor(F.col("gy") / F.lit(block_rows)).cast("long"))
        .groupBy("_slab")
        .applyInPandas(write_slab, "slab long, n long")
        .collect()  # bounded: one row per row-block
    )
