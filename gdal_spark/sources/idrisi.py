"""Idrisi RST raster driver — from-scratch codec of the PUBLIC
TerrSet/Idrisi raster format (reference
``frmts/idrisi/IdrisiDataset.cpp``).

Format — a raw ``.rst`` file next to a ``.rdc`` "documentation" file
whose keys are FIXED-WIDTH 12-character fields followed by ``: value``
(IdrisiDataset.cpp:55-82 lists the exact padded key strings, e.g.
``"data type   "``, ``"flag value  "``):

    file format : IDRISI Raster A.1
    data type   : byte | integer | real
    file type   : binary
    columns     : <w>
    rows        : <h>
    min. value  : <v>      max. value  : <v>
    flag value  : <nodata or 'none'>   flag def'n  : missing data

``byte`` = uint8, ``integer`` = int16 little-endian, ``real`` = float32
little-endian; rows run top→bottom; always a single band (the rgb24
packed type is out of scope).  The novelty vs the engine's other
header-labelled raws: the fixed-12-char key syntax and the
``flag value`` nodata contract, which read honors by dropping flagged
cells.

Spark mapping — the one-task-per-slab raw-raster contract
(sources/ehdr.py); single band, so a slab is a row-block.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {"byte": "u1", "integer": "<i2", "real": "<f4"}
_OF_NP = {"u1": "byte", "i2": "integer", "f4": "real"}


def rdc_bytes(w: int, h: int, data_type: str, vmin: float, vmax: float,
              flag: float | None) -> bytes:
    def row(key: str, val) -> str:
        # the format's 12-character padded key field
        return f"{key:<12s}: {val}\n"

    flag_s = "none" if flag is None else repr(flag)
    return (
        row("file format", "IDRISI Raster A.1")
        + row("file title", "")
        + row("data type", data_type)
        + row("file type", "binary")
        + row("columns", w)
        + row("rows", h)
        + row("ref. system", "plane")
        + row("ref. units", "m")
        + row("unit dist.", "1.0000000")
        + row("min. X", "0.0000000") + row("max. X", float(w))
        + row("min. Y", "0.0000000") + row("max. Y", float(h))
        + row("pos'n error", "unknown")
        + row("resolution", "1.0000000")
        + row("min. value", vmin) + row("max. value", vmax)
        + row("display min", vmin) + row("display max", vmax)
        + row("value units", "unspecified")
        + row("value error", "unknown")
        + row("flag value", flag_s)
        + row("flag def'n", "none" if flag is None else "missing data")
        + row("legend cats", 0)
    ).encode("ascii")


def parse_rdc(path: str) -> dict:
    kv: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            if ":" not in line:
                continue
            k, _, v = line.partition(":")
            kv[k.strip().lower()] = v.strip()
    dt = kv.get("data type", "byte").lower()
    if dt not in _DTYPES:
        raise ValueError(f"idrisi: unsupported data type {dt!r} "
                         "(rgb24 out of scope)")
    if kv.get("file type", "binary").lower() != "binary":
        raise ValueError("idrisi: only binary file type supported")
    flag_s = kv.get("flag value", "none").lower()
    return {
        "w": int(kv["columns"]), "h": int(kv["rows"]),
        "dtype": _DTYPES[dt],
        "flag": None if flag_s in ("none", "") else float(flag_s),
    }


def _raw_path(rdc_path: str) -> str:
    base = rdc_path[:-4] if rdc_path.lower().endswith(".rdc") else rdc_path
    return base + ".rst"


def read_idrisi(spark: SparkSession, rdc_path: str,
                block_rows: int = 64) -> DataFrame:
    """Distributed scan → (gy, gx, val double); cells equal to the
    documentation file's flag value are DROPPED (the format's nodata)."""
    hdr = parse_rdc(rdc_path)
    w, h = hdr["w"], hdr["h"]
    np_dt = np.dtype(hdr["dtype"])
    item = np_dt.itemsize
    flag = hdr["flag"]
    raw = _raw_path(rdc_path)
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(n_blocks).toDF("slab").repartition(
        min(n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(raw, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    blk = int(s)
                    y0 = blk * block_rows
                    rows = min(block_rows, h - y0)
                    blob = os.pread(fd, rows * w * item, y0 * w * item)
                    arr = np.frombuffer(blob, dtype=np_dt).reshape(rows, w)
                    yy, xx = np.mgrid[0:rows, 0:w]
                    vals = arr.ravel().astype(np.float64)
                    keep = np.ones(vals.size, dtype=bool) if flag is None \
                        else vals != flag
                    yield pd.DataFrame({
                        "gy": (yy.ravel() + y0).astype(np.int64)[keep],
                        "gx": xx.ravel().astype(np.int64)[keep],
                        "val": vals[keep],
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(read_slab, "gy long, gx long, val double")


def write_idrisi(
    cells: DataFrame, rdc_path: str, w: int, h: int,
    *, dtype: str = "i2", flag: float | None = None,
    block_rows: int = 64,
) -> None:
    """Distributed sink over (gy, gx, val): .rdc + pre-extended .rst
    driver-side (holes carry the flag value when one is declared), one
    row-block pwrite per task.  min/max in the .rdc come from one
    bounded aggregate over the cells."""
    if dtype not in _OF_NP:
        raise ValueError(f"idrisi write: unsupported dtype {dtype!r}")
    np_dt = np.dtype(_DTYPES[_OF_NP[dtype]])
    item = np_dt.itemsize
    fill = 0.0 if flag is None else flag
    stats = cells.agg(F.min("val").alias("lo"),
                      F.max("val").alias("hi")).collect()[0]
    raw = _raw_path(rdc_path)
    os.makedirs(os.path.dirname(rdc_path) or ".", exist_ok=True)
    with open(rdc_path, "wb") as fh:
        fh.write(rdc_bytes(w, h, _OF_NP[dtype],
                           stats["lo"], stats["hi"], flag))
    with open(raw, "wb") as fh:
        if fill == 0.0:
            fh.truncate(h * w * item)
        else:
            row = np.full(w, fill, dtype=np_dt).tobytes()
            for _ in range(h):
                fh.write(row)
    n_blocks = (h + block_rows - 1) // block_rows

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w), fill, dtype=np_dt)
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype(np_dt, copy=False))
        fd = os.open(raw, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"), y0 * w * item)
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
