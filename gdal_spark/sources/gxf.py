"""GXF grid driver — from-scratch codec of the PUBLIC Geosoft Grid
eXchange File Rev 3 ASCII format (reference ``frmts/gxf/gxfopen.c``).

Layout: ``#``-titled keyword records, each title line followed by its
value line(s) —

    #TITLE        free text
    #POINTS       points per scanline (row width)
    #ROWS         scanline count
    #SENSE        scanline orientation; default GXFS_LL_RIGHT = 1,
                  lower-left origin scanning right (gxfopen.c:212,
                  812) — i.e. the FIRST scanline is the SOUTH row
    #DUMMY        the nodata marker value
    #GRID         starts the data: whitespace-separated values,
                  #POINTS per scanline

This driver covers uncompressed GXF (no #GTYPE base-90 compression)
with sense ±1/∓2 row organisations on read and writes sense 1.

Spark mapping — the splittable-text contract (sources/surfer.py
DSAA): the sink formats every scanline as one fixed-width text line so
row-block tasks pwrite disjoint ranges; the scan preads per-slab line
ranges when the fixed-width invariant holds and falls back to a
driver-side token parse for foreign wrapping."""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CW = 18  # fixed-width cell for the splittable sink
_DUMMY = -1e31


def parse_gxf_header(path: str) -> dict:
    """Driver-side record walk up to #GRID; returns sizes + the byte
    offset of the first data byte."""
    kv: dict[str, str] = {}
    data0 = None
    with open(path, "rb") as fh:
        title = None
        pos = 0
        for raw in fh:
            line = raw.decode("ascii", "replace").rstrip("\r\n")
            if line.startswith("#"):
                title = line.split()[0].upper()
                if title == "#GRID":
                    data0 = pos + len(raw)
                    break
            elif title and title not in kv:
                kv[title] = line.strip()
            pos += len(raw)
    if data0 is None:
        raise ValueError("gxf: no #GRID record")
    if "#POINTS" not in kv or "#ROWS" not in kv:
        raise ValueError("gxf: missing #POINTS/#ROWS")
    sense = int(kv.get("#SENSE", "1"))
    if sense not in (1, -2):
        raise ValueError(f"gxf: unsupported #SENSE {sense} "
                         "(row-organised 1/-2 only)")
    return {"w": int(kv["#POINTS"]), "h": int(kv["#ROWS"]),
            "sense": sense,
            "dummy": float(kv.get("#DUMMY", repr(_DUMMY))),
            "data0": data0}


def read_gxf(spark: SparkSession, path: str,
             block_rows: int = 64) -> DataFrame:
    """Scan → (gy, gx, val double), gy top-down, dummies dropped.
    Fixed-width files read as distributed row-block slabs; foreign
    wraps fall back to a driver-side token parse (the interchange-
    format reality), then parallelize."""
    hdr = parse_gxf_header(path)
    w, h, sense = hdr["w"], hdr["h"], hdr["sense"]
    dummy, data0 = hdr["dummy"], hdr["data0"]
    row_len = w * _CW + 1
    fixed = os.path.getsize(path) == data0 + h * row_len

    def to_gy(scan: np.ndarray) -> np.ndarray:
        # sense 1: scanline 0 is the south row; sense -2: north row
        return (h - 1 - scan) if sense == 1 else scan

    if fixed:
        n_blocks = (h + block_rows - 1) // block_rows
        slabs = spark.range(n_blocks).toDF("slab").repartition(
            min(n_blocks, 32), "slab")

        def read_slab(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
            fd = os.open(path, os.O_RDONLY)
            try:
                for pdf in batches:
                    for s in pdf["slab"].to_numpy():
                        blk = int(s)
                        s0 = blk * block_rows
                        rows = min(block_rows, h - s0)
                        blob = os.pread(fd, rows * row_len,
                                        data0 + s0 * row_len)
                        text = blob.decode("ascii")
                        vals = np.array(text.split(),
                                        dtype=np.float64).reshape(rows, w)
                        scan = np.repeat(
                            np.arange(s0, s0 + rows, dtype=np.int64), w)
                        gx = np.tile(np.arange(w, dtype=np.int64), rows)
                        v = vals.ravel()
                        keep = ~np.isclose(v, dummy, rtol=1e-6)
                        yield pd.DataFrame({
                            "gy": to_gy(scan)[keep], "gx": gx[keep],
                            "val": v[keep]})
            finally:
                os.close(fd)

        return slabs.mapInPandas(read_slab,
                                 "gy long, gx long, val double")

    # foreign wrapping: sequential-prefix problem -> bounded driver parse
    with open(path, "rb") as fh:
        fh.seek(data0)
        toks = fh.read().split()
    vals = np.array(toks, dtype=np.float64)
    if vals.size != w * h:
        raise ValueError(f"gxf: {vals.size} values, want {w * h}")
    vals = vals.reshape(h, w)
    recs = []
    for scan in range(h):
        gy = int(to_gy(np.array([scan]))[0])
        for gx in range(w):
            v = float(vals[scan, gx])
            if not np.isclose(v, dummy, rtol=1e-6):
                recs.append((gy, gx, v))
    return spark.createDataFrame(recs, "gy long, gx long, val double") \
        .repartition(32)


def write_gxf(
    cells: DataFrame, path: str, w: int, h: int,
    *, dummy: float = _DUMMY, title: str = "gdal_spark grid",
) -> None:
    """Sink over (gy, gx, val): header driver-side (sense 1 — south
    row first), one fixed-width text line per scanline pwritten by a
    per-row task (the surfer DSAA splittable layout)."""
    header = (
        "#TITLE\n"
        f"{title}\n"
        "#POINTS\n"
        f"{w}\n"
        "#ROWS\n"
        f"{h}\n"
        "#SENSE\n"
        "1\n"
        "#DUMMY\n"
        f"{dummy:.12g}\n"
        "#GRID\n"
    ).encode("ascii")
    row_len = w * _CW + 1
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(header)
        blank = (f"{dummy:.12g}".rjust(_CW) * w) + "\n"
        for _ in range(h):
            fh.write(blank.encode("ascii"))
    data0 = len(header)

    def write_rows(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gy = int(key[0])
        vals = np.full(w, dummy)
        vals[pdf["gx"].to_numpy(np.int64)] = pdf["val"].to_numpy()
        line = "".join(f"{v:.12g}".rjust(_CW) for v in vals) + "\n"
        scan = h - 1 - gy  # sense 1: south row first
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, line.encode("ascii"), data0 + scan * row_len)
        finally:
            os.close(fd)
        return pd.DataFrame({"gy": [gy], "n": [len(pdf)]})

    cells.groupBy("gy").applyInPandas(
        write_rows, "gy long, n long").collect()
