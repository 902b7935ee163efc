"""Golden Software Surfer grid drivers — from-scratch codecs of the
PUBLIC Surfer 6 grid formats (reference ``frmts/gsg/gsagdataset.cpp``
ASCII and ``frmts/gsg/gsbgdataset.cpp`` binary).

Two sibling layouts, both BOTTOM-UP (file row 0 is the SOUTH row):

* ``DSAA`` (GSAG, ASCII)::

      DSAA
      <nx> <ny>
      <xlo> <xhi>
      <ylo> <yhi>
      <zlo> <zhi>
      z z z ...      (nx values per grid row, south row first,
                      wrapped at ~10 values per text line)

* ``DSBB`` (GSBG, binary): magic ``DSBB``, int16 nx, int16 ny
  (little-endian — the format predates big grids), then 6 doubles
  xlo xhi ylo yhi zlo zhi, then ny rows of nx float32, south row
  first.

Blanked nodes carry the format's famous blank value 1.70141e38
(gsbgdataset.cpp:71 pins the exact float32 ``1.701410009187828e+38``;
gsagdataset.cpp:72 the double ``1.70141E+38``) and are DROPPED on read.

Spark mapping — binary follows the one-task-per-slab raw-raster
contract (sources/ehdr.py) with the bottom-up row flip in the slab
offsets; ASCII text is written per-row by the row-block task and read
with a driver-side header parse + per-slab line ranges.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLANK_F32 = np.float32(1.701410009187828e38)
BLANK_F64 = 1.70141e38


# ---------------------------------------------------------------------------
# DSBB — Surfer 6 binary
# ---------------------------------------------------------------------------

def parse_gsbg_header(path: str) -> dict:
    with open(path, "rb") as fh:
        buf = fh.read(56)
    if buf[0:4] != b"DSBB":
        raise ValueError("surfer: missing DSBB magic")
    nx, ny = struct.unpack_from("<2h", buf, 4)
    xlo, xhi, ylo, yhi, zlo, zhi = struct.unpack_from("<6d", buf, 8)
    return {"w": nx, "h": ny, "xlo": xlo, "xhi": xhi, "ylo": ylo,
            "yhi": yhi, "zlo": zlo, "zhi": zhi, "data0": 56}


def read_gsbg(spark: SparkSession, path: str,
              block_rows: int = 64) -> DataFrame:
    """Distributed scan → (gy, gx, val double) with gy top-down; the
    file's south-first rows are flipped in the slab offset math.
    Blanked nodes (1.70141e38) are dropped."""
    hdr = parse_gsbg_header(path)
    w, h = hdr["w"], hdr["h"]
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
                    # top-down rows y0..y0+rows-1 live at file rows
                    # h-1-y .. contiguous descending; pread the range
                    frow0 = h - (y0 + rows)
                    blob = os.pread(fd, rows * w * 4,
                                    56 + frow0 * w * 4)
                    arr = np.frombuffer(blob, dtype="<f4").reshape(
                        rows, w)[::-1]  # flip to top-down
                    yy, xx = np.mgrid[0:rows, 0:w]
                    vals = arr.ravel().astype(np.float64)
                    keep = ~np.isclose(vals, BLANK_F64, rtol=1e-6)
                    yield pd.DataFrame({
                        "gy": (yy.ravel() + y0).astype(np.int64)[keep],
                        "gx": xx.ravel().astype(np.int64)[keep],
                        "val": vals[keep],
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(read_slab, "gy long, gx long, val double")


def write_gsbg(
    cells: DataFrame, path: str, w: int, h: int,
    *, xlo: float = 0.0, ylo: float = 0.0, cell: float = 1.0,
    block_rows: int = 64,
) -> None:
    """Distributed binary sink over (gy, gx, val): header + blank-filled
    body driver-side, one row-block pwrite per task at the flipped
    offset.  zlo/zhi come from one bounded aggregate."""
    stats = cells.agg(F.min("val").alias("lo"),
                      F.max("val").alias("hi")).collect()[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"DSBB" + struct.pack("<2h", w, h))
        fh.write(struct.pack(
            "<6d", xlo, xlo + (w - 1) * cell, ylo, ylo + (h - 1) * cell,
            float(stats["lo"]), float(stats["hi"])))
        row = np.full(w, BLANK_F32, dtype="<f4").tobytes()
        for _ in range(h):
            fh.write(row)
    n_blocks = (h + block_rows - 1) // block_rows

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w), BLANK_F32, dtype="<f4")
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype("<f4", copy=False))
        fd = os.open(path, os.O_WRONLY)
        try:
            # flip: top-down rows y0.. go to file rows h-1-y (descending)
            os.pwrite(fd, buf[::-1].tobytes(order="C"),
                      56 + (h - (y0 + rows)) * w * 4)
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


# ---------------------------------------------------------------------------
# DSAA — Surfer ASCII (one text row per grid row keeps the scan splittable)
# ---------------------------------------------------------------------------

def write_gsag(
    cells: DataFrame, path: str, w: int, h: int,
    *, xlo: float = 0.0, ylo: float = 0.0, cell: float = 1.0,
) -> None:
    """ASCII sink: 5-line header driver-side, then every grid row as one
    text line (a legal wrap choice — readers split on whitespace),
    assembled per row-block task and written with a single pwrite into
    a pre-sized region via fixed-width formatting."""
    stats = cells.agg(F.min("val").alias("lo"),
                      F.max("val").alias("hi")).collect()[0]
    header = (
        "DSAA\r\n"
        f"{w} {h}\r\n"
        f"{xlo:.7g} {xlo + (w - 1) * cell:.7g}\r\n"
        f"{ylo:.7g} {ylo + (h - 1) * cell:.7g}\r\n"
        f"{float(stats['lo']):.7g} {float(stats['hi']):.7g}\r\n"
    ).encode("ascii")
    # fixed-width cells make every row line the same byte length, so
    # tasks can pwrite disjoint ranges without a shuffle to one file
    cw = 18
    row_len = w * cw + 2
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(header)
        blank = (f"{BLANK_F64:.12g}".rjust(cw) * w) + "\r\n"
        for _ in range(h):
            fh.write(blank.encode("ascii"))
    data0 = len(header)

    def write_rows(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gy = int(key[0])
        vals = np.full(w, BLANK_F64)
        vals[pdf["gx"].to_numpy(np.int64)] = pdf["val"].to_numpy()
        line = "".join(f"{v:.12g}".rjust(cw) for v in vals) + "\r\n"
        frow = h - 1 - gy  # bottom-up
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, line.encode("ascii"), data0 + frow * row_len)
        finally:
            os.close(fd)
        return pd.DataFrame({"gy": [gy], "n": [len(pdf)]})

    (
        cells.groupBy("gy")
        .applyInPandas(write_rows, "gy long, n long")
        .collect()  # bounded: one row per grid row
    )


def read_gsag(spark: SparkSession, path: str,
              block_rows: int = 64) -> DataFrame:
    """ASCII scan.  Fixed-width files (write_gsag's layout, detected by
    size = header + h·row_len) read fully distributed — one row-block
    pread per task, same slab contract as the binary path.  Foreign
    files with arbitrary whitespace wrapping are a sequential-prefix
    problem (a token's grid position depends on every byte before it);
    those fall back to a driver-side parse, bounded by the format's
    interchange-sized reality, then parallelize."""
    with open(path, "rb") as fh:
        head = fh.read(4096).decode("ascii", "replace")
    lines = head.splitlines()
    if not lines or lines[0].strip() != "DSAA":
        raise ValueError("surfer: missing DSAA magic")
    w, h = (int(t) for t in lines[1].split())
    header_len = sum(len(ln) + 2 for ln in lines[:5])  # CRLF
    cw = 18
    row_len = w * cw + 2

    if os.path.getsize(path) == header_len + h * row_len:
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
                        y0 = blk * block_rows  # top-down
                        rows = min(block_rows, h - y0)
                        frow0 = h - (y0 + rows)
                        blob = os.pread(fd, rows * row_len,
                                        header_len + frow0 * row_len)
                        arr = np.array([
                            [float(ln[i * cw:(i + 1) * cw])
                             for i in range(w)]
                            for ln in blob.decode("ascii")
                            .splitlines()])[::-1]
                        yy, xx = np.mgrid[0:rows, 0:w]
                        vals = arr.ravel()
                        keep = ~np.isclose(vals, BLANK_F64, rtol=1e-6)
                        yield pd.DataFrame({
                            "gy": (yy.ravel() + y0).astype(
                                np.int64)[keep],
                            "gx": xx.ravel().astype(np.int64)[keep],
                            "val": vals[keep],
                        })
            finally:
                os.close(fd)

        return slabs.mapInPandas(
            read_slab, "gy long, gx long, val double")

    # foreign wrap: sequential token scan on the driver (bounded:
    # DSAA is an interchange format), then parallelize
    toks: list[float] = []
    with open(path) as fh:
        for i, ln in enumerate(fh):
            if i >= 5:
                toks.extend(float(t) for t in ln.split())
    if len(toks) != w * h:
        raise ValueError(f"surfer: expected {w * h} values, "
                         f"got {len(toks)}")
    arr = np.array(toks).reshape(h, w)[::-1]  # to top-down
    yy, xx = np.mgrid[0:h, 0:w]
    vals = arr.ravel()
    keep = ~np.isclose(vals, BLANK_F64, rtol=1e-6)
    pdf = pd.DataFrame({
        "gy": yy.ravel().astype(np.int64)[keep],
        "gx": xx.ravel().astype(np.int64)[keep],
        "val": vals[keep]})
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# Surfer 7 (GS7BG) — the tagged-section sibling (frmts/gsg/gs7bgdataset.cpp)
# ---------------------------------------------------------------------------

_S7_HEADER_TAG = 0x42525344  # 'DSRB' on disk (little-endian)
_S7_GRID_TAG = 0x44495247    # 'GRID'
_S7_DATA_TAG = 0x41544144    # 'DATA'


def parse_gs7bg_header(path: str) -> dict:
    """Walk the tagged sections (gs7bgdataset.cpp:519-745): DSRB header
    first, unknown sections skipped by size, GRID's 72-byte info block
    (rows, cols, minX, minY, dx, dy, minZ, maxZ, rotation, blank), then
    DATA — whose payload offset is returned."""
    with open(path, "rb") as fh:
        tag, size = struct.unpack("<2i", fh.read(8))
        if tag != _S7_HEADER_TAG:
            raise ValueError("surfer7: missing DSRB header tag")
        fh.seek(size, os.SEEK_CUR)  # version section
        while True:
            head = fh.read(8)
            if len(head) < 8:
                raise ValueError("surfer7: no GRID section")
            tag, size = struct.unpack("<2i", head)
            if tag == _S7_GRID_TAG:
                break
            fh.seek(size, os.SEEK_CUR)
        if size != 72:
            raise ValueError(f"surfer7: GRID info size {size} != 72")
        h, w = struct.unpack("<2i", fh.read(8))
        (minx, miny, dx, dy, zmin, zmax, rot,
         blank) = struct.unpack("<8d", fh.read(64))
        tag, size = struct.unpack("<2i", fh.read(8))
        if tag != _S7_DATA_TAG:
            raise ValueError("surfer7: GRID not followed by DATA")
        if size < w * h * 8:
            raise ValueError("surfer7: DATA shorter than rows*cols")
        return {"w": w, "h": h, "minx": minx, "miny": miny,
                "dx": dx, "dy": dy, "zmin": zmin, "zmax": zmax,
                "blank": blank, "data0": fh.tell()}


def read_gs7bg(spark: SparkSession, path: str,
               block_rows: int = 64) -> DataFrame:
    """Distributed scan → (gy, gx, val double), gy top-down (the file's
    rows are bottom-up like DSBB); nodes at/above the blank value are
    dropped (gs7bgdataset.cpp:191)."""
    hdr = parse_gs7bg_header(path)
    w, h = hdr["w"], hdr["h"]
    blank, data0 = hdr["blank"], hdr["data0"]
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
                    frow0 = h - (y0 + rows)
                    blob = os.pread(fd, rows * w * 8,
                                    data0 + frow0 * w * 8)
                    arr = np.frombuffer(blob, dtype="<f8").reshape(
                        rows, w)[::-1]
                    yy, xx = np.mgrid[0:rows, 0:w]
                    vals = arr.ravel()
                    keep = vals < blank * (1 - 1e-9)
                    yield pd.DataFrame({
                        "gy": (yy.ravel() + y0).astype(np.int64)[keep],
                        "gx": xx.ravel().astype(np.int64)[keep],
                        "val": vals[keep],
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(read_slab, "gy long, gx long, val double")


def write_gs7bg(
    cells: DataFrame, path: str, w: int, h: int,
    *, xlo: float = 0.0, ylo: float = 0.0, cell: float = 1.0,
    block_rows: int = 64,
) -> None:
    """Distributed sink over (gy, gx, val): tagged header sections +
    blank-filled DATA payload driver-side, one row-block pwrite per
    task at the flipped offset."""
    stats = cells.agg(F.min("val").alias("lo"),
                      F.max("val").alias("hi")).collect()[0]
    blank = BLANK_F64
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(struct.pack("<3i", _S7_HEADER_TAG, 4, 1))
        fh.write(struct.pack("<2i", _S7_GRID_TAG, 72))
        fh.write(struct.pack("<2i", h, w))
        fh.write(struct.pack(
            "<8d", xlo, ylo, cell, cell,
            float(stats["lo"]), float(stats["hi"]), 0.0, blank))
        fh.write(struct.pack("<2i", _S7_DATA_TAG, w * h * 8))
        data0 = fh.tell()
        row = np.full(w, blank, dtype="<f8").tobytes()
        for _ in range(h):
            fh.write(row)

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w), blank, dtype="<f8")
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64)] = pdf["val"].to_numpy()
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, buf[::-1].tobytes(order="C"),
                      data0 + (h - (y0 + rows)) * w * 8)
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
