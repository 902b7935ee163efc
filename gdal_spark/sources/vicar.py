"""VICAR raster driver — from-scratch codec of the PUBLIC NASA/JPL
VICAR file format (reference ``frmts/pds/vicardataset.cpp``; layout per
the public VICAR File Format spec the reference implements).

Format — the engine's only SELF-SIZING ASCII label:

* the file STARTS with ``LBLSIZE=<n>`` — the label's own byte length,
  which a reader must parse before it can parse anything else; the
  label is ``KEY=VALUE`` pairs separated by spaces (string values in
  single quotes), padded with NULs/spaces to exactly ``n`` bytes, and
  the reference rounds ``n`` up to a multiple of RECSIZE
  (vicardataset.cpp:1558 "round it to the next multiple of RECSIZE");
* geometry keys: NL (lines), NS (samples), NB (bands), ORG='BSQ',
  FORMAT='BYTE'|'HALF'|'FULL'|'REAL', INTFMT='LOW' (little-endian),
  REALFMT='RIEEE' (IEEE little-endian), RECSIZE = NBB + NS*itemsize;
* data records follow the label: first NLB binary-header records
  (skipped), then per band per line one record of NBB binary-prefix
  bytes + NS samples (vicardataset.cpp:953 applies the NBB offset on
  every line read) — this driver is the engine's only format with a
  per-RECORD binary prefix, so the gate pins the strided-skip path.

Spark mapping — the one-task-per-slab raw-raster contract
(sources/ehdr.py): the driver parses only the label; read parallelizes
one (band, row-block) slab per task, each ``pread``-ing its contiguous
record range and dropping the NBB prefixes with a strided view; write
pre-extends the file driver-side and one task per (band, row-block)
``pwrite``s its records.  No pixel bytes touch the driver.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = {"BYTE": "u1", "HALF": "<i2", "FULL": "<i4", "REAL": "<f4"}
_OF_NP = {"u1": "BYTE", "i2": "HALF", "i4": "FULL", "f4": "REAL"}


def vicar_label_bytes(w: int, h: int, bands: int, fmt: str,
                      nbb: int, nlb: int) -> bytes:
    """Self-sizing label: LBLSIZE names the padded label length, itself
    rounded up to a RECSIZE multiple (the reference's write rule)."""
    item = np.dtype(_FORMATS[fmt]).itemsize
    recsize = nbb + w * item
    body = (
        f"  FORMAT='{fmt}'  TYPE='IMAGE'  BUFSIZ={recsize}  DIM=3"
        f"  EOL=0  RECSIZE={recsize}  ORG='BSQ'  NL={h}  NS={w}  NB={bands}"
        f"  N1={w}  N2={h}  N3={bands}  N4=0  NBB={nbb}  NLB={nlb}"
        "  HOST='X86-64-LINX'  INTFMT='LOW'  REALFMT='RIEEE'"
        "  BHOST='X86-64-LINX'  BINTFMT='LOW'  BREALFMT='RIEEE'"
        "  BLTYPE=''"
    )
    # LBLSIZE= plus up to 10 digits, then round the whole label up to a
    # RECSIZE multiple (vicardataset.cpp:1558-1564)
    n = len("LBLSIZE=") + 10 + len(body)
    n = ((n + recsize - 1) // recsize) * recsize
    head = f"LBLSIZE={n}".ljust(len("LBLSIZE=") + 10)
    return (head + body).encode("ascii").ljust(n, b"\x00")


def parse_vicar_label(path: str) -> dict:
    """Two-phase parse: read enough bytes to find LBLSIZE, then tokenize
    exactly that many bytes of KEY=VALUE pairs."""
    with open(path, "rb") as fh:
        probe = fh.read(64)
        if not probe.startswith(b"LBLSIZE="):
            raise ValueError("vicar: file does not start with LBLSIZE=")
        lblsize = int(probe[8:].split()[0])
        fh.seek(0)
        label = fh.read(lblsize).rstrip(b"\x00").decode("ascii", "replace")
    kv: dict[str, str] = {}
    for tok in label.split():
        if "=" in tok:
            k, _, v = tok.partition("=")
            kv[k.upper()] = v.strip("'")
    fmt = kv.get("FORMAT", "BYTE").upper()
    if fmt not in _FORMATS:
        raise ValueError(f"vicar: unsupported FORMAT={fmt!r}")
    if kv.get("INTFMT", "LOW").upper() != "LOW":
        raise ValueError("vicar: only INTFMT='LOW' supported")
    if kv.get("REALFMT", "RIEEE").upper() != "RIEEE":
        raise ValueError("vicar: only REALFMT='RIEEE' supported")
    if kv.get("ORG", "BSQ").upper() != "BSQ":
        raise ValueError("vicar: only ORG='BSQ' supported")
    w = int(kv["NS"])
    item = np.dtype(_FORMATS[fmt]).itemsize
    nbb = int(kv.get("NBB", "0"))
    return {
        "lblsize": lblsize, "w": w, "h": int(kv["NL"]),
        "bands": int(kv.get("NB", "1")), "dtype": _FORMATS[fmt],
        "nbb": nbb, "nlb": int(kv.get("NLB", "0")),
        "recsize": int(kv.get("RECSIZE", str(nbb + w * item))),
    }


def read_vicar(spark: SparkSession, path: str,
               block_rows: int = 64) -> DataFrame:
    """Distributed BSQ scan → (band, gy, gx, val double): one task per
    (band, row-block); each record's NBB binary prefix is dropped by a
    strided reshape, NLB binary-header records are skipped up front."""
    hdr = parse_vicar_label(path)
    w, h, bands = hdr["w"], hdr["h"], hdr["bands"]
    np_dt = np.dtype(hdr["dtype"])
    recsize, nbb = hdr["recsize"], hdr["nbb"]
    data0 = hdr["lblsize"] + hdr["nlb"] * recsize
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(bands * n_blocks).toDF("slab").repartition(
        min(bands * n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    b, blk = divmod(int(s), n_blocks)
                    y0 = blk * block_rows
                    rows = min(block_rows, h - y0)
                    pos = data0 + (b * h + y0) * recsize
                    blob = os.pread(fd, rows * recsize, pos)
                    # one record = nbb prefix bytes + w samples; view as
                    # byte rows, slice off the prefix, then recast
                    arr = np.frombuffer(blob, dtype="u1").reshape(
                        rows, recsize)[:, nbb:].copy().view(np_dt)
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


def write_vicar(
    cells: DataFrame, path: str, w: int, h: int, bands: int,
    *, dtype: str = "i2", nbb: int = 0, block_rows: int = 64,
    fill: float = 0.0,
) -> None:
    """Distributed BSQ sink over (band, gy, gx, val): label + pre-extended
    data driver-side, one task per (band, row-block) ``pwrite``s its
    records (NBB prefix bytes left as the pre-extension's zeros)."""
    if dtype not in _OF_NP:
        raise ValueError(f"vicar write: unsupported dtype {dtype!r}")
    fmt = _OF_NP[dtype]
    np_dt = np.dtype(_FORMATS[fmt])
    item = np_dt.itemsize
    recsize = nbb + w * item
    label = vicar_label_bytes(w, h, bands, fmt, nbb, 0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(label)
        if fill == 0.0:
            fh.truncate(len(label) + bands * h * recsize)  # sparse zeros
        else:
            rec = b"\x00" * nbb + np.full(w, fill, dtype=np_dt).tobytes()
            for _ in range(bands * h):
                fh.write(rec)
    lblsize = len(label)
    n_blocks = (h + block_rows - 1) // block_rows

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        slab = int(key[0])
        b, blk = divmod(slab, n_blocks)
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.zeros((rows, recsize), dtype="u1")
        px = buf[:, nbb:].view(np_dt)
        if fill != 0.0:
            px[:] = fill
        px[pdf["gy"].to_numpy(np.int64) - y0,
           pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype(np_dt, copy=False))
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"),
                      lblsize + (b * h + y0) * recsize)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [slab], "n": [len(pdf)]})

    (
        cells.withColumn(
            "_slab",
            (F.col("band") * F.lit(n_blocks)
             + F.floor(F.col("gy") / F.lit(block_rows))).cast("long"))
        .groupBy("_slab")
        .applyInPandas(write_slab, "slab long, n long")
        .collect()  # bounded: one row per (band, row-block)
    )
