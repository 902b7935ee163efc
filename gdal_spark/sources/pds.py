"""PDS3 raster driver — from-scratch codec of the PUBLIC NASA Planetary
Data System v3 labelled-image format (reference
``frmts/pds/pdsdataset.cpp``; layout per the public PDS3 Standards
Reference the reference implements).

Format — an ODL (``KEYWORD = VALUE``) label of FIXED_LENGTH records:

* the label occupies LABEL_RECORDS records of RECORD_BYTES bytes and
  ends with ``END``; the image pointer ``^IMAGE = <n>`` is a 1-BASED
  RECORD number (pdsdataset.cpp:787-793 enumerates the pointer forms;
  this driver implements the attached ``^IMAGE = n`` record form and
  the ``^IMAGE = n <BYTES>`` byte form);
* OBJECT = IMAGE carries LINES, LINE_SAMPLES, BANDS,
  BAND_STORAGE_TYPE = BAND_SEQUENTIAL, SAMPLE_BITS (8/16/32) and
  SAMPLE_TYPE — MSB_INTEGER / MSB_UNSIGNED_INTEGER / IEEE_REAL are
  BIG-endian, LSB_INTEGER / LSB_UNSIGNED_INTEGER / PC_REAL little
  (pdsdataset.cpp:997-1080 maps the same names);
* image records follow the pointer, band-sequential, one line per
  RECORD_BYTES (= LINE_SAMPLES * itemsize here).

The novelty vs the engine's other raw drivers: the data offset is not
a fixed header size but label-driven (records × RECORD_BYTES), so the
gate pins the pointer arithmetic, in the format's classic MSB flavor.

Spark mapping — the one-task-per-slab raw-raster contract
(sources/ehdr.py): parse only the label driver-side; one (band,
row-block) ``pread``/``pwrite`` per task.  No pixel bytes touch the
driver.
"""

from __future__ import annotations

import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (SAMPLE_TYPE, SAMPLE_BITS) -> numpy dtype (endianness explicit)
_SAMPLE_TYPES = {
    ("MSB_INTEGER", 16): ">i2", ("MSB_INTEGER", 32): ">i4",
    ("MSB_UNSIGNED_INTEGER", 8): "u1", ("MSB_UNSIGNED_INTEGER", 16): ">u2",
    ("UNSIGNED_INTEGER", 8): "u1",
    ("LSB_INTEGER", 16): "<i2", ("LSB_INTEGER", 32): "<i4",
    ("LSB_UNSIGNED_INTEGER", 8): "u1", ("LSB_UNSIGNED_INTEGER", 16): "<u2",
    ("IEEE_REAL", 32): ">f4", ("PC_REAL", 32): "<f4",
}
_OF_NP = {"u1": ("MSB_UNSIGNED_INTEGER", 8), "i2": ("MSB_INTEGER", 16),
          "i4": ("MSB_INTEGER", 32), "f4": ("IEEE_REAL", 32)}


def pds_label_bytes(w: int, h: int, bands: int, dtype: str) -> bytes:
    """ODL label padded to a whole number of RECORD_BYTES records; the
    ^IMAGE pointer names the first data record, 1-based."""
    sample_type, bits = _OF_NP[dtype]
    item = bits // 8
    record_bytes = w * item
    lines = [
        "PDS_VERSION_ID            = PDS3",
        "RECORD_TYPE               = FIXED_LENGTH",
        f"RECORD_BYTES              = {record_bytes}",
        "LABEL_RECORDS             = @LR@",
        "^IMAGE                    = @PTR@",
        "OBJECT                    = IMAGE",
        f"  LINES                   = {h}",
        f"  LINE_SAMPLES            = {w}",
        f"  BANDS                   = {bands}",
        "  BAND_STORAGE_TYPE       = BAND_SEQUENTIAL",
        f"  SAMPLE_BITS             = {bits}",
        f"  SAMPLE_TYPE             = {sample_type}",
        "END_OBJECT                = IMAGE",
        "END",
    ]
    # fixed-width @LR@/@PTR@ slots keep the label size independent of
    # the substituted digits, so one sizing pass suffices
    body = "\r\n".join(lines) + "\r\n"
    n = len(body) - len("@LR@") - len("@PTR@") + 12  # 6 digits each
    label_records = (n + record_bytes - 1) // record_bytes
    body = body.replace("@LR@", f"{label_records:<6d}").replace(
        "@PTR@", f"{label_records + 1:<6d}")
    return body.encode("ascii").ljust(label_records * record_bytes, b" ")


_KV_RE = re.compile(r"^\s*(\^?[A-Z0-9_:]+)\s*=\s*(.+?)\s*$")


def parse_pds_label(path: str) -> dict:
    """Parse the ODL label: scan KEYWORD = VALUE lines until END, then
    resolve the ^IMAGE pointer (records unless suffixed <BYTES>)."""
    kv: dict[str, str] = {}
    with open(path, "rb") as fh:
        head = fh.read(65536)
    for raw in head.decode("ascii", "replace").splitlines():
        m = _KV_RE.match(raw)
        if m:
            kv[m.group(1).upper()] = m.group(2).strip().strip('"')
        if raw.strip() == "END":
            break
    else:
        raise ValueError("pds: no END statement in the first 64 KiB")
    if kv.get("PDS_VERSION_ID", "PDS3") != "PDS3":
        raise ValueError("pds: only PDS_VERSION_ID = PDS3 supported")
    record_bytes = int(kv["RECORD_BYTES"])
    ptr = kv.get("^IMAGE")
    if ptr is None:
        raise ValueError("pds: no ^IMAGE pointer (detached files "
                         "unsupported)")
    if "<BYTES>" in ptr:
        # byte form: 1-based byte offset (pdsdataset.cpp:793)
        data0 = int(ptr.replace("<BYTES>", "").strip()) - 1
    else:
        data0 = (int(ptr) - 1) * record_bytes  # 1-based record number
    bits = int(kv.get("SAMPLE_BITS", "8"))
    st = kv.get("SAMPLE_TYPE", "MSB_UNSIGNED_INTEGER").upper()
    if (st, bits) not in _SAMPLE_TYPES:
        raise ValueError(f"pds: unsupported SAMPLE_TYPE={st!r} "
                         f"SAMPLE_BITS={bits}")
    if kv.get("BAND_STORAGE_TYPE",
              "BAND_SEQUENTIAL").upper() != "BAND_SEQUENTIAL":
        raise ValueError("pds: only BAND_SEQUENTIAL storage supported")
    return {
        "w": int(kv["LINE_SAMPLES"]), "h": int(kv["LINES"]),
        "bands": int(kv.get("BANDS", "1")),
        "dtype": _SAMPLE_TYPES[(st, bits)],
        "record_bytes": record_bytes, "data0": data0,
    }


def read_pds(spark: SparkSession, path: str,
             block_rows: int = 64) -> DataFrame:
    """Distributed band-sequential scan → (band, gy, gx, val double);
    one (band, row-block) pread per task at the label-resolved offset."""
    hdr = parse_pds_label(path)
    w, h, bands = hdr["w"], hdr["h"], hdr["bands"]
    np_dt = np.dtype(hdr["dtype"])
    item = np_dt.itemsize
    rec, data0 = hdr["record_bytes"], hdr["data0"]
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
                    pos = data0 + (b * h + y0) * rec
                    blob = os.pread(fd, rows * rec, pos)
                    arr = np.frombuffer(blob, dtype="u1").reshape(
                        rows, rec)[:, : w * item].copy().view(np_dt)
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


def write_pds(
    cells: DataFrame, path: str, w: int, h: int, bands: int,
    *, dtype: str = "i2", block_rows: int = 64, fill: float = 0.0,
) -> None:
    """Distributed band-sequential sink: ODL label + pre-extended data
    driver-side, one (band, row-block) pwrite per task."""
    if dtype not in _OF_NP:
        raise ValueError(f"pds write: unsupported dtype {dtype!r}")
    st, bits = _OF_NP[dtype]
    np_dt = np.dtype(_SAMPLE_TYPES[(st, bits)])
    item = np_dt.itemsize
    rec = w * item
    label = pds_label_bytes(w, h, bands, dtype)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(label)
        if fill == 0.0:
            fh.truncate(len(label) + bands * h * rec)  # sparse zeros
        else:
            row = np.full(w, fill, dtype=np_dt).tobytes()
            for _ in range(bands * h):
                fh.write(row)
    data0 = len(label)
    n_blocks = (h + block_rows - 1) // block_rows

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        slab = int(key[0])
        b, blk = divmod(slab, n_blocks)
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w), fill, dtype=np_dt)
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype(np_dt, copy=False))
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"),
                      data0 + (b * h + y0) * rec)
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
