"""PCI .aux-labelled raw raster driver (PAux) — from-scratch codec of
the PUBLIC PCI Geomatics auxiliary-header raw format (reference
``frmts/raw/pauxdataset.cpp``).

Format: a keyword-per-line text ``.aux`` sidecar next to an unlabelled
raw file —

    AuxilaryTarget: <raw file name>        (sic — the PCI spelling)
    RawDefinition: <width> <height> <nbands>
    ChanDefinition-<n>: <type> <offset> <pixeloffset> <lineoffset>
                        [Swapped|Unswapped]

with type one of ``8U``/``16S``/``16U``/``32R``
(pauxdataset.cpp:649-659; anything else reads as 8U), byte offsets in
BYTES, and the optional 5th token naming the byte order (``Swapped``
means byte-swapped relative to big-endian — i.e. little-endian;
pauxdataset.cpp:663-668).  The per-channel (offset, pixeloffset,
lineoffset) triple makes the format interleave-agnostic: this driver
WRITES band-sequential (BSQ) triples but READS whatever the triples
describe.

Spark mapping — the one-task-per-slab raw-raster contract
(sources/ehdr.py): driver parses the tiny .aux; each (band, row-block)
slab preads its rows through the channel's declared strides; the sink
pre-extends the raw file and slab tasks pwrite disjoint ranges."""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {"8U": "u1", "16S": "<i2", "16U": "<u2", "32R": "<f4"}
_OF_NP = {"u1": "8U", "i2": "16S", "u2": "16U", "f4": "32R"}


def parse_aux(aux_path: str) -> dict:
    kv: dict[str, str] = {}
    with open(aux_path) as fh:
        for line in fh:
            if ":" in line:
                k, v = line.split(":", 1)
                kv[k.strip()] = v.strip()
    if "AuxilaryTarget" not in kv:
        raise ValueError("paux: missing AuxilaryTarget keyword")
    if "RawDefinition" not in kv:
        raise ValueError("paux: missing RawDefinition")
    w, h, nbands = (int(t) for t in kv["RawDefinition"].split()[:3])
    chans = []
    for i in range(1, nbands + 1):
        toks = kv[f"ChanDefinition-{i}"].split()
        if toks[0] not in _DTYPES:
            raise ValueError(f"paux: unsupported channel type {toks[0]!r}")
        dt = _DTYPES[toks[0]]
        if len(toks) > 4 and toks[4] == "Unswapped":
            dt = dt.replace("<", ">")
        chans.append({
            "dtype": dt, "offset": int(toks[1]),
            "pixel_off": int(toks[2]), "line_off": int(toks[3]),
        })
    raw = os.path.join(os.path.dirname(aux_path) or ".",
                       kv["AuxilaryTarget"])
    return {"w": w, "h": h, "bands": nbands, "chans": chans, "raw": raw}


def read_paux(spark: SparkSession, aux_path: str,
              block_rows: int = 64) -> DataFrame:
    """Distributed scan → (band, gy, gx, val double): one task per
    (band, row-block) slab, each pread bounded by the channel's
    declared line stride."""
    hdr = parse_aux(aux_path)
    w, h, bands = hdr["w"], hdr["h"], hdr["bands"]
    chans, raw = hdr["chans"], hdr["raw"]
    n_blocks = (h + block_rows - 1) // block_rows

    slabs = spark.range(bands * n_blocks).toDF("slab").repartition(
        min(bands * n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(raw, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    b, blk = divmod(int(s), n_blocks)
                    ch = chans[b]
                    np_dt = np.dtype(ch["dtype"])
                    item = np_dt.itemsize
                    y0 = blk * block_rows
                    rows = min(block_rows, h - y0)
                    out = np.empty((rows, w), dtype=np.float64)
                    for r in range(rows):
                        pos = ch["offset"] + (y0 + r) * ch["line_off"]
                        blob = os.pread(
                            fd, (w - 1) * ch["pixel_off"] + item, pos)
                        a = np.frombuffer(blob, dtype=np.uint8)
                        vals = np.lib.stride_tricks.as_strided(
                            a, shape=(w, item),
                            strides=(ch["pixel_off"], 1)).copy()
                        out[r] = vals.view(np_dt).ravel().astype(
                            np.float64)
                    yy, xx = np.mgrid[0:rows, 0:w]
                    yield pd.DataFrame({
                        "band": np.full(out.size, b, dtype=np.int64),
                        "gy": (yy.ravel() + y0).astype(np.int64),
                        "gx": xx.ravel().astype(np.int64),
                        "val": out.ravel(),
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(
        read_slab, "band long, gy long, gx long, val double")


def write_paux(
    cells: DataFrame, aux_path: str, w: int, h: int, bands: int,
    *, dtype: str = "i2", block_rows: int = 64, fill: float = 0.0,
) -> None:
    """Distributed BSQ sink over (band, gy, gx, val): .aux sidecar +
    pre-extended raw driver-side, one (band, row-block) pwrite per
    slab task."""
    if dtype not in _OF_NP:
        raise ValueError(f"paux write: unsupported dtype {dtype!r}")
    np_dt = np.dtype("<" + dtype if dtype != "u1" else dtype)
    item = np_dt.itemsize
    base = aux_path[:-4] if aux_path.endswith(".aux") else aux_path
    raw = base + ".raw"
    os.makedirs(os.path.dirname(aux_path) or ".", exist_ok=True)
    with open(aux_path, "w") as fh:
        fh.write(f"AuxilaryTarget: {os.path.basename(raw)}\n")
        fh.write(f"RawDefinition: {w} {h} {bands}\n")
        for b in range(bands):
            off = b * h * w * item
            fh.write(f"ChanDefinition-{b + 1}: {_OF_NP[dtype]} {off} "
                     f"{item} {w * item} Swapped\n")
    with open(raw, "wb") as fh:
        if fill == 0.0:
            fh.truncate(bands * h * w * item)
        else:
            row = np.full(w, fill, dtype=np_dt).tobytes()
            for _ in range(bands * h):
                fh.write(row)

    n_blocks = (h + block_rows - 1) // block_rows

    def write_slab(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b, blk = int(key[0]), int(key[1])
        y0 = blk * block_rows
        rows = min(block_rows, h - y0)
        buf = np.full((rows, w), fill, dtype=np_dt)
        buf[pdf["gy"].to_numpy(np.int64) - y0,
            pdf["gx"].to_numpy(np.int64)] = (
            pdf["val"].to_numpy().astype(np_dt, copy=False))
        fd = os.open(raw, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"),
                      (b * h + y0) * w * item)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [blk], "n": [len(pdf)]})

    (
        cells.withColumn(
            "_slab",
            F.floor(F.col("gy") / F.lit(block_rows)).cast("long"))
        .groupBy("band", "_slab")
        .applyInPandas(write_slab, "slab long, n long")
        .collect()
    )
