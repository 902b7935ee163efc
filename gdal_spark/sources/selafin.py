"""OGR Selafin (Telemac SERAFIN) driver — from-scratch codec of the
PUBLIC SERAFIN mesh format (reference
``ogr/ogrsf_frmts/selafin/io_selafin.cpp``, ``ogrselafinlayer.cpp``).

A SERAFIN file is a stream of Fortran unformatted sequential records —
every record framed by a 4-byte BIG-endian byte count before AND after
the payload (io_selafin.cpp:376-415 reads the leading count, the
trailing one closes the frame):

  1.  title, 80 bytes (72 title chars + 8-char format tag "SERAFIN ")
  2.  NBV1, NBV2 (two int32; NBV2 = 0)
  3.  NBV1 records of 32 chars — 16-char variable name + 16-char unit
  4.  IPARAM, 10 int32 (IPARAM[9]=1 would add a date record; 0 here)
  5.  NELEM, NPOIN, NDP, 1 (four int32; NDP = nodes per element, 3
      for triangles)
  6.  IKLE connectivity — NELEM*NDP int32, 1-BASED node ids
      (ogrselafinlayer.cpp element layer subtracts the 1)
  7.  IPOBO boundary markers — NPOIN int32
  8.  X — NPOIN float32;  9. Y — NPOIN float32
  10. per timestep: a 1-float32 time record, then NBV1 records of
      NPOIN float32 (one per variable)

All numerics are BIG-endian (the format's Fortran heritage).

Spark mapping — header/offsets parse driver-side (a few hundred
bytes); the node arrays (X, Y, per-variable values) and the IKLE
connectivity are fixed-stride payloads, so read parallelizes one
node-range (or element-range) slab per task ``pread``-ing disjoint
ranges of each record's payload; write pre-frames the file driver-side
and slab tasks ``pwrite`` their ranges.  No mesh bytes touch the
driver."""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _frame(payload: bytes) -> bytes:
    n = struct.pack(">i", len(payload))
    return n + payload + n


def header_layout(npoin: int, nelem: int, ndp: int,
                  variables: list[str]) -> dict:
    """Byte offsets of every payload, computed from the counts alone
    (each record adds 8 framing bytes)."""
    off = 0
    out: dict[str, int] = {}
    def rec(name: str, size: int):
        nonlocal off
        out[name] = off + 4  # payload starts after the leading count
        off += size + 8
    rec("title", 80)
    rec("nbv", 8)
    for i in range(len(variables)):
        rec(f"var{i}", 32)
    rec("iparam", 40)
    rec("counts", 16)
    rec("ikle", nelem * ndp * 4)
    rec("ipobo", npoin * 4)
    rec("x", npoin * 4)
    rec("y", npoin * 4)
    rec("time", 4)
    for i in range(len(variables)):
        rec(f"val{i}", npoin * 4)
    out["end"] = off
    return out


def parse_header(path: str) -> dict:
    """Driver-side parse of the fixed-layout head: title/format tag,
    variable names, NELEM/NPOIN/NDP, and the payload offset map."""
    with open(path, "rb") as fh:
        def record() -> bytes:
            n = struct.unpack(">i", fh.read(4))[0]
            if n < 0 or n > 1 << 30:
                raise ValueError(f"selafin: bad record length {n}")
            payload = fh.read(n)
            tail = struct.unpack(">i", fh.read(4))[0]
            if tail != n:
                raise ValueError("selafin: record frame mismatch")
            return payload

        title = record()
        if len(title) != 80 or title[72:].rstrip() not in (
                b"SERAFIN", b"SERAFIND"):
            raise ValueError("selafin: missing SERAFIN format tag")
        nbv1, nbv2 = struct.unpack(">2i", record())
        variables = [record()[:16].decode("ascii").rstrip()
                     for _ in range(nbv1 + nbv2)]
        iparam = struct.unpack(">10i", record())
        if iparam[9] == 1:
            record()  # date record — tolerated, not exposed
        nelem, npoin, ndp, _one = struct.unpack(">4i", record())
    lay = header_layout(npoin, nelem, ndp, variables)
    if iparam[9] == 1:  # the optional date shifts everything after it
        for k in ("ikle", "ipobo", "x", "y", "time", "end"):
            lay[k] += 32
        for i in range(len(variables)):
            lay[f"val{i}"] += 32
    return {"title": title[:72].decode("ascii").rstrip(),
            "variables": variables, "nelem": nelem, "npoin": npoin,
            "ndp": ndp, "layout": lay}


def read_selafin_nodes(spark: SparkSession, path: str,
                       block: int = 4096) -> DataFrame:
    """Distributed node scan → (node, x, y, v0..vk double): one task
    per node-range slab, three+k preads per slab (one per record, each
    a disjoint stride of the same node range).  node is 0-based."""
    hdr = parse_header(path)
    npoin, lay = hdr["npoin"], hdr["layout"]
    nvar = len(hdr["variables"])
    n_blocks = (npoin + block - 1) // block

    slabs = spark.range(n_blocks).toDF("slab").repartition(
        min(n_blocks, 32), "slab")
    vcols = [f"v{i}" for i in range(nvar)]
    schema = "node long, x double, y double, " + ", ".join(
        f"{c} double" for c in vcols)

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    i0 = int(s) * block
                    n = min(block, npoin - i0)
                    def arr(key: str) -> np.ndarray:
                        blob = os.pread(fd, n * 4, lay[key] + i0 * 4)
                        return np.frombuffer(blob, dtype=">f4").astype(
                            np.float64)
                    rec = {"node": np.arange(i0, i0 + n, dtype=np.int64),
                           "x": arr("x"), "y": arr("y")}
                    for i, c in enumerate(vcols):
                        rec[c] = arr(f"val{i}")
                    yield pd.DataFrame(rec)
        finally:
            os.close(fd)

    return slabs.mapInPandas(read_slab, schema)


def read_selafin_elements(spark: SparkSession, path: str,
                          block: int = 4096) -> DataFrame:
    """Distributed element scan → (elem, n0, n1, n2 long) with 0-based
    node ids (the file's IKLE is 1-based; ogrselafinlayer.cpp applies
    the same shift)."""
    hdr = parse_header(path)
    nelem, ndp, lay = hdr["nelem"], hdr["ndp"], hdr["layout"]
    if ndp != 3:
        raise ValueError(f"selafin: only triangle meshes (NDP=3), "
                         f"got NDP={ndp}")
    n_blocks = (nelem + block - 1) // block
    slabs = spark.range(n_blocks).toDF("slab").repartition(
        min(n_blocks, 32), "slab")

    def read_slab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for s in pdf["slab"].to_numpy():
                    e0 = int(s) * block
                    n = min(block, nelem - e0)
                    blob = os.pread(fd, n * ndp * 4,
                                    lay["ikle"] + e0 * ndp * 4)
                    ik = np.frombuffer(blob, dtype=">i4").reshape(
                        n, ndp).astype(np.int64) - 1
                    yield pd.DataFrame({
                        "elem": np.arange(e0, e0 + n, dtype=np.int64),
                        "n0": ik[:, 0], "n1": ik[:, 1], "n2": ik[:, 2],
                    })
        finally:
            os.close(fd)

    return slabs.mapInPandas(read_slab, "elem long, n0 long, n1 long, "
                                        "n2 long")


def write_selafin(
    nodes: DataFrame, elements: DataFrame | None, path: str,
    npoin: int, nelem: int, *, variables: list[str],
    title: str = "gdal_spark mesh", time_s: float = 0.0,
    block: int = 4096,
) -> None:
    """Distributed sink: frames + head records driver-side, then one
    task per node-range slab pwrites its X/Y/value strides (and one
    per element-range slab its IKLE stride).  ``nodes`` carries
    (node, x, y, v0..), ``elements`` (elem, n0, n1, n2) 0-based."""
    ndp = 3
    lay = header_layout(npoin, nelem, ndp, variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(_frame(title[:72].ljust(72).encode("ascii") +
                        b"SERAFIN "))
        fh.write(_frame(struct.pack(">2i", len(variables), 0)))
        for v in variables:
            fh.write(_frame(v[:16].ljust(16).encode("ascii") + b" " * 16))
        fh.write(_frame(struct.pack(">10i", *([0] * 10))))
        fh.write(_frame(struct.pack(">4i", nelem, npoin, ndp, 1)))
        # empty frames for the array records; slab tasks fill payloads
        for key, count in (("ikle", nelem * ndp), ("ipobo", npoin),
                           ("x", npoin), ("y", npoin)):
            n = struct.pack(">i", count * 4)
            fh.write(n + b"\x00" * (count * 4) + n)
        fh.write(_frame(struct.pack(">f", time_s)))
        n = struct.pack(">i", npoin * 4)
        for _ in variables:
            fh.write(n + b"\x00" * (npoin * 4) + n)

    vcols = [f"v{i}" for i in range(len(variables))]

    def write_nodes(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        i0 = blk * block
        n = min(block, npoin - i0)
        fd = os.open(path, os.O_WRONLY)
        try:
            idx = pdf["node"].to_numpy(np.int64) - i0
            for col, k in [("x", "x"), ("y", "y")] + [
                    (c, f"val{i}") for i, c in enumerate(vcols)]:
                buf = np.zeros(n, dtype=">f4")
                buf[idx] = pdf[col].to_numpy(np.float64)
                os.pwrite(fd, buf.tobytes(), lay[k] + i0 * 4)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [blk], "n": [len(pdf)]})

    (nodes.withColumn("_slab", F.floor(F.col("node") / F.lit(block))
                      .cast("long"))
     .groupBy("_slab").applyInPandas(write_nodes, "slab long, n long")
     .collect())

    if elements is not None:
        def write_elems(key, pdf: pd.DataFrame) -> pd.DataFrame:
            blk = int(key[0])
            e0 = blk * block
            n = min(block, nelem - e0)
            buf = np.zeros((n, ndp), dtype=">i4")
            idx = pdf["elem"].to_numpy(np.int64) - e0
            for j, c in enumerate(("n0", "n1", "n2")):
                buf[idx, j] = pdf[c].to_numpy(np.int64) + 1  # 1-based
            fd = os.open(path, os.O_WRONLY)
            try:
                os.pwrite(fd, buf.tobytes(), lay["ikle"] + e0 * ndp * 4)
            finally:
                os.close(fd)
            return pd.DataFrame({"slab": [blk], "n": [len(pdf)]})

        (elements.withColumn("_slab", F.floor(F.col("elem") / F.lit(block))
                             .cast("long"))
         .groupBy("_slab").applyInPandas(write_elems, "slab long, n long")
         .collect())
