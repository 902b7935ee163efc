"""NTv2 datum-shift grid driver (.gsb) — from-scratch codec of the
PUBLIC Canadian NTv2 grid-shift format (reference
``frmts/raw/ntv2dataset.cpp``; the multi-subgrid sibling of the .gtx
vertical-shift driver).

Format (public spec; quirks preserved from the reference):

* 11 overview-header records of 16 bytes (8-char name + 8-byte value;
  ints are int32 + 4 pad bytes): NUM_OREC / NUM_SREC / NUM_FILE /
  GS_TYPE("SECONDS") / VERSION / SYSTEM_F / SYSTEM_T / MAJOR_F /
  MINOR_F / MAJOR_T / MINOR_T;
* per subgrid, 11 more records — SUB_NAME / PARENT / CREATED / UPDATED /
  S_LAT / N_LAT / E_LONG / W_LONG / LAT_INC / LONG_INC (all arc-seconds)
  / GS_COUNT — with longitudes stored POSITIVE WEST (the reference
  multiplies by -1 on read, ntv2dataset.cpp:439-440);
* GS_COUNT nodes of 4 little-endian float32: latitude shift (arc-sec),
  longitude shift (arc-sec, positive west), lat/lon accuracies; node
  rows run SOUTH→NORTH and within a row EAST→WEST (the reference remaps
  with negative RawRasterBand offsets, ntv2dataset.cpp:460-475).

Spark mapping: one task per (subgrid, row-block) on read (the engine's
slab contract); datum grids are dimension-scale, so the APPLY path
broadcasts the node arrays as Column literals and interpolates
bilinearly in pure JVM arithmetic — the shift of a fact-scale point
table is map-only.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_REC = 16


def _srec(name: bytes, val: bytes) -> bytes:
    return name.ljust(8)[:8] + val


def _drec(name: bytes, v: float) -> bytes:
    return _srec(name, struct.pack("<d", v))


def _irec(name: bytes, v: int) -> bytes:
    return _srec(name, struct.pack("<i", v) + b"\x00" * 4)


def ntv2_bytes(subgrids: list[dict]) -> bytes:
    """Serialize a .gsb.  Each subgrid dict: name, parent, s_lat, n_lat
    (deg), lon_min_e, lon_max_e (deg, POSITIVE EAST — converted to the
    spec's positive-west here), lat_inc, lon_inc (deg),
    lat_shift / lon_shift_w ((n_lat_rows, n_lon_cols) float arrays,
    arc-seconds, row 0 = SOUTH, col 0 = WEST)."""
    out = [
        _irec(b"NUM_OREC", 11), _irec(b"NUM_SREC", 11),
        _irec(b"NUM_FILE", len(subgrids)),
        _srec(b"GS_TYPE", b"SECONDS "), _srec(b"VERSION", b"NTv2.0  "),
        _srec(b"SYSTEM_F", b"NAD27   "), _srec(b"SYSTEM_T", b"NAD83   "),
        _drec(b"MAJOR_F", 6378206.4), _drec(b"MINOR_F", 6356583.8),
        _drec(b"MAJOR_T", 6378137.0), _drec(b"MINOR_T", 6356752.314),
    ]
    for sg in subgrids:
        la = np.asarray(sg["lat_shift"], dtype=np.float64)
        lo = np.asarray(sg["lon_shift_w"], dtype=np.float64)
        n_rows, n_cols = la.shape
        if lo.shape != la.shape:
            raise ValueError("ntv2: shift grids must share one shape")
        out += [
            _srec(b"SUB_NAME", sg["name"].encode().ljust(8)[:8]),
            _srec(b"PARENT", sg.get("parent", "NONE").encode()
                  .ljust(8)[:8]),
            _srec(b"CREATED", b"20260101"),
            _srec(b"UPDATED", b"20260101"),
            _drec(b"S_LAT", sg["s_lat"] * 3600.0),
            _drec(b"N_LAT", sg["n_lat"] * 3600.0),
            # POSITIVE WEST: the eastern edge is the most negative east
            _drec(b"E_LONG", -sg["lon_max_e"] * 3600.0),
            _drec(b"W_LONG", -sg["lon_min_e"] * 3600.0),
            _drec(b"LAT_INC", sg["lat_inc"] * 3600.0),
            _drec(b"LONG_INC", sg["lon_inc"] * 3600.0),
            _irec(b"GS_COUNT", n_rows * n_cols),
        ]
        # nodes: rows SOUTH->NORTH, within a row EAST->WEST
        nodes = np.zeros((n_rows, n_cols, 4), dtype="<f4")
        nodes[:, :, 0] = la[:, ::-1]
        nodes[:, :, 1] = lo[:, ::-1]
        out.append(nodes.tobytes(order="C"))
    return b"".join(out)


def parse_ntv2(buf: bytes) -> list[dict]:
    """→ list of subgrid dicts (degrees, POSITIVE-EAST longitudes,
    row 0 = south / col 0 = west arrays — the reference's remap)."""
    if buf[0:8] != b"NUM_OREC":
        raise ValueError("ntv2: missing NUM_OREC overview record")
    n_orec = struct.unpack_from("<i", buf, 8)[0]
    bo = "<"
    if n_orec != 11:  # big-endian producer
        if struct.unpack_from(">i", buf, 8)[0] != 11:
            raise ValueError("ntv2: cannot determine byte order")
        bo = ">"
    n_file = struct.unpack_from(f"{bo}i", buf, 2 * _REC + 8)[0]
    off = 11 * _REC
    out = []
    for _ in range(n_file):
        hdr = buf[off:off + 11 * _REC]
        name = hdr[8:16].decode("ascii").strip()
        parent = hdr[_REC + 8:_REC + 16].decode("ascii").strip()
        vals = [struct.unpack_from(f"{bo}d", hdr, i * _REC + 8)[0]
                for i in range(4, 10)]
        s_lat, n_lat, e_long_w, w_long_w, lat_inc, lon_inc = vals
        count = struct.unpack_from(f"{bo}i", hdr, 10 * _REC + 8)[0]
        n_cols = int(round((w_long_w - e_long_w) / lon_inc)) + 1
        n_rows = int(round((n_lat - s_lat) / lat_inc)) + 1
        if n_rows * n_cols != count:
            raise ValueError(
                f"ntv2: GS_COUNT {count} != {n_rows}x{n_cols} grid")
        off += 11 * _REC
        nodes = np.frombuffer(
            buf, dtype=f"{bo}f4", count=count * 4, offset=off
        ).reshape(n_rows, n_cols, 4)
        off += count * 16
        out.append({
            "name": name, "parent": parent,
            "s_lat": s_lat / 3600.0, "n_lat": n_lat / 3600.0,
            "lon_min_e": -w_long_w / 3600.0,
            "lon_max_e": -e_long_w / 3600.0,
            "lat_inc": lat_inc / 3600.0, "lon_inc": lon_inc / 3600.0,
            # undo the EAST->WEST storage so col 0 = west
            "lat_shift": nodes[:, ::-1, 0].astype(np.float64),
            "lon_shift_w": nodes[:, ::-1, 1].astype(np.float64),
        })
    return out


def read_ntv2(spark: SparkSession, path: str,
              block_rows: int = 64) -> DataFrame:
    """Distributed node scan → (grid, row, col, lat, lon, lat_shift_sec,
    lon_shift_w_sec); row 0 = south, lon POSITIVE EAST."""
    with open(path, "rb") as fh:
        grids = parse_ntv2(fh.read())
    slab_index = []
    for gi, g in enumerate(grids):
        n_rows = g["lat_shift"].shape[0]
        for blk in range((n_rows + block_rows - 1) // block_rows):
            slab_index.append((gi, blk))
    slabs = spark.createDataFrame(slab_index, "gi int, blk int") \
        .repartition(min(len(slab_index), 32))

    bgrids = spark.sparkContext.broadcast(grids)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for gi, blk in zip(pdf["gi"], pdf["blk"]):
                g = bgrids.value[int(gi)]
                la, lo = g["lat_shift"], g["lon_shift_w"]
                n_rows, n_cols = la.shape
                r0 = int(blk) * block_rows
                rows = min(block_rows, n_rows - r0)
                rr, cc = np.mgrid[r0:r0 + rows, 0:n_cols]
                yield pd.DataFrame({
                    "grid": np.full(rr.size, gi, dtype=np.int64),
                    "row": rr.ravel().astype(np.int64),
                    "col": cc.ravel().astype(np.int64),
                    "lat": g["s_lat"] + rr.ravel() * g["lat_inc"],
                    "lon": g["lon_min_e"] + cc.ravel() * g["lon_inc"],
                    "lat_shift_sec": la[r0:r0 + rows].ravel(),
                    "lon_shift_w_sec": lo[r0:r0 + rows].ravel(),
                })

    return slabs.mapInPandas(
        fetch,
        "grid long, row long, col long, lat double, lon double, "
        "lat_shift_sec double, lon_shift_w_sec double",
    )


def apply_shift_cols(grid: dict, lon_col: Column, lat_col: Column
                     ) -> tuple[Column, Column]:
    """Bilinear NTv2 shift as pure Column math (the PROJ hgridshift
    apply): the bounded node arrays become broadcast array literals and
    a fact-scale point table shifts map-only.  Returns
    (shifted_lon_east, shifted_lat); points outside the grid pass
    through unshifted (the reference/PROJ convention)."""
    la, lo = grid["lat_shift"], grid["lon_shift_w"]
    n_rows, n_cols = la.shape
    la_arr = F.array(*[F.lit(float(v)) for v in la.ravel()])
    lo_arr = F.array(*[F.lit(float(v)) for v in lo.ravel()])

    px = (lon_col - F.lit(grid["lon_min_e"])) / F.lit(grid["lon_inc"])
    py = (lat_col - F.lit(grid["s_lat"])) / F.lit(grid["lat_inc"])
    inside = ((px >= 0) & (px <= n_cols - 1)
              & (py >= 0) & (py <= n_rows - 1))
    fx = F.least(F.floor(px), F.lit(float(n_cols - 2)))
    fy = F.least(F.floor(py), F.lit(float(n_rows - 2)))
    tx = px - fx
    ty = py - fy

    def node(arr: Column, dy: int, dx: int) -> Column:
        idx = (fy + dy) * n_cols + (fx + dx)
        return F.element_at(arr, idx.cast("int") + 1)

    def bilinear(arr: Column) -> Column:
        return (
            node(arr, 0, 0) * (1 - tx) * (1 - ty)
            + node(arr, 0, 1) * tx * (1 - ty)
            + node(arr, 1, 0) * (1 - tx) * ty
            + node(arr, 1, 1) * tx * ty
        )

    d_lat = F.when(inside, bilinear(la_arr)).otherwise(F.lit(0.0))
    d_lon_w = F.when(inside, bilinear(lo_arr)).otherwise(F.lit(0.0))
    return (lon_col - d_lon_w / F.lit(3600.0),
            lat_col + d_lat / F.lit(3600.0))
