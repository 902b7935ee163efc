"""netCDF classic (CDF-1/CDF-2) driver — from-scratch codec of the PUBLIC
Unidata "NetCDF Classic Format Specification" (the reference reads the same
container via libnetcdf in ``frmts/netcdf/netcdfdataset.cpp``; the multidim
model is ``gcore/gdalmultidim.cpp``).  NOT a port: the reference wraps the C
library; this is a header parser + slab reader written against the file
format grammar.

Classic container grammar (big-endian throughout)::

    magic   'CDF' \\x01|\\x02      (CDF-2 = 64-bit begin offsets)
    numrecs INT
    dim_list   = ABSENT | 0x0A nelems [name INT(size)]*
    gatt_list  = ABSENT | 0x0C nelems [name nc_type nelems values pad4]*
    var_list   = ABSENT | 0x0B nelems [name ndims dimid* vatts nc_type
                                       vsize begin]*
    data       = fixed-size variables contiguous at their begin offsets,
                 C-order; record variables interleaved per record.

Spark mapping — the repo's one-task-per-chunk pattern:

* **read**: the driver parses ONLY the header (a few KB), then
  parallelizes one row per outermost-index slab of the requested
  variable; each ``mapInPandas`` task seeks to ``begin + i*slab_bytes``,
  reads its slab, and emits the LONG FORM (dim0, ..., val) that
  operators/mdim.py consumes.  At 100 TB the slab list is bounded header
  metadata; no array data touches the driver.
* **write**: the driver writes the header and pre-extends the file; one
  task per outermost slab ``pwrite``s its disjoint byte range
  (``applyInPandas`` over the slab key).  Disjoint-range parallel writes
  into one file are the classic-netCDF analog of the Zarr
  one-file-per-chunk layout — POSIX/shared-FS safe because no two tasks
  share a byte.  Only the tiny header is written driver-side.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

# nc_type -> (numpy big-endian dtype, spark type)
_NC_TYPES = {
    1: (">i1", "byte"),       # NC_BYTE
    2: (">S1", "string"),     # NC_CHAR (attributes only here)
    3: (">i2", "short"),      # NC_SHORT
    4: (">i4", "int"),        # NC_INT
    5: (">f4", "float"),      # NC_FLOAT
    6: (">f8", "double"),     # NC_DOUBLE
}
_NC_OF_NP = {"i1": 1, "i2": 3, "i4": 4, "f4": 5, "f8": 6}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def _read_name(buf: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">i", buf, off)
    name = buf[off + 4: off + 4 + n].decode("utf-8")
    return name, off + 4 + _pad4(n)


def _write_name(out: bytearray, name: str) -> None:
    b = name.encode("utf-8")
    out += struct.pack(">i", len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b))


def _read_attrs(buf: bytes, off: int) -> tuple[dict, int]:
    tag, n = struct.unpack_from(">ii", buf, off)
    off += 8
    attrs: dict = {}
    if tag == 0:  # ABSENT
        return attrs, off
    if tag != NC_ATTRIBUTE:
        raise ValueError(f"netcdf: bad attr list tag {tag:#x}")
    for _ in range(n):
        name, off = _read_name(buf, off)
        typ, cnt = struct.unpack_from(">ii", buf, off)
        off += 8
        dt = np.dtype(_NC_TYPES[typ][0])
        raw = buf[off: off + cnt * dt.itemsize]
        off += _pad4(cnt * dt.itemsize)
        if typ == 2:
            attrs[name] = raw.decode("utf-8")
        else:
            vals = np.frombuffer(raw, dtype=dt)
            attrs[name] = vals[0].item() if cnt == 1 else vals.tolist()
    return attrs, off


def parse_header(path: str) -> dict:
    """Parse a classic netCDF header driver-side — dims, global attrs, and
    per-variable (dims, shape, nc_type, vsize, begin)."""
    with open(path, "rb") as f:
        buf = f.read(1 << 20)  # classic headers are small; 1 MB is generous
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("netcdf: not a classic CDF-1/CDF-2 file")
    version = buf[3]
    (numrecs,) = struct.unpack_from(">i", buf, 4)
    off = 8
    tag, n = struct.unpack_from(">ii", buf, off)
    off += 8
    dims: list[tuple[str, int]] = []
    if tag == NC_DIMENSION:
        for _ in range(n):
            name, off = _read_name(buf, off)
            (size,) = struct.unpack_from(">i", buf, off)
            off += 4
            dims.append((name, size))
    elif tag != 0:
        raise ValueError(f"netcdf: bad dim list tag {tag:#x}")
    gatts, off = _read_attrs(buf, off)
    tag, n = struct.unpack_from(">ii", buf, off)
    off += 8
    variables: dict[str, dict] = {}
    if tag == NC_VARIABLE:
        for _ in range(n):
            name, off = _read_name(buf, off)
            (ndims,) = struct.unpack_from(">i", buf, off)
            off += 4
            dimids = struct.unpack_from(f">{ndims}i", buf, off)
            off += 4 * ndims
            vatts, off = _read_attrs(buf, off)
            typ, vsize = struct.unpack_from(">ii", buf, off)
            off += 8
            if version == 2:
                (begin,) = struct.unpack_from(">q", buf, off)
                off += 8
            else:
                (begin,) = struct.unpack_from(">i", buf, off)
                off += 4
            variables[name] = {
                "dims": [dims[i][0] for i in dimids],
                "shape": [dims[i][1] for i in dimids],
                "nc_type": typ,
                "vsize": vsize,
                "begin": begin,
                "attrs": vatts,
            }
    elif tag != 0:
        raise ValueError(f"netcdf: bad var list tag {tag:#x}")
    return {
        "version": version,
        "numrecs": numrecs,
        "dims": dict(dims),
        "attrs": gatts,
        "variables": variables,
    }


def read_netcdf(
    spark: SparkSession, path: str, var_name: str, *, val: str = "val"
) -> DataFrame:
    """Read one fixed-size variable as the long-form DataFrame
    (dim..., val) — driver touches ONLY the header; one task per
    outermost-index slab (record variables are out of scope: the fixture
    and the reference's mdim path both use fixed dimensions)."""
    hdr = parse_header(path)
    if var_name not in hdr["variables"]:
        raise KeyError(f"netcdf: no variable {var_name!r}")
    v = hdr["variables"][var_name]
    shape, vdims, begin = v["shape"], v["dims"], v["begin"]
    if 0 in shape or not shape:
        raise NotImplementedError("netcdf: record/scalar variables")
    np_dt = np.dtype(_NC_TYPES[v["nc_type"]][0])
    spark_t = _NC_TYPES[v["nc_type"]][1]
    if spark_t == "string":
        raise NotImplementedError("netcdf: NC_CHAR data variables")
    inner = shape[1:]
    slab_elems = int(np.prod(inner)) if inner else 1
    slab_bytes = slab_elems * np_dt.itemsize

    slab_df = spark.range(shape[0]).toDF("slab").repartition(
        min(shape[0], 32), "slab"
    )
    schema = ", ".join(f"{d} long" for d in vdims) + f", {val} {spark_t}"
    inner_l, dims_l = list(inner), list(vdims)

    def read_slabs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(path, os.O_RDONLY)
        try:
            for pdf in batches:
                for i in pdf["slab"].to_numpy():
                    raw = os.pread(fd, slab_bytes, begin + int(i) * slab_bytes)
                    arr = np.frombuffer(raw, dtype=np_dt)
                    if inner_l:
                        arr = arr.reshape(inner_l)
                        mesh = np.meshgrid(
                            *[np.arange(n, dtype=np.int64) for n in inner_l],
                            indexing="ij",
                        )
                        out = {dims_l[0]: np.full(arr.size, int(i),
                                                  dtype=np.int64)}
                        out.update(
                            {d: m.ravel()
                             for d, m in zip(dims_l[1:], mesh)}
                        )
                    else:
                        out = {dims_l[0]: np.array([int(i)], dtype=np.int64)}
                    out[val] = arr.ravel().astype(np_dt.newbyteorder("="))
                    yield pd.DataFrame(out)
        finally:
            os.close(fd)

    return slab_df.mapInPandas(read_slabs, schema)


def write_netcdf(
    arr: DataFrame,
    path: str,
    var_name: str,
    dims: list[str],
    shape: list[int],
    *,
    val: str = "val",
    dtype: str = "f8",
    fill_value: float = 0.0,
    attrs: dict | None = None,
) -> None:
    """Write a long-form array DataFrame as one CDF-2 fixed variable —
    header + file pre-extent driver-side, then one task per outermost
    slab ``pwrite``s its disjoint byte range."""
    if dtype not in _NC_OF_NP:
        raise ValueError(f"netcdf write: unsupported dtype {dtype!r}")
    nc_type = _NC_OF_NP[dtype]
    np_dt = np.dtype(">" + dtype)
    inner = list(shape[1:])
    slab_elems = int(np.prod(inner)) if inner else 1
    slab_bytes = slab_elems * np_dt.itemsize
    vsize = _pad4(slab_bytes * shape[0])

    out = bytearray(b"CDF\x02")
    out += struct.pack(">i", 0)  # numrecs
    out += struct.pack(">ii", NC_DIMENSION, len(dims))
    for d, s in zip(dims, shape):
        _write_name(out, d)
        out += struct.pack(">i", s)
    out += struct.pack(">ii", 0, 0)  # gatt ABSENT
    out += struct.pack(">ii", NC_VARIABLE, 1)
    _write_name(out, var_name)
    out += struct.pack(">i", len(dims))
    out += struct.pack(f">{len(dims)}i", *range(len(dims)))
    a = attrs or {}
    if a:
        out += struct.pack(">ii", NC_ATTRIBUTE, len(a))
        for k, v in a.items():
            _write_name(out, k)
            b = str(v).encode("utf-8")
            out += struct.pack(">ii", 2, len(b)) + b
            out += b"\x00" * (_pad4(len(b)) - len(b))
    else:
        out += struct.pack(">ii", 0, 0)
    out += struct.pack(">ii", nc_type, min(vsize, 2**31 - 1))
    begin = _pad4(len(out) + 8)
    out += struct.pack(">q", begin)
    out += b"\x00" * (begin - len(out))
    with open(path, "wb") as f:
        f.write(out)
        f.truncate(begin + vsize)
        # spec default: unwritten bytes read as fill; we pre-fill so absent
        # rows land on fill_value exactly like Zarr's missing chunks
        full = np.full(slab_elems, fill_value, dtype=np_dt).tobytes()
        for i in range(shape[0]):
            f.seek(begin + i * slab_bytes)
            f.write(full)

    from pyspark.sql import functions as F

    dims_l, inner_l = list(dims), inner

    def write_slab(pdf: pd.DataFrame) -> pd.DataFrame:
        i = int(pdf[dims_l[0]].iloc[0])
        buf = np.full(inner_l or [1], fill_value, dtype=np_dt)
        if inner_l:
            idx = tuple(pdf[d].to_numpy(dtype=np.int64) for d in dims_l[1:])
            buf[idx] = pdf[val].to_numpy().astype(np_dt, copy=False)
        else:
            buf[0] = pdf[val].iloc[0]
        fd = os.open(path, os.O_WRONLY)
        try:
            os.pwrite(fd, buf.tobytes(order="C"), begin + i * slab_bytes)
        finally:
            os.close(fd)
        return pd.DataFrame({"slab": [i], "n": [len(pdf)]})

    (
        arr.withColumn("_slab", F.col(dims_l[0]).cast("long"))
        .groupBy("_slab")
        .applyInPandas(write_slab, "slab long, n long")
        .collect()  # bounded: one row per outermost slab
    )


def netcdf_info(path: str) -> dict:
    """``ncdump -h`` / gdalmdiminfo analog — driver-side header only."""
    hdr = parse_header(path)
    return {
        "version": hdr["version"],
        "dims": hdr["dims"],
        "variables": {
            k: {"dims": v["dims"], "shape": v["shape"],
                "nc_type": v["nc_type"]}
            for k, v in hdr["variables"].items()
        },
    }
