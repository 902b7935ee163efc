"""Zarr v2 directory-store driver (PUBLIC spec: zarr v2 storage
specification — plain JSON metadata + flat chunk files; reference
``frmts/zarr/`` and the multidim model in ``gcore/gdalmultidim.cpp``).

Store layout (v2):

    root/.zgroup                  {"zarr_format": 2}
    root/<array>/.zarray          shape/chunks/dtype/compressor/fill_value/
                                  order/filters/dimension_separator
    root/<array>/.zattrs          attributes (xarray's _ARRAY_DIMENSIONS
                                  names the dims)
    root/<array>/<i>.<j>.<k>      one file per chunk, C-order raveled,
                                  optionally zlib/gzip-compressed

Spark mapping — the repo's one-task-per-chunk pattern:

* **read**: the driver reads ONLY the JSON metadata, enumerates the chunk
  grid, and parallelizes one row per chunk; a ``mapInPandas`` task opens
  its chunk file, decompresses, reshapes, trims edge overhang, and emits
  the LONG FORM (dim0, dim1, ..., val) that operators/mdim.py consumes.
  Missing chunk files are the spec'd fill_value.  At 100 TB the chunk
  list is bounded metadata (shape/chunks only); no data touches the
  driver.
* **write**: rows are grouped by their owning chunk key (integer division
  of the dim indices) and ``applyInPandas`` writes one chunk file per
  group — dense buffer initialized to fill_value, values scattered in.
  Only the tiny ``.zarray``/``.zgroup`` JSON is written driver-side.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SPARK_TYPES = {
    "f8": "double", "f4": "float", "i8": "long", "i4": "int",
    "i2": "short", "i1": "byte", "u1": "short",
}


def _np_dtype(dtype_str: str) -> np.dtype:
    return np.dtype(dtype_str)


def _compress(buf: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.compress(buf, compressor.get("level", 1))
    if cid == "gzip":
        import gzip

        return gzip.compress(buf, compresslevel=compressor.get("level", 1))
    raise ValueError(f"unsupported zarr compressor: {cid!r}")


def _decompress(buf: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(buf)
    if cid == "gzip":
        import gzip

        return gzip.decompress(buf)
    raise ValueError(f"unsupported zarr compressor: {cid!r}")


def write_zarr(
    arr: DataFrame,
    path: str,
    array_name: str,
    dims: list[str],
    shape: list[int],
    chunks: list[int],
    *,
    val: str = "val",
    dtype: str = "<f8",
    compressor: dict | None = {"id": "zlib", "level": 1},
    fill_value: float = 0.0,
) -> None:
    """Write a long-form array DataFrame as a Zarr v2 store — one task per
    chunk (applyInPandas over the chunk key), JSON metadata driver-side."""
    adir = os.path.join(path, array_name)
    os.makedirs(adir, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(adir, ".zattrs"), "w") as f:
        json.dump({"_ARRAY_DIMENSIONS": list(dims)}, f)

    key = F.concat_ws(
        ".",
        *[(F.col(d).cast("long") / F.lit(c)).cast("long").cast("string")
          for d, c in zip(dims, chunks)],
    )
    np_dt = _np_dtype(dtype)
    dims_l, chunks_l, shape_l = list(dims), list(chunks), list(shape)

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        ckey = pdf["_chunk"].iloc[0]
        origin = [int(p) * c for p, c in zip(ckey.split("."), chunks_l)]
        buf = np.full(chunks_l, fill_value, dtype=np_dt)
        idx = tuple(
            pdf[d].to_numpy(dtype=np.int64) - o
            for d, o in zip(dims_l, origin)
        )
        buf[idx] = pdf[val].to_numpy().astype(np_dt, copy=False)
        blob = _compress(buf.tobytes(order="C"), compressor)
        with open(os.path.join(adir, ckey), "wb") as f:
            f.write(blob)
        return pd.DataFrame({"chunk": [ckey], "n": [len(pdf)]})

    (
        arr.withColumn("_chunk", key)
        .groupBy("_chunk")
        .applyInPandas(write_chunk, "chunk string, n long")
        .collect()  # bounded: one row per chunk
    )


def read_zarr(
    spark: SparkSession, path: str, array_name: str, *, val: str = "val"
) -> DataFrame:
    """Read a Zarr v2 array as the long-form DataFrame (dim..., val) —
    driver touches ONLY the JSON metadata; one task per chunk."""
    adir = os.path.join(path, array_name)
    with open(os.path.join(adir, ".zarray")) as f:
        meta = json.load(f)
    dims = None
    zattrs = os.path.join(adir, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as f:
            dims = json.load(f).get("_ARRAY_DIMENSIONS")
    shape, chunks = meta["shape"], meta["chunks"]
    if dims is None:
        dims = [f"dim_{i}" for i in range(len(shape))]
    if meta.get("order", "C") != "C" or meta.get("filters"):
        raise NotImplementedError("zarr: only C order, no filters")
    sep = meta.get("dimension_separator", ".")
    compressor = meta["compressor"]
    fill_value = meta["fill_value"]
    np_dt = _np_dtype(meta["dtype"])
    kind = np_dt.str.lstrip("<>|=")
    spark_t = _SPARK_TYPES.get(kind)
    if spark_t is None:
        raise NotImplementedError(f"zarr dtype {meta['dtype']!r}")

    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    import itertools

    keys = [sep.join(str(i) for i in t) for t in itertools.product(*grid)]
    chunk_df = spark.createDataFrame(
        [(k,) for k in keys], "chunk_key string"
    ).repartition(min(len(keys), 32), "chunk_key")

    schema = (
        ", ".join(f"{d} long" for d in dims) + f", {val} {spark_t}"
    )
    dims_l, chunks_l, shape_l = list(dims), list(chunks), list(shape)

    def read_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for ckey in pdf["chunk_key"]:
                origin = [
                    int(p) * c for p, c in zip(ckey.split(sep), chunks_l)
                ]
                fpath = os.path.join(adir, ckey)
                if os.path.exists(fpath):
                    with open(fpath, "rb") as f:
                        raw = _decompress(f.read(), compressor)
                    buf = np.frombuffer(raw, dtype=np_dt).reshape(chunks_l)
                else:  # spec: absent chunk == fill_value everywhere
                    buf = np.full(chunks_l, fill_value, dtype=np_dt)
                # trim edge-chunk overhang past the array shape
                sl = tuple(
                    slice(0, min(c, s - o))
                    for c, s, o in zip(chunks_l, shape_l, origin)
                )
                sub = buf[sl]
                mesh = np.meshgrid(
                    *[np.arange(o, o + n, dtype=np.int64)
                      for o, n in zip(origin, sub.shape)],
                    indexing="ij",
                )
                out = {
                    d: m.ravel() for d, m in zip(dims_l, mesh)
                }
                out[val] = sub.ravel()
                yield pd.DataFrame(out)

    return chunk_df.mapInPandas(read_chunks, schema)


def zarr_array_info(path: str, array_name: str) -> dict:
    """Metadata summary (gdalmdiminfo analog) — driver-side JSON only."""
    adir = os.path.join(path, array_name)
    with open(os.path.join(adir, ".zarray")) as f:
        meta = json.load(f)
    info = {
        "shape": meta["shape"],
        "chunks": meta["chunks"],
        "dtype": meta["dtype"],
        "compressor": (meta["compressor"] or {}).get("id"),
        "n_chunks": int(
            np.prod([(s + c - 1) // c
                     for s, c in zip(meta["shape"], meta["chunks"])])
        ),
    }
    zattrs = os.path.join(adir, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as f:
            info["dims"] = json.load(f).get("_ARRAY_DIMENSIONS")
    return info
