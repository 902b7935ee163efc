"""Zarr v2 directory-store driver (sources/zarr.py): spec conformance —
metadata JSON shape, C-order raveling, compressor menu, fill_value for
absent chunks, edge-chunk trim, and the long-form roundtrip."""

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.sources import zarr as ZR


def _cube_df(spark, t=2, n=8):
    return spark.range(t * n * n).select(
        (F.col("id") / (n * n)).cast("long").alias("t"),
        ((F.col("id") / n) % n).cast("long").alias("y"),
        (F.col("id") % n).alias("x"),
        (F.col("id") * 3 % 97).cast("double").alias("val"),
    )


def test_roundtrip_exact(spark, tmp_path):
    df = _cube_df(spark)
    ZR.write_zarr(df, str(tmp_path), "a", dims=["t", "y", "x"],
                  shape=[2, 8, 8], chunks=[1, 3, 5])
    back = ZR.read_zarr(spark, str(tmp_path), "a")
    got = {(r["t"], r["y"], r["x"]): r["val"] for r in back.collect()}
    want = {(r["t"], r["y"], r["x"]): r["val"] for r in df.collect()}
    assert got == want  # bit-exact doubles, edge chunks trimmed


def test_store_is_spec_zarr(spark, tmp_path):
    df = _cube_df(spark)
    ZR.write_zarr(df, str(tmp_path), "a", dims=["t", "y", "x"],
                  shape=[2, 8, 8], chunks=[2, 4, 4])
    meta = json.load(open(tmp_path / "a" / ".zarray"))
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [2, 8, 8] and meta["chunks"] == [2, 4, 4]
    assert meta["order"] == "C" and meta["filters"] is None
    assert json.load(open(tmp_path / ".zgroup")) == {"zarr_format": 2}
    # decode chunk 0.0.0 by hand: zlib, C-order, dtype <f8
    raw = zlib.decompress(open(tmp_path / "a" / "0.0.0", "rb").read())
    arr = np.frombuffer(raw, "<f8").reshape(2, 4, 4)
    assert arr[1, 2, 3] == float((1 * 64 + 2 * 8 + 3) * 3 % 97)


def test_missing_chunk_is_fill_value(spark, tmp_path):
    df = _cube_df(spark).filter(F.col("t") == 0)  # never writes t=1 chunks
    ZR.write_zarr(df, str(tmp_path), "a", dims=["t", "y", "x"],
                  shape=[2, 8, 8], chunks=[1, 8, 8], fill_value=-5.0)
    back = ZR.read_zarr(spark, str(tmp_path), "a")
    assert back.count() == 2 * 8 * 8
    t1 = back.filter(F.col("t") == 1).select("val").distinct().collect()
    assert [r["val"] for r in t1] == [-5.0]


@pytest.mark.parametrize("compressor", [None, {"id": "gzip", "level": 1}])
def test_compressor_menu(spark, tmp_path, compressor):
    df = _cube_df(spark)
    ZR.write_zarr(df, str(tmp_path), "a", dims=["t", "y", "x"],
                  shape=[2, 8, 8], chunks=[2, 8, 8], compressor=compressor)
    back = ZR.read_zarr(spark, str(tmp_path), "a")
    assert back.agg(F.sum("val")).collect()[0][0] == \
        df.agg(F.sum("val")).collect()[0][0]


def test_int_dtype(spark, tmp_path):
    df = _cube_df(spark).withColumn("val", F.col("val").cast("long"))
    ZR.write_zarr(df, str(tmp_path), "a", dims=["t", "y", "x"],
                  shape=[2, 8, 8], chunks=[2, 4, 4], dtype="<i8")
    back = ZR.read_zarr(spark, str(tmp_path), "a")
    assert dict(back.dtypes)["val"] == "bigint"
    assert back.agg(F.sum("val")).collect()[0][0] == \
        df.agg(F.sum("val")).collect()[0][0]


def test_array_info(spark, tmp_path):
    ZR.write_zarr(_cube_df(spark), str(tmp_path), "a",
                  dims=["t", "y", "x"], shape=[2, 8, 8], chunks=[1, 3, 5])
    info = ZR.zarr_array_info(str(tmp_path), "a")
    assert info["dims"] == ["t", "y", "x"]
    assert info["n_chunks"] == 2 * 3 * 2  # ceil(8/3)=3, ceil(8/5)=2
    assert info["compressor"] == "zlib"


def test_external_store_readable(spark, tmp_path):
    """A store written by hand to the spec (not by write_zarr) reads back —
    guards against writer/reader-only symmetry bugs."""
    adir = tmp_path / "ext"
    os.makedirs(adir)
    data = np.arange(12, dtype="<f4").reshape(3, 4)
    json.dump({"zarr_format": 2, "shape": [3, 4], "chunks": [3, 4],
               "dtype": "<f4", "compressor": None, "fill_value": 0.0,
               "order": "C", "filters": None},
              open(adir / ".zarray", "w"))
    open(adir / "0.0", "wb").write(data.tobytes())
    back = ZR.read_zarr(spark, str(tmp_path), "ext")
    rows = {(r["dim_0"], r["dim_1"]): r["val"] for r in back.collect()}
    assert rows[(2, 3)] == 11.0 and len(rows) == 12
