"""netCDF classic driver (sources/netcdf.py): format-grammar conformance —
magic/header layout, big-endian payload, 4-byte name padding, attribute
decode, fill_value pre-fill for absent rows, the type menu, and the
long-form roundtrip (spec: Unidata NetCDF Classic Format Specification;
ref frmts/netcdf/netcdfdataset.cpp reads the same container)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.sources import netcdf as NCF


def _cube_df(spark, t=2, n=8):
    return spark.range(t * n * n).select(
        (F.col("id") / (n * n)).cast("long").alias("t"),
        ((F.col("id") / n) % n).cast("long").alias("y"),
        (F.col("id") % n).alias("x"),
        (F.col("id") * 3 % 97).cast("double").alias("val"),
    )


def test_roundtrip_exact(spark, tmp_path):
    df = _cube_df(spark)
    path = str(tmp_path / "cube.nc")
    NCF.write_netcdf(df, path, "v", dims=["t", "y", "x"], shape=[2, 8, 8])
    back = NCF.read_netcdf(spark, path, "v")
    got = {(r["t"], r["y"], r["x"]): r["val"] for r in back.collect()}
    want = {(r["t"], r["y"], r["x"]): r["val"] for r in df.collect()}
    assert got == want  # bit-exact doubles through the big-endian container


def test_header_is_spec_cdf2(spark, tmp_path):
    df = _cube_df(spark)
    path = str(tmp_path / "cube.nc")
    NCF.write_netcdf(df, path, "v", dims=["t", "y", "x"], shape=[2, 8, 8],
                     attrs={"units": "K"})
    raw = open(path, "rb").read()
    assert raw[:4] == b"CDF\x02"
    assert struct.unpack_from(">i", raw, 4) == (0,)  # numrecs
    hdr = NCF.parse_header(path)
    assert hdr["version"] == 2
    assert hdr["dims"] == {"t": 2, "y": 8, "x": 8}
    v = hdr["variables"]["v"]
    assert v["dims"] == ["t", "y", "x"] and v["shape"] == [2, 8, 8]
    assert v["nc_type"] == 6 and v["attrs"] == {"units": "K"}
    # decode slab t=1 by hand straight from begin: big-endian f8, C-order
    arr = np.frombuffer(
        raw[v["begin"] + 64 * 8: v["begin"] + 128 * 8], ">f8"
    ).reshape(8, 8)
    assert arr[2, 3] == float((64 + 2 * 8 + 3) * 3 % 97)


def test_name_padding_survives(spark, tmp_path):
    # 5-char names force 3 pad bytes in dim/var name encoding
    df = (_cube_df(spark, t=1).drop("t").filter(F.col("y") < 3)
          .withColumnRenamed("y", "yyyyy"))
    path = str(tmp_path / "pad.nc")
    NCF.write_netcdf(df, path, "tempv", dims=["yyyyy", "x"], shape=[3, 8],
                     val="val")
    hdr = NCF.parse_header(path)
    assert list(hdr["dims"]) == ["yyyyy", "x"]
    assert hdr["variables"]["tempv"]["shape"] == [3, 8]


def test_absent_rows_read_as_fill(spark, tmp_path):
    df = _cube_df(spark).filter(F.col("t") == 0)  # t=1 slab never written
    path = str(tmp_path / "fill.nc")
    NCF.write_netcdf(df, path, "v", dims=["t", "y", "x"], shape=[2, 8, 8],
                     fill_value=-5.0)
    back = NCF.read_netcdf(spark, path, "v")
    assert back.count() == 2 * 8 * 8
    t1 = back.filter(F.col("t") == 1).select("val").distinct().collect()
    assert [r["val"] for r in t1] == [-5.0]


@pytest.mark.parametrize("dtype,cast", [("f4", "float"), ("i4", "int"),
                                        ("i2", "short")])
def test_type_menu(spark, tmp_path, dtype, cast):
    df = _cube_df(spark, t=1, n=4).drop("t").withColumn(
        "val", F.col("val").cast(cast))
    path = str(tmp_path / f"{dtype}.nc")
    NCF.write_netcdf(df, path, "v", dims=["y", "x"], shape=[4, 4],
                     dtype=dtype)
    back = NCF.read_netcdf(spark, path, "v")
    got = {(r["y"], r["x"]): r["val"] for r in back.collect()}
    want = {(r["y"], r["x"]): r["val"] for r in df.collect()}
    assert got == want


def test_rejects_non_netcdf(tmp_path):
    p = tmp_path / "bad.nc"
    p.write_bytes(b"not a netcdf file")
    with pytest.raises(ValueError, match="classic"):
        NCF.parse_header(str(p))


def test_info_summary(spark, tmp_path):
    df = _cube_df(spark)
    path = str(tmp_path / "cube.nc")
    NCF.write_netcdf(df, path, "v", dims=["t", "y", "x"], shape=[2, 8, 8])
    info = NCF.netcdf_info(path)
    assert info["variables"]["v"] == {
        "dims": ["t", "y", "x"], "shape": [2, 8, 8], "nc_type": 6}
