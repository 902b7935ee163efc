"""Sieve / fill-nodata / pansharpen stencils (alg/gdalsievefilter.cpp,
alg/gdalfillnodata.cpp, alg/gdalpansharpen.cpp semantics)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import stencil as ST


def _grid(spark, rows):
    return spark.createDataFrame(rows, "gx int, gy int, val long")


def test_sieve_interior_speckle_joins_surrounding_blob(spark):
    # 3x3 blob of value 1 with a single center speckle 9 -> center becomes 1
    rows = [(x, y, 9 if (x, y) == (1, 1) else 1)
            for y in range(3) for x in range(3)]
    out = {(r["gx"], r["gy"]): r["val"]
           for r in ST.sieve_filter(_grid(spark, rows), 3).collect()}
    assert out[(1, 1)] == 1
    assert all(v == 1 for v in out.values())


def test_sieve_largest_neighbour_wins(spark):
    # speckle (val 5) between a 2-cell region (val 7) and a 6-cell region
    # (val 2): adopts the larger neighbour's value
    rows = []
    for x in range(2):
        rows.append((x, 0, 7))
    rows.append((2, 0, 5))
    for x in range(3, 9):
        rows.append((x, 0, 2))
    out = {(r["gx"], r["gy"]): r["val"]
           for r in ST.sieve_filter(_grid(spark, rows), 3).collect()}
    assert out[(2, 0)] == 2
    # the 2-cell region (7) is itself under threshold: merges into the
    # largest neighbour it touches (the sieved speckle's ORIGINAL region is
    # its only neighbour in this single pass -> stays deterministic)
    assert out[(0, 0)] == out[(1, 0)]


def test_sieve_whole_raster_region_keeps_value(spark):
    rows = [(x, y, 3) for y in range(2) for x in range(2)]
    out = ST.sieve_filter(_grid(spark, rows), 100).collect()
    assert all(r["val"] == 3 for r in out)


def test_fill_nodata_single_hole_idw(spark):
    # 3x3 all value 10 except a center hole: filled by IDW of 4 unit-distance
    # neighbours = 10
    rows = [(x, y, None if (x, y) == (1, 1) else 10.0)
            for y in range(3) for x in range(3)]
    g = spark.createDataFrame(rows, "gx int, gy int, val double")
    out = {(r["gx"], r["gy"]): (r["val"], r["filled"])
           for r in ST.fill_nodata(g, 2, x="gx", y="gy").collect()}
    assert out[(1, 1)] == (10.0, True)
    assert out[(0, 0)] == (10.0, False)


def test_fill_nodata_respects_max_distance(spark):
    # valid pixel 5 away on one row: not reachable with max_distance=3
    rows = [(0, 0, 7.0)] + [(x, 0, None) for x in range(1, 6)]
    g = spark.createDataFrame(rows, "gx int, gy int, val double")
    out = {r["gx"]: (r["val"], r["filled"])
           for r in ST.fill_nodata(g, 3, x="gx", y="gy").collect()}
    assert out[1] == (7.0, True)      # d=1
    assert out[3][0] == pytest.approx(7.0)  # d=3 boundary included
    assert out[3][1] is True
    assert out[4][0] is None and out[4][1] is False
    assert out[5][0] is None


def test_fill_nodata_weighted_mix(spark):
    # nodata at x=2 between 4.0 (d=2) and 10.0 (d=1): (4/2 + 10/1)/(1/2+1/1)
    rows = [(0, 0, 4.0), (1, 0, None), (2, 0, None), (3, 0, 10.0)]
    g = spark.createDataFrame(rows, "gx int, gy int, val double")
    out = {r["gx"]: r["val"]
           for r in ST.fill_nodata(g, 3, x="gx", y="gy").collect()}
    assert out[2] == pytest.approx((4.0 / 2 + 10.0) / (0.5 + 1.0))
    assert out[1] == pytest.approx((4.0 + 10.0 / 2) / (1.0 + 0.5))


def test_pansharpen_formula_and_upsample(spark):
    pan = spark.createDataFrame(
        [(x, y, 100.0) for y in range(4) for x in range(4)],
        "gx int, gy int, pan double",
    )
    ms = spark.createDataFrame(
        [(x, y, 10.0, 20.0, 30.0) for y in range(2) for x in range(2)],
        "gx int, gy int, b1 double, b2 double, b3 double",
    )
    out = ST.pansharpen_brovey(pan, ms, [0.25, 0.5, 0.25]).collect()
    assert len(out) == 16
    pseudo = 0.25 * 10 + 0.5 * 20 + 0.25 * 30  # 20
    for r in out:
        assert r["sharp_b1"] == pytest.approx(10 * 100 / pseudo)
        assert r["sharp_b2"] == pytest.approx(20 * 100 / pseudo)
        assert r["sharp_b3"] == pytest.approx(30 * 100 / pseudo)
    with pytest.raises(ValueError):
        ST.pansharpen_brovey(pan, ms, [1.0])
