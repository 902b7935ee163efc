"""Unit + plan tests for the DEM menu (operators/dem.py) and band-level
raster math (operators/rastermath.py)."""

import io
import math
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import dem as DEM
from gdal_spark.operators import rastermath as RM


def _grid(spark, vals):
    """vals: list of rows (top to bottom), each a list of values."""
    rows = [
        (x, y, float(v))
        for y, row in enumerate(vals)
        for x, v in enumerate(row)
    ]
    return spark.createDataFrame(rows, "gx long, gy long, val double")


# ---------------------------------------------------------------------------
# neighborhood pivot
# ---------------------------------------------------------------------------

def test_neighborhood3x3_window_layout(spark):
    cells = _grid(spark, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    out = DEM.neighborhood3x3(cells).collect()
    assert len(out) == 1  # only the center pixel has a full window
    r = out[0].asDict()
    assert (r["gx"], r["gy"]) == (1, 1)
    # afWin layout: row y-1 (w0..w2), row y (w3..w5), row y+1 (w6..w8)
    assert [r[f"w{k}"] for k in range(9)] == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_neighborhood3x3_incomplete_kept_when_requested(spark):
    cells = _grid(spark, [[1, 2], [3, 4]])
    out = DEM.neighborhood3x3(cells, complete_only=False)
    # every pixel of the 2x2 grid plus halo targets appear
    assert out.filter(F.col("w4").isNotNull()).count() == 4


def test_neighborhood_single_shuffle(spark):
    cells = _grid(spark, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    df = DEM.neighborhood3x3(cells)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # formatted plans print each node twice (tree line + detail header);
    # count detail headers: exactly one hash exchange on the pixel key
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _one_window(spark, w):
    df = spark.createDataFrame(
        [tuple(float(v) for v in w)],
        ", ".join(f"w{k} double" for k in range(9)),
    )
    return df


def test_aspect_flat_is_nodata(spark):
    df = _one_window(spark, [5] * 9)
    r = df.select(DEM.aspect_col().alias("a")).collect()[0]["a"]
    assert r == -9999.0


def test_aspect_cardinal_directions(spark):
    # surface rising to the east -> faces west (azimuth 270)
    east_up = [0, 0, 1, 0, 0, 1, 0, 0, 1]
    df = _one_window(spark, east_up)
    a = df.select(DEM.aspect_col().alias("a")).collect()[0]["a"]
    assert a == pytest.approx(270.0)
    # rising to the south (y down = south row w6..w8) -> faces north (0)
    south_up = [0, 0, 0, 0, 0, 0, 1, 1, 1]
    a = _one_window(spark, south_up).select(
        DEM.aspect_col().alias("a")
    ).collect()[0]["a"]
    assert a == pytest.approx(0.0)


def test_tri_tpi_roughness_values(spark):
    w = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    df = _one_window(spark, w)
    row = df.select(
        DEM.tri_riley_col().alias("riley"),
        DEM.tri_wilson_col().alias("wilson"),
        DEM.tpi_col().alias("tpi"),
        DEM.roughness_col().alias("rough"),
    ).collect()[0]
    diffs = [w[k] - 5 for k in range(9) if k != 4]
    assert row["riley"] == pytest.approx(
        math.sqrt(sum(d * d for d in diffs))
    )
    assert row["wilson"] == pytest.approx(
        sum(abs(d) for d in diffs) / 8.0
    )
    assert row["tpi"] == pytest.approx(5 - sum(w[k] for k in range(9) if k != 4) / 8.0)
    assert row["rough"] == 8.0


# ---------------------------------------------------------------------------
# hillshade menu
# ---------------------------------------------------------------------------

def test_hillshade_flat_pixel_all_modes(spark):
    df = _one_window(spark, [7] * 9)
    row = df.select(
        DEM.hillshade_col("standard").alias("std"),
        DEM.hillshade_col("combined").alias("comb"),
        DEM.hillshade_col("igor").alias("igor"),
        DEM.hillshade_col("multidirectional").alias("multi"),
    ).collect()[0]
    sin45 = math.sin(math.radians(45.0))
    # standard: 1 + 254*sin(alt); combined: acos(sin_alt)*atan(0) = 0
    # -> 1 + 254*1; igor: slopeStrength 0 -> 255; multi: flat branch
    assert row["std"] == pytest.approx(1 + 254 * sin45)
    assert row["comb"] == pytest.approx(255.0)
    assert row["igor"] == pytest.approx(255.0)
    assert row["multi"] == pytest.approx(1 + 254 * sin45)


def test_hillshade_standard_shadow_clamps_to_one(spark):
    # steep slope facing AWAY from a NW sun (az=315): rising hard to
    # the north-west -> cang goes negative -> clamp to 1.0
    w = [100, 50, 0, 50, 0, -50, 0, -50, -100]
    v = _one_window(spark, w).select(
        DEM.hillshade_col("standard", alt=5.0).alias("h")
    ).collect()[0]["h"]
    assert v == 1.0


def test_hillshade_matches_closed_form(spark):
    # standard mode cross-checked against the formula written out in
    # plain python for one asymmetric window
    w = [1, 2, 3, 4, 5, 6, 9, 8, 7]
    got = _one_window(spark, w).select(
        DEM.hillshade_col("standard").alias("h")
    ).collect()[0]["h"]
    zf = 1.0 / 8.0
    x = ((w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])) / 1.0
    y = ((w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])) / -1.0
    alt = math.radians(45.0)
    az = math.radians(315.0)
    num = 254.0 * math.sin(alt) - (
        y * math.cos(az) * math.cos(alt) * zf * 254.0
        - x * math.sin(az) * math.cos(alt) * zf * 254.0
    )
    cang = num / math.sqrt(1.0 + zf * zf * (x * x + y * y))
    exp = 1.0 if cang <= 0 else 1.0 + cang
    assert got == pytest.approx(exp)


def test_hillshade_rejects_unknown_mode():
    with pytest.raises(ValueError):
        DEM.hillshade_col("osten")
    with pytest.raises(ValueError):
        DEM.sql_hillshade("osten", ["0"] * 9)


# ---------------------------------------------------------------------------
# color relief
# ---------------------------------------------------------------------------

_ENTRIES = [(0.0, 0, 0, 255, 255), (100.0, 255, 0, 0, 255)]


@pytest.mark.parametrize(
    "val,rgb",
    [
        (-5.0, (0, 0, 255)),    # below first -> first color
        (0.0, (0, 0, 255)),     # exact first entry
        (100.0, (255, 0, 0)),   # exact last entry
        (250.0, (255, 0, 0)),   # above last -> last color
        (50.0, (128, 0, 128)),  # floor(0.5 + 0 + 0.5*255) = 128
    ],
)
def test_color_relief_interpolation(spark, val, rgb):
    df = spark.createDataFrame([(val,)], "v double")
    r, g, b, a = DEM.color_relief_cols(F.col("v"), _ENTRIES)
    row = df.select(r.alias("r"), g.alias("g"), b.alias("b")).collect()[0]
    assert (row["r"], row["g"], row["b"]) == rgb


# ---------------------------------------------------------------------------
# checksum
# ---------------------------------------------------------------------------

def test_checksum_matches_reference_rule(spark):
    w = 5
    vals = [[(x * 13 + y * 7) % 50 for x in range(w)] for y in range(w)]
    cells = _grid(spark, vals)
    got = RM.checksum_image(cells, width=w).collect()[0]["checksum"]
    primes = RM.CHECKSUM_PRIMES
    exp = 0
    for y in range(w):
        for x in range(w):
            exp += int(math.floor(vals[y][x] + 0.5)) % primes[(y * w + x) % 11]
    assert got == (exp & 0xFFFF)


def test_checksum_negative_values_match_c_modulo(spark):
    cells = _grid(spark, [[-7, -3], [2, 40]])
    got = RM.checksum_image(cells, width=2).collect()[0]["checksum"]
    # C's % truncates toward zero: int(floor(v+0.5)) % prime keeps sign
    def c_mod(a, p):
        return a - int(a / p) * p
    terms = [
        c_mod(int(math.floor(v + 0.5)), RM.CHECKSUM_PRIMES[i % 11])
        for i, v in enumerate([-7, -3, 2, 40])
    ]
    assert got == (sum(terms) & 0xFFFF)


# ---------------------------------------------------------------------------
# histogram / stats
# ---------------------------------------------------------------------------

def test_histogram_drops_out_of_range_by_default(spark):
    cells = _grid(spark, [[-5, 0, 5, 15]])
    out = {
        r["bucket"]: r["n"]
        for r in RM.histogram(cells, 0.0, 10.0, 2).collect()
    }
    # scale = 2/10 = 0.2 -> 0 -> b0, 5 -> b1; -5 and 15 dropped
    assert out == {0: 1, 1: 1}


def test_histogram_clamps_when_including_out_of_range(spark):
    cells = _grid(spark, [[-5, 0, 5, 15]])
    out = {
        r["bucket"]: r["n"]
        for r in RM.histogram(
            cells, 0.0, 10.0, 2, include_out_of_range=True
        ).collect()
    }
    assert out == {0: 2, 1: 2}


def test_stats_population_stddev(spark):
    cells = _grid(spark, [[1, 2, 3, 4]])
    row = RM.compute_statistics(cells).collect()[0]
    assert row["vmin"] == 1.0 and row["vmax"] == 4.0
    assert row["vmean"] == pytest.approx(2.5)
    assert row["vstddev"] == pytest.approx(math.sqrt(1.25))  # population


# ---------------------------------------------------------------------------
# reclassify
# ---------------------------------------------------------------------------

def test_reclassify_intervals_and_keywords(spark):
    df = spark.createDataFrame(
        [(v,) for v in [0.0, 39.0, 40.0, 150.0, 160.0, 170.0, -1.0]],
        "v double",
    )
    out = df.select(
        "v",
        RM.reclassify_col(
            F.col("v"),
            "[0,40)=1;[40,90)=2;(140,160)=PASS_THROUGH;160=7;NO_DATA=0;DEFAULT=9",
            nodata=-1.0,
        ).alias("o"),
    ).collect()
    got = {r["v"]: r["o"] for r in out}
    assert got == {
        0.0: 1.0, 39.0: 1.0, 40.0: 2.0, 150.0: 150.0,
        160.0: 7.0, 170.0: 9.0, -1.0: 0.0,
    }


def test_reclassify_unmatched_without_default_is_null(spark):
    df = spark.createDataFrame([(50.0,)], "v double")
    out = df.select(
        RM.reclassify_col(F.col("v"), "[0,10)=1").alias("o")
    ).collect()[0]["o"]
    assert out is None


def test_reclassify_rejects_bad_entry():
    with pytest.raises(ValueError):
        RM.reclassify_col(F.lit(1.0), "[0,10)")
    with pytest.raises(ValueError):
        RM.reclassify_col(F.lit(1.0), "NO_DATA=1")  # nodata not set


# ---------------------------------------------------------------------------
# calc / mosaic / locationinfo
# ---------------------------------------------------------------------------

def test_raster_calc_renamed_bands(spark):
    a = _grid(spark, [[2, 4]])
    b = _grid(spark, [[6, 8]])
    out = RM.raster_calc({"A": a, "B": b}, "(B - A) / (B + A)").collect()
    got = {(r["gx"], r["gy"]): r["val"] for r in out}
    assert got[(0, 0)] == pytest.approx(0.5)
    assert got[(1, 0)] == pytest.approx(1.0 / 3.0)


def test_mosaic_last_non_nodata_wins(spark):
    r1 = _grid(spark, [[1, 1, 255]])
    r2 = spark.createDataFrame(
        [(1, 0, 255.0), (2, 0, 9.0)], "gx long, gy long, val double"
    )
    out = {
        (r["gx"], r["gy"]): r["val"]
        for r in RM.mosaic([r1, r2], nodata=255.0).collect()
    }
    # pixel 0: only r1 -> 1; pixel 1: r2 is nodata -> falls back to r1;
    # pixel 2: r1 nodata, r2 valid -> 9
    assert out == {(0, 0): 1.0, (1, 0): 1.0, (2, 0): 9.0}


def test_mosaic_no_join_one_shuffle(spark):
    r1 = _grid(spark, [[1, 2]])
    r2 = _grid(spark, [[3, 4]])
    df = RM.mosaic([r1, r2], nodata=255.0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1


def test_locationinfo_inverse_geotransform(spark):
    pts = spark.createDataFrame(
        [(1, 5.0, 95.0), (2, 25.0, 75.0)], "id long, mx double, my double"
    )
    cells = spark.createDataFrame(
        [(0, 0, 11.0), (2, 2, 22.0)], "gx long, gy long, val double"
    )
    out = RM.locationinfo(
        pts, cells, origin_x=0.0, origin_y=100.0, pixel_size=10.0,
        mx="mx", my="my",
    ).collect()
    got = {r["id"]: (r["pixel"], r["line"], r["value"]) for r in out}
    assert got[1] == (0, 0, 11.0)
    assert got[2] == (2, 2, 22.0)


class TestHistogramMatch:
    def test_lut_monotone_and_range(self, spark):
        from gdal_spark.operators import rastermath as RM
        from gdal_spark.operators import tiles as TL
        import numpy as np

        base = TL.synthetic_raster(spark, zoom=1, bands=1)
        lut = RM.match_histogram_mapping(base, base)
        assert len(lut) == 256
        assert all(0 <= v <= 255 for v in lut)
        assert all(a <= b for a, b in zip(lut, lut[1:]))  # CDF rule

    def test_self_match_preserves_present_values(self, spark):
        """Matching a raster against itself must map every PRESENT
        value to itself (cdf_s == cdf_r at each present value)."""
        from gdal_spark.operators import rastermath as RM
        from gdal_spark.operators import tiles as TL
        from pyspark.sql import functions as F

        base = TL.synthetic_raster(spark, zoom=1, bands=1)
        present = {
            int(r["v"]) for r in base.select(
                F.explode("data").alias("v")).distinct().collect()
        }
        lut = RM.match_histogram_mapping(base, base)
        for v in present:
            assert lut[v] == v
