"""Geolocation-array transformer — forward (pixel/line → geoX/geoY).

Reference semantics: ``alg/gdalgeoloc.cpp`` ``GDALGeoLocTransform`` →
``PixelLineToXY`` (no-nodata, no-dateline, TOP_LEFT_CORNER convention,
georef offset 0):

- normalize: gp = (pixel − PIXEL_OFFSET)/PIXEL_STEP, gl likewise
  (gdalgeoloc.cpp:622-629);
- anchor cell: iX = int(clamp(gp, 0, XSize−1)); a point on the right /
  bottom edge retreats one cell (gdalgeoloc.cpp:460-476 retry loop) so the
  interpolation always has a full 2×2 neighborhood;
- bilinear with the UNCLAMPED fractions (gp − iX can lie outside [0, 1]:
  the reference extrapolates linearly beyond the array,
  "infinite extension beyond borders", gdalgeoloc.cpp:443-456).

The inverse direction uses the reference's iteratively-built backmap —
out of closed-form scope here (same status as RPC inverse).

Scale shape: the geoloc array is a (subsampled) dimension table; the four
taps are broadcast equi-joins on exact int keys, so the transform is a
map-only stage over any number of points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixture grid geometry (PIXEL/LINE_STEP=8 subsampling like real swath
# products; TOP_LEFT_CORNER convention)
GL_XSIZE = 16
GL_YSIZE = 12
GL_PIXEL_OFFSET = 0.0
GL_PIXEL_STEP = 8.0
GL_LINE_OFFSET = 0.0
GL_LINE_STEP = 8.0


def geoloc_grid(spark: SparkSession) -> DataFrame:
    """Synthetic swath geolocation arrays: smooth dyadic ramps plus a
    deterministic wobble so the surface is genuinely non-affine (the
    bilinear term carries weight)."""
    g = spark.range(GL_XSIZE * GL_YSIZE).select(
        (F.col("id") % GL_XSIZE).cast("int").alias("gc"),
        (F.col("id") / GL_XSIZE).cast("int").alias("gr"),
    )
    c = F.col("gc").cast("double")
    r = F.col("gr").cast("double")
    glx = (F.lit(-120.0) + c * F.lit(0.5) + r * F.lit(0.0625)
           + ((F.col("gc") * 3 + F.col("gr") * 5) % 8).cast("double")
           / F.lit(128.0))
    gly = (F.lit(30.0) + r * F.lit(0.5) - c * F.lit(0.03125)
           + ((F.col("gc") * 7 + F.col("gr") * 11) % 8).cast("double")
           / F.lit(256.0))
    return g.select("gc", "gr", glx.alias("glx"), gly.alias("gly"))


def sql_geoloc_grid_value(col: str, row: str) -> tuple[str, str]:
    """Closed-form mirror of geoloc_grid's (glx, gly) at integer
    (col, row) — lets the oracle evaluate the array without a join."""
    glx = (f"(-120.0 + ({col})::double * 0.5 + ({row})::double * 0.0625"
           f" + ((({col}) * 3 + ({row}) * 5) % 8)::double / 128.0)")
    gly = (f"(30.0 + ({row})::double * 0.5 - ({col})::double * 0.03125"
           f" + ((({col}) * 7 + ({row}) * 11) % 8)::double / 256.0)")
    return glx, gly


def geoloc_transform(
    points: DataFrame, geoloc: DataFrame,
    pixel_col: str = "px", line_col: str = "py", point_id: str = "i",
) -> DataFrame:
    """Forward geoloc transform; output (point_id, geo_x, geo_y)."""
    gp = (F.col(pixel_col) - F.lit(GL_PIXEL_OFFSET)) / F.lit(GL_PIXEL_STEP)
    gl = (F.col(line_col) - F.lit(GL_LINE_OFFSET)) / F.lit(GL_LINE_STEP)
    ix = F.floor(
        F.least(F.greatest(gp, F.lit(0.0)), F.lit(float(GL_XSIZE - 1)))
    ).cast("int")
    iy = F.floor(
        F.least(F.greatest(gl, F.lit(0.0)), F.lit(float(GL_YSIZE - 1)))
    ).cast("int")
    # right/bottom edge retreat (the reference's retry loop collapsed to a
    # one-shot adjustment — valid without nodata holes)
    ix = F.when(ix == GL_XSIZE - 1, ix - 1).otherwise(ix)
    iy = F.when(iy == GL_YSIZE - 1, iy - 1).otherwise(iy)
    base = points.select(
        F.col(point_id), gp.alias("_gp"), gl.alias("_gl"),
        ix.alias("_ix"), iy.alias("_iy"),
    )

    def tap(sfx: str) -> DataFrame:
        return geoloc.select(
            F.col("gc").alias(f"_c{sfx}"), F.col("gr").alias(f"_r{sfx}"),
            F.col("glx").alias(f"_x{sfx}"), F.col("gly").alias(f"_y{sfx}"),
        )

    j = base
    for dx, dy, sfx in ((0, 0, "00"), (1, 0, "10"), (0, 1, "01"),
                        (1, 1, "11")):
        t = tap(sfx)
        j = j.join(
            F.broadcast(t),
            (j["_ix"] + dx == t[f"_c{sfx}"])
            & (j["_iy"] + dy == t[f"_r{sfx}"]),
        )
    fp = F.col("_gp") - F.col("_ix").cast("double")
    fl = F.col("_gl") - F.col("_iy").cast("double")
    geo_x = (
        (F.lit(1.0) - fl)
        * (F.col("_x00") + fp * (F.col("_x10") - F.col("_x00")))
        + fl * (F.col("_x01") + fp * (F.col("_x11") - F.col("_x01")))
    )
    geo_y = (
        (F.lit(1.0) - fl)
        * (F.col("_y00") + fp * (F.col("_y10") - F.col("_y00")))
        + fl * (F.col("_y01") + fp * (F.col("_y11") - F.col("_y01")))
    )
    return j.select(
        F.col(point_id), geo_x.alias("geo_x"), geo_y.alias("geo_y")
    )
