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


# ---------------------------------------------------------------------------
# Inverse (geoX/geoY → pixel/line) — the reference's BACKMAP construction
# (alg/gdalgeoloc.cpp GDALGeoLocInverseTransform + GenerateBackMap): an
# oversampled regular raster over the geo bounding box holding interpolated
# (pixel, line) at each geo cell, built by rasterizing each geoloc quad with
# an inverse-bilinear solve; lookups then refine with Newton steps against
# the exact forward bilinear surface (the staged-iteration pattern proven on
# spatial/rpc.py, here inside one Arrow kernel).
#
# Scale shape: the geoloc array is a bounded dimension (a subsampled swath
# grid — MBs even for real products), so the backmap is built ONCE
# driver-side and BROADCAST; the inverse transform itself is a map-only
# Arrow-batched kernel over any number of fact rows.
# ---------------------------------------------------------------------------

import math

import numpy as np


def geoloc_numpy_arrays(geoloc: DataFrame):
    """Collect the (bounded) geoloc dimension into (glx, gly) 2-D arrays."""
    rows = geoloc.collect()  # bounded: GL_XSIZE*GL_YSIZE dimension table
    glx = np.zeros((GL_YSIZE, GL_XSIZE))
    gly = np.zeros((GL_YSIZE, GL_XSIZE))
    for r in rows:
        glx[r["gr"], r["gc"]] = r["glx"]
        gly[r["gr"], r["gc"]] = r["gly"]
    return glx, gly


def _invert_bilinear(x, y, c):
    """Vectorized Newton for fp, fl in p(fp,fl)=(x,y) over one quad;
    c = (x00,x10,x01,x11,y00,y10,y01,y11)."""
    x00, x10, x01, x11, y00, y10, y01, y11 = c
    fp = np.full_like(x, 0.5)
    fl = np.full_like(x, 0.5)
    for _ in range(8):
        fx = (x00 + fp * (x10 - x00) + fl * (x01 - x00)
              + fp * fl * (x11 - x10 - x01 + x00) - x)
        fy = (y00 + fp * (y10 - y00) + fl * (y01 - y00)
              + fp * fl * (y11 - y10 - y01 + y00) - y)
        j11 = (x10 - x00) + fl * (x11 - x10 - x01 + x00)
        j12 = (x01 - x00) + fp * (x11 - x10 - x01 + x00)
        j21 = (y10 - y00) + fl * (y11 - y10 - y01 + y00)
        j22 = (y01 - y00) + fp * (y11 - y10 - y01 + y00)
        det = j11 * j22 - j12 * j21
        det = np.where(np.abs(det) < 1e-30, 1e-30, det)
        fp = fp - (fx * j22 - fy * j12) / det
        fl = fl - (fy * j11 - fx * j21) / det
    return fp, fl


def build_backmap(glx: np.ndarray, gly: np.ndarray, oversample: float = 2.0):
    """Backmap rasters (pixel, line) over the geo bbox — the reference's
    GenerateBackMap with quad rasterization instead of splat+fill."""
    ys, xs = glx.shape
    xmin, xmax = float(glx.min()), float(glx.max())
    ymin, ymax = float(gly.min()), float(gly.max())
    nbx = int(math.ceil(xs * oversample))
    nby = int(math.ceil(ys * oversample))
    dx = (xmax - xmin) / nbx
    dy = (ymax - ymin) / nby
    bm_px = np.full((nby, nbx), np.nan)
    bm_ln = np.full((nby, nbx), np.nan)
    cx = xmin + (np.arange(nbx) + 0.5) * dx
    cy = ymin + (np.arange(nby) + 0.5) * dy
    for iy in range(ys - 1):
        for ix in range(xs - 1):
            c = (glx[iy, ix], glx[iy, ix + 1], glx[iy + 1, ix],
                 glx[iy + 1, ix + 1], gly[iy, ix], gly[iy, ix + 1],
                 gly[iy + 1, ix], gly[iy + 1, ix + 1])
            qx = np.array(c[:4])
            qy = np.array(c[4:])
            i0 = max(0, int((qx.min() - xmin) / dx) - 1)
            i1 = min(nbx, int((qx.max() - xmin) / dx) + 2)
            j0 = max(0, int((qy.min() - ymin) / dy) - 1)
            j1 = min(nby, int((qy.max() - ymin) / dy) + 2)
            if i0 >= i1 or j0 >= j1:
                continue
            gx, gy = np.meshgrid(cx[i0:i1], cy[j0:j1])
            fp, fl = _invert_bilinear(gx, gy, c)
            inside = ((fp >= -1e-9) & (fp <= 1.0 + 1e-9)
                      & (fl >= -1e-9) & (fl <= 1.0 + 1e-9))
            sub_px = ((ix + fp) * GL_PIXEL_STEP + GL_PIXEL_OFFSET)
            sub_ln = ((iy + fl) * GL_LINE_STEP + GL_LINE_OFFSET)
            blk_px = bm_px[j0:j1, i0:i1]
            blk_ln = bm_ln[j0:j1, i0:i1]
            write = inside & np.isnan(blk_px)
            blk_px[write] = sub_px[write]
            blk_ln[write] = sub_ln[write]
    return {"px": bm_px, "ln": bm_ln, "xmin": xmin, "ymin": ymin,
            "dx": dx, "dy": dy}


def _forward_np(px, ln, glx, gly):
    """numpy mirror of geoloc_transform (same anchor/retreat/unclamped
    extrapolation semantics) + the analytic Jacobian of the surface."""
    ys, xs = glx.shape
    gp = (px - GL_PIXEL_OFFSET) / GL_PIXEL_STEP
    gl = (ln - GL_LINE_OFFSET) / GL_LINE_STEP
    ix = np.clip(np.floor(np.clip(gp, 0, xs - 1)), 0, xs - 2).astype(int)
    iy = np.clip(np.floor(np.clip(gl, 0, ys - 1)), 0, ys - 2).astype(int)
    fp = gp - ix
    fl = gl - iy
    x00 = glx[iy, ix]; x10 = glx[iy, ix + 1]
    x01 = glx[iy + 1, ix]; x11 = glx[iy + 1, ix + 1]
    y00 = gly[iy, ix]; y10 = gly[iy, ix + 1]
    y01 = gly[iy + 1, ix]; y11 = gly[iy + 1, ix + 1]
    gx = (1 - fl) * (x00 + fp * (x10 - x00)) + fl * (x01 + fp * (x11 - x01))
    gy = (1 - fl) * (y00 + fp * (y10 - y00)) + fl * (y01 + fp * (y11 - y01))
    dgx_dp = ((1 - fl) * (x10 - x00) + fl * (x11 - x01)) / GL_PIXEL_STEP
    dgx_dl = ((x01 + fp * (x11 - x01))
              - (x00 + fp * (x10 - x00))) / GL_LINE_STEP
    dgy_dp = ((1 - fl) * (y10 - y00) + fl * (y11 - y01)) / GL_PIXEL_STEP
    dgy_dl = ((y01 + fp * (y11 - y01))
              - (y00 + fp * (y10 - y00))) / GL_LINE_STEP
    return gx, gy, dgx_dp, dgx_dl, dgy_dp, dgy_dl


def geoloc_inverse_df(
    points: DataFrame, glx: np.ndarray, gly: np.ndarray,
    point_id: str = "i", geo_x: str = "geo_x", geo_y: str = "geo_y",
    n_newton: int = 3,
) -> DataFrame:
    """Inverse geoloc transform: backmap seed + Newton refinement against
    the forward surface.  Map-only Arrow kernel; the backmap and geoloc
    arrays ride the closure broadcast (bounded dimension data)."""
    import pandas as pd

    bm = build_backmap(glx, gly)
    spark = points.sparkSession
    b_glx = spark.sparkContext.broadcast(glx)
    b_gly = spark.sparkContext.broadcast(gly)
    b_bm = spark.sparkContext.broadcast(bm)

    def run(batches):
        lx, ly, m = b_glx.value, b_gly.value, b_bm.value
        nby, nbx = m["px"].shape
        for pdf in batches:
            gx = pdf[geo_x].to_numpy(dtype=np.float64)
            gy = pdf[geo_y].to_numpy(dtype=np.float64)
            # nearest backmap cell as the seed (reference: backmap bilinear;
            # nearest + Newton converges identically and needs no NaN taps)
            ci = np.clip(((gx - m["xmin"]) / m["dx"]).astype(int), 0, nbx - 1)
            cj = np.clip(((gy - m["ymin"]) / m["dy"]).astype(int), 0, nby - 1)
            px = m["px"][cj, ci]
            ln = m["ln"][cj, ci]
            # fill any NaN seeds from the array-center fallback
            px = np.where(np.isnan(px), GL_XSIZE * GL_PIXEL_STEP / 2, px)
            ln = np.where(np.isnan(ln), GL_YSIZE * GL_LINE_STEP / 2, ln)
            for _ in range(n_newton):
                fx, fy, j11, j12, j21, j22 = _forward_np(px, ln, lx, ly)
                rx, ry = fx - gx, fy - gy
                det = j11 * j22 - j12 * j21
                det = np.where(np.abs(det) < 1e-30, 1e-30, det)
                px = px - (rx * j22 - ry * j12) / det
                ln = ln - (ry * j11 - rx * j21) / det
            yield pd.DataFrame({
                point_id: pdf[point_id].to_numpy(),
                "px_back": px, "ln_back": ln,
            })

    return points.mapInPandas(
        run, f"{point_id} long, px_back double, ln_back double"
    )
