"""Geolocation-array transformer (alg/gdalgeoloc.cpp forward path)."""

import math

from pyspark.sql import functions as F

from gdal_spark.operators import geoloc as GL


def _grid_val(c, r):
    glx = -120.0 + c * 0.5 + r * 0.0625 + ((c * 3 + r * 5) % 8) / 128.0
    gly = 30.0 + r * 0.5 - c * 0.03125 + ((c * 7 + r * 11) % 8) / 256.0
    return glx, gly


def _transform(spark, pts):
    df = spark.createDataFrame(pts, "i long, px double, py double")
    out = GL.geoloc_transform(df, GL.geoloc_grid(spark))
    return {r["i"]: (r["geo_x"], r["geo_y"]) for r in out.collect()}


def test_on_grid_nodes_exact(spark):
    # pixel = 8*gc, line = 8*gr lands exactly on array node (gc, gr)
    got = _transform(spark, [(1, 16.0, 24.0), (2, 0.0, 0.0)])
    assert got[1] == _grid_val(2, 3)
    assert got[2] == _grid_val(0, 0)


def test_midcell_bilinear(spark):
    # halfway between nodes (1,1) and (2,2): fp = fl = 0.5
    got = _transform(spark, [(1, 12.0, 12.0)])
    x00, y00 = _grid_val(1, 1)
    x10, y10 = _grid_val(2, 1)
    x01, y01 = _grid_val(1, 2)
    x11, y11 = _grid_val(2, 2)
    ex = 0.5 * (x00 + 0.5 * (x10 - x00)) + 0.5 * (x01 + 0.5 * (x11 - x01))
    ey = 0.5 * (y00 + 0.5 * (y10 - y00)) + 0.5 * (y01 + 0.5 * (y11 - y01))
    assert math.isclose(got[1][0], ex, rel_tol=1e-14)
    assert math.isclose(got[1][1], ey, rel_tol=1e-14)


def test_beyond_border_linear_extension(spark):
    """Past the right edge the anchor retreats to the last full cell and
    the fraction exceeds 1 — linear extension, not clamping (the
    reference's 'infinite extension beyond borders')."""
    xs = GL.GL_XSIZE
    got = _transform(spark, [(1, 8.0 * (xs - 1) + 8.0, 8.0)])  # one cell past
    # anchor (xs-2, 1) wait: gp = xs, clamp -> xs-1 -> retreat xs-2; fp = 2
    x00, _ = _grid_val(xs - 2, 1)
    x10, _ = _grid_val(xs - 1, 1)
    ex = x00 + 2.0 * (x10 - x00)
    assert math.isclose(got[1][0], ex, rel_tol=1e-12)


def test_negative_pixels_extrapolate_left(spark):
    got = _transform(spark, [(1, -4.0, 0.0)])  # gp = -0.5, anchor 0, fp=-0.5
    x00, _ = _grid_val(0, 0)
    x10, _ = _grid_val(1, 0)
    assert math.isclose(got[1][0], x00 - 0.5 * (x10 - x00), rel_tol=1e-12)


def test_plan_is_broadcast_map_only(spark):
    pts = spark.range(100).select(
        F.col("id").alias("i"),
        (F.col("id") % 120).cast("double").alias("px"),
        (F.col("id") % 88).cast("double").alias("py"),
    )
    out = GL.geoloc_transform(pts, GL.geoloc_grid(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- inverse backmap (round 5) ----------------------------------------------

def test_backmap_roundtrip_numpy():
    """Backmap + Newton recovers interior pixel/line to ~1e-9 px."""
    import numpy as np

    from gdal_spark.operators import geoloc as GL

    xs, ys = GL.GL_XSIZE, GL.GL_YSIZE
    gc, gr = np.meshgrid(np.arange(xs), np.arange(ys))
    glx = -120.0 + gc * 0.5 + gr * 0.0625 + ((gc * 3 + gr * 5) % 8) / 128.0
    gly = 30.0 + gr * 0.5 - gc * 0.03125 + ((gc * 7 + gr * 11) % 8) / 256.0
    bm = GL.build_backmap(glx, gly)
    # oversampled grid: ≥ 2x array size, covers the swath interior
    assert bm["px"].shape[0] >= 2 * ys and bm["px"].shape[1] >= 2 * xs
    px = np.linspace(4, 116, 91)
    ln = np.linspace(4, 84, 91)
    gx, gy, *_ = GL._forward_np(px, ln, glx, gly)
    ci = np.clip(((gx - bm["xmin"]) / bm["dx"]).astype(int),
                 0, bm["px"].shape[1] - 1)
    cj = np.clip(((gy - bm["ymin"]) / bm["dy"]).astype(int),
                 0, bm["px"].shape[0] - 1)
    seeds_px = bm["px"][cj, ci]
    assert np.isnan(seeds_px).mean() < 0.05   # interior seeds resolve
    p2, l2 = seeds_px.copy(), bm["ln"][cj, ci].copy()
    p2 = np.where(np.isnan(p2), 64.0, p2)
    l2 = np.where(np.isnan(l2), 48.0, l2)
    for _ in range(3):
        fx, fy, j11, j12, j21, j22 = GL._forward_np(p2, l2, glx, gly)
        det = j11 * j22 - j12 * j21
        rx, ry = fx - gx, fy - gy
        p2 = p2 - (rx * j22 - ry * j12) / det
        l2 = l2 - (ry * j11 - rx * j21) / det
    assert np.abs(p2 - px).max() < 1e-8
    assert np.abs(l2 - ln).max() < 1e-8


def test_backmap_seed_alone_is_subpixel():
    """Even without Newton, the oversampled backmap seed is < 1 geoloc
    cell off (the reference's raw backmap accuracy contract)."""
    import numpy as np

    from gdal_spark.operators import geoloc as GL

    xs, ys = GL.GL_XSIZE, GL.GL_YSIZE
    gc, gr = np.meshgrid(np.arange(xs), np.arange(ys))
    glx = -120.0 + gc * 0.5 + gr * 0.0625
    gly = 30.0 + gr * 0.5 - gc * 0.03125
    bm = GL.build_backmap(glx, gly)
    px = np.linspace(8, 112, 41)
    ln = np.linspace(8, 80, 41)
    gx, gy, *_ = GL._forward_np(px, ln, glx, gly)
    ci = ((gx - bm["xmin"]) / bm["dx"]).astype(int)
    cj = ((gy - bm["ymin"]) / bm["dy"]).astype(int)
    sp = bm["px"][cj, ci]
    ok = ~np.isnan(sp)
    assert np.abs(sp[ok] - px[ok]).max() < GL.GL_PIXEL_STEP
