"""Line rasterization: Bresenham closed-form proof + ALL_TOUCHED
supercover property (alg/llrasterize.cpp GDALdllImageLine:256 /
GDALdllImageLineAllTouched:407 semantics)."""

import math

from pyspark.sql import functions as F

from gdal_spark.operators import rasterize_lines as RL


# ---------------------------------------------------------------------------
# pure-Python references (independent re-implementations, not the closed
# forms under test)
# ---------------------------------------------------------------------------

def _bresenham_recurrence(ix0, iy0, ix1, iy1, skip_last):
    """Classic integer Bresenham via the doubled-error recurrence the
    closed form off(k) = ceil((2k*dmin - dmax)/(2*dmax)) solves:
    e starts at -dmax, gains 2*dmin per driving-axis step, and a
    secondary-axis step fires when e > 0 (ties keep the row)."""
    ddx, ddy = abs(ix1 - ix0), abs(iy1 - iy0)
    xs = -1 if ix0 > ix1 else 1
    ys = -1 if iy0 > iy1 else 1
    dmax, dmin = max(ddx, ddy), min(ddx, ddy)
    xdrv = ddx >= ddy
    n = dmax - (0 if not skip_last else 1)
    if n < 0:
        return []
    pts, off, e = [], 0, -dmax
    for k in range(n + 1):
        if xdrv:
            pts.append((ix0 + k * xs, iy0 + off * ys))
        else:
            pts.append((ix0 + off * xs, iy0 + k * ys))
        e += 2 * dmin
        if e > 0:
            off += 1
            e -= 2 * dmax
    return pts


def _supercover_exact(x0, y0, x1, y1):
    """floor(p) for every point p on the CLOSED segment — the set the
    reference's stepping loop burns (traced on llrasterize.cpp:686-745:
    an exact lattice-corner crossing burns floor(corner) via the
    same-scanline branch).  Exact: evaluate at the endpoints, at every
    lattice crossing, and at one interior point per crossing interval."""
    dx, dy = x1 - x0, y1 - y0
    ts = {0.0, 1.0}
    for c0, d in ((x0, dx), (y0, dy)):
        if d != 0:
            lo, hi = sorted((c0, c0 + d))
            for k in range(math.ceil(lo), math.floor(hi) + 1):
                t = (k - c0) / d
                if 0.0 <= t <= 1.0:
                    ts.add(t)
    ts = sorted(ts)
    probe = list(ts) + [(a + b) / 2 for a, b in zip(ts, ts[1:])]
    px = set()
    for t in probe:
        # evaluate crossings exactly: snap the crossing axis to its int
        x = x0 + t * dx
        y = y0 + t * dy
        xr, yr = round(x), round(y)
        if abs(x - xr) < 1e-9:
            x = xr
        if abs(y - yr) < 1e-9:
            y = yr
        px.add((math.floor(x), math.floor(y)))
    return px


_SEGMENTS = [
    # (x0, y0, x1, y1): shallow / steep / negative slopes, both
    # directions, plus near-vertical and near-horizontal
    (0.35, 0.45, 17.65, 5.15),
    (17.65, 5.15, 0.35, 0.45),
    (2.15, 1.05, 6.85, 19.35),
    (6.85, 19.35, 2.15, 1.05),
    (1.45, 18.25, 19.55, 2.85),
    (3.05, 3.05, 3.05, 14.95),       # exactly vertical
    (2.45, 7.35, 18.55, 7.35),       # exactly horizontal
    (5.205, 2.15, 5.208, 16.85),     # near-vertical (< .01 threshold)
    (1.15, 9.405, 16.95, 9.408),     # near-horizontal (< .01 threshold)
    (4.65, 4.65, 4.65, 4.65),        # degenerate point
    (0.25, 19.75, 19.75, 0.25),      # full-diagonal falling
    (7.35, 2.45, 9.65, 3.55),        # short shallow
]


def _seg_df(spark, segs, is_last=True):
    rows = [(i, 0, is_last, x0, y0, x1, y1, 1.0)
            for i, (x0, y0, x1, y1) in enumerate(segs)]
    return spark.createDataFrame(
        rows, "line_id long, seq int, is_last boolean, x0 double, "
              "y0 double, x1 double, y1 double, burn double")


def test_bresenham_closed_form_equals_recurrence(spark):
    out = RL.burn_segments_bresenham(
        _seg_df(spark, _SEGMENTS), 64, 64).collect()
    got = {}
    for r in out:
        got.setdefault(r["line_id"], []).append((r["ix"], r["iy"]))
    for i, (x0, y0, x1, y1) in enumerate(_SEGMENTS):
        want = _bresenham_recurrence(
            math.floor(x0), math.floor(y0),
            math.floor(x1), math.floor(y1), skip_last=False)
        assert sorted(got.get(i, [])) == sorted(want), f"segment {i}"


def test_bresenham_skips_interior_vertex(spark):
    # two-segment polyline: the shared vertex pixel burns exactly once
    rows = [(0, 0, False, 1.25, 1.25, 8.75, 4.75, 1.0),
            (0, 1, True, 8.75, 4.75, 15.25, 1.25, 1.0)]
    df = spark.createDataFrame(
        rows, "line_id long, seq int, is_last boolean, x0 double, "
              "y0 double, x1 double, y1 double, burn double")
    px = RL.burn_segments_bresenham(df, 64, 64)
    merged = RL.merge_burns(px, merge_alg="add").collect()
    vals = {(r["ix"], r["iy"]): r["val"] for r in merged}
    assert vals[(8, 4)] == 1.0
    assert all(v == 1.0 for v in vals.values())


def test_all_touched_matches_closed_segment_floors(spark):
    out = RL.burn_segments_all_touched(
        _seg_df(spark, _SEGMENTS), 64, 64).collect()
    got = {}
    for r in out:
        got.setdefault(r["line_id"], set()).add((r["ix"], r["iy"]))
    for i, (x0, y0, x1, y1) in enumerate(_SEGMENTS):
        # the reference treats |dx| < .01 as vertical and |dy| < .01 as
        # horizontal (llrasterize.cpp:479,560): the referee must follow,
        # including the floor(end - 1e-4) end-pixel epsilon and the
        # column/row taken from the swapped endpoints
        if abs(x0 - x1) < 0.01:
            xr = max(x0, x1)
            want = _supercover_exact(xr, min(y0, y1), xr,
                                     max(y0, y1) - 1e-4)
        elif abs(y0 - y1) < 0.01:
            yl = y0 if x0 <= x1 else y1
            want = _supercover_exact(min(x0, x1), yl,
                                     max(x0, x1) - 1e-4, yl)
        else:
            want = _supercover_exact(x0, y0, x1, y1)
        assert got.get(i, set()) == want, f"segment {i}"


def test_merge_add_dedup_consecutive(spark):
    # bAvoidBurningSamePoints (llrasterize.cpp:411): a pixel burnt by
    # both a segment and its predecessor in the same line burns once
    rows = [(0, 0, True, 1.45, 1.45, 6.55, 6.55, 2.0),
            (0, 1, True, 6.55, 6.55, 11.45, 1.45, 2.0)]
    df = spark.createDataFrame(
        rows, "line_id long, seq int, is_last boolean, x0 double, "
              "y0 double, x1 double, y1 double, burn double")
    px = RL.burn_segments_all_touched(df, 64, 64)
    plain = {(r["ix"], r["iy"]): r["val"] for r in
             RL.merge_burns(px, "add").collect()}
    dedup = {(r["ix"], r["iy"]): r["val"] for r in
             RL.merge_burns(px, "add", dedup_consecutive=True).collect()}
    assert plain[(6, 6)] == 4.0
    assert dedup[(6, 6)] == 2.0
    # pixels touched by only one segment are unaffected
    assert dedup[(1, 1)] == plain[(1, 1)] == 2.0


def test_bresenham_plan_is_map_only_until_merge(spark):
    # one explode + filters, no join/shuffle before merge_burns
    plan = RL.burn_segments_bresenham(
        _seg_df(spark, _SEGMENTS), 64, 64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_intersect_only_skips_pixel_aligned_edges(spark):
    # GDAL #6414/#7523: a polygon edge lying within 1e-4 of a pixel
    # boundary must not burn in -at mode (bIntersectOnly=true)
    rows = [(0, 0, True, 30.00004, 30.00004, 38.00004, 30.00004, 1.0),
            (0, 1, True, 38.00004, 30.00004, 38.00004, 38.00004, 1.0),
            (0, 2, True, 38.00004, 38.00004, 30.00004, 38.00004, 1.0),
            (0, 3, True, 30.00004, 38.00004, 30.00004, 30.00004, 1.0)]
    df = spark.createDataFrame(
        rows, "line_id long, seq int, is_last boolean, x0 double, "
              "y0 double, x1 double, y1 double, burn double")
    assert RL.burn_segments_all_touched(
        df, 64, 64, intersect_only=True).count() == 0
    # without the flag the same edges burn their floor row/column
    assert RL.burn_segments_all_touched(
        df, 64, 64, intersect_only=False).count() > 0


def test_intersect_only_keeps_off_grid_axis_edges(spark):
    # an axis-aligned edge NOT near a pixel boundary still burns
    rows = [(0, 0, True, 2.35, 6.55, 12.85, 6.55, 1.0)]
    df = spark.createDataFrame(
        rows, "line_id long, seq int, is_last boolean, x0 double, "
              "y0 double, x1 double, y1 double, burn double")
    got = {(r["ix"], r["iy"]) for r in RL.burn_segments_all_touched(
        df, 64, 64, intersect_only=True).collect()}
    # row floor(6.55) = 6, cols floor(2.35)..floor(12.85 - 1e-4)
    assert got == {(i, 6) for i in range(2, 13)}
