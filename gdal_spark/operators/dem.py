"""DEM analysis menu: aspect / TPI / TRI / roughness / color-relief.

Completes the ``gdaldem`` processing-mode menu (slope + hillshade already
live in the closed-form gate, gdal_spark/queries.py): the remaining modes
are 3x3 focal kernels plus a per-pixel LUT.

Reference semantics (apps/gdaldem_lib.cpp):

* Aspect (``GDALAspectAlg``, gdaldem_lib.cpp:1441): Horn-weighted
  ``dx = (w2 + 2*w5 + w8) - (w0 + 2*w3 + w6)`` (east minus west, NOT
  divided by 8*xres — aspect only needs the direction), ``dy`` likewise
  south minus north; ``aspect = atan2(dy, -dx)``; flat cells
  (dx == dy == 0) emit the dst nodata; azimuth mode remaps
  trig-degrees ``a`` to compass via ``a > 90 ? 450 - a : 90 - a``
  (equivalently ``atan2(-dx, dy) mod 360`` — the form used here, which
  keeps every branch boundary on an exact atan2 output so the Spark and
  DuckDB twins cannot disagree at a ULP).
  ``GDALAspectZevenbergenThorneAlg`` (gdaldem_lib.cpp:1481) is the same
  with the unweighted central differences ``dx = w5 - w3, dy = w7 - w1``.
* TRI Riley (``GDALTRIAlgRiley``, gdaldem_lib.cpp:2330): sqrt of the sum
  of squared center-vs-neighbor differences (Riley et al. 1999).
* TRI Wilson (``GDALTRIAlgWilson``, gdaldem_lib.cpp:2317): mean absolute
  center-vs-neighbor difference (Wilson et al. 2007) — x 0.125.
* TPI (``GDALTPIAlg``, gdaldem_lib.cpp:2354): center minus the mean of
  the 8 neighbors.
* Roughness (``GDALRoughnessAlg``, gdaldem_lib.cpp:2369): max - min over
  the full 3x3 window (center included).
* Color relief (``GDALColorReliefGetRGBA``, gdaldem_lib.cpp:1639):
  breakpoint LUT; below-first / above-last clamp to the end colors,
  interior values linearly interpolate each channel with
  ``clamp(int(floor(0.5 + c0 + ratio * (c1 - c0))), 0, 255)``.

Spark-first plan: a 3x3 stencil over a distributed (x, y, val) raster is
ONE shuffle — every pixel is exploded into the 9 windows it participates
in (map-side), then a single groupBy(pixel) with 9 conditional-max partial
aggregates pivots the window into columns ``w0..w8`` (GDAL's afWin row-major
layout, w4 = center).  All kernels are then pure JVM column math over
``w0..w8`` inside whole-stage codegen; color relief is a generated CASE
expression (no UDF, no join).  At 100 TB the explode is a 9x map-side
amplification of a narrow (long, long, double) projection — the shuffle
stays proportional to pixel count, never to payload width, and partial
aggregation combines locally before the exchange.

GDAL's edge behavior (without -compute_edges) leaves border pixels nodata;
``complete_only=True`` mirrors that by keeping only pixels whose 9-cell
window is fully populated.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RAD2DEG = 180.0 / math.pi

# afWin layout (gdaldem_lib.cpp): index k = (dy + 1) * 3 + (dx + 1);
# rows north (y-1) -> south (y+1), each west -> east.
_OFFSETS = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def neighborhood3x3(
    cells: DataFrame,
    x: str = "gx",
    y: str = "gy",
    value: str = "val",
    complete_only: bool = True,
) -> DataFrame:
    """Pivot a distributed raster into per-pixel 3x3 windows.

    Input (x, y, value) -> output (x, y, w0..w8) with ``w4`` the center
    value.  One explode (x9 map-side) + one groupBy(pixel) shuffle with
    conditional-max partial aggregation; no joins, no UDFs.  With
    ``complete_only`` (the gdaldem no-compute-edges default) only pixels
    with all 9 neighbors present survive.
    """
    contrib = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
            )
            for dx, dy in _OFFSETS
        ]
    )
    e = (
        cells.select(
            F.col(x).alias("_sx"), F.col(y).alias("_sy"),
            F.col(value).alias("_sv"),
        )
        .withColumn("_o", F.explode(contrib))
        .select(
            (F.col("_sx") - F.col("_o.dx")).alias("_tx"),
            (F.col("_sy") - F.col("_o.dy")).alias("_ty"),
            ((F.col("_o.dy") + 1) * 3 + (F.col("_o.dx") + 1)).alias("_k"),
            "_sv",
        )
    )
    win = e.groupBy("_tx", "_ty").agg(
        *[
            F.max(F.when(F.col("_k") == k, F.col("_sv"))).alias(f"w{k}")
            for k in range(9)
        ]
    )
    if complete_only:
        cond = F.col("w0").isNotNull()
        for k in range(1, 9):
            cond = cond & F.col(f"w{k}").isNotNull()
        win = win.filter(cond)
    return win.select(
        F.col("_tx").alias(x), F.col("_ty").alias(y),
        *[f"w{k}" for k in range(9)],
    )


def _horn_dxdy(w) -> tuple[Column, Column]:
    dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    return dx, dy


def _zt_dxdy(w) -> tuple[Column, Column]:
    return w[5] - w[3], w[7] - w[1]


def _aspect_from(dx: Column, dy: Column, azimuth: bool,
                 nodata: float) -> Column:
    if azimuth:
        # 90 - atan2(dy,-dx) mod 360  ==  atan2(-dx, dy) mod 360: the mod
        # branch tests atan2 output against 0/±180 — exact in any libm.
        a = F.atan2(-dx, dy) * F.lit(_RAD2DEG)
        out = F.when(a < 0, a + 360.0).otherwise(a)
    else:
        a = F.atan2(dy, -dx) * F.lit(_RAD2DEG)
        out = F.when(a < 0, a + 360.0).otherwise(a)
    out = F.when(out == 360.0, F.lit(0.0)).otherwise(out)
    return F.when((dx == 0) & (dy == 0), F.lit(float(nodata))).otherwise(out)


def aspect_col(w: Sequence[Column] | None = None, azimuth: bool = True,
               zevenbergen: bool = False, nodata: float = -9999.0) -> Column:
    """Aspect over a w0..w8 window (gdaldem aspect)."""
    w = _wcols(w)
    dx, dy = _zt_dxdy(w) if zevenbergen else _horn_dxdy(w)
    return _aspect_from(dx, dy, azimuth, nodata)


def tri_riley_col(w: Sequence[Column] | None = None) -> Column:
    w = _wcols(w)
    s = None
    for k in range(9):
        if k == 4:
            continue
        d = (w[k] - w[4]) * (w[k] - w[4])
        s = d if s is None else s + d
    return F.sqrt(s)


def tri_wilson_col(w: Sequence[Column] | None = None) -> Column:
    w = _wcols(w)
    s = None
    for k in range(9):
        if k == 4:
            continue
        d = F.abs(w[k] - w[4])
        s = d if s is None else s + d
    return s * F.lit(0.125)


def tpi_col(w: Sequence[Column] | None = None) -> Column:
    w = _wcols(w)
    s = None
    for k in range(9):
        if k == 4:
            continue
        s = w[k] if s is None else s + w[k]
    return w[4] - s * F.lit(0.125)


def roughness_col(w: Sequence[Column] | None = None) -> Column:
    w = _wcols(w)
    return F.greatest(*w) - F.least(*w)


def _wcols(w: Sequence[Column] | None) -> list[Column]:
    if w is None:
        return [F.col(f"w{k}") for k in range(9)]
    return list(w)


# ---------------------------------------------------------------------------
# Color relief
# ---------------------------------------------------------------------------

ColorEntry = tuple[float, int, int, int, int]  # (value, r, g, b, a)


def _check_entries(entries: Sequence[ColorEntry]) -> list[ColorEntry]:
    ents = sorted(entries, key=lambda e: e[0])
    if len(ents) < 1:
        raise ValueError("color relief needs at least one entry")
    return ents


def color_relief_cols(val: Column,
                      entries: Sequence[ColorEntry]) -> list[Column]:
    """RGBA columns for gdaldem color-relief (interpolate mode).

    Generated nested CASE per channel; exact-integer arithmetic where the
    breakpoints and colors are integers, so the Spark and SQL twins agree
    bit-for-bit.
    """
    ents = _check_entries(entries)

    def chan(ci: int) -> Column:
        out = F.lit(ents[-1][1 + ci])  # above last -> last color
        # walk intervals from the top so the lowest test wins the CASE chain
        expr = out
        for i in range(len(ents) - 1, 0, -1):
            v0, *c0 = ents[i - 1]
            v1, *c1 = ents[i]
            ratio = (val - F.lit(float(v0))) / F.lit(float(v1 - v0))
            interp = F.floor(
                F.lit(0.5) + F.lit(float(c0[ci]))
                + ratio * F.lit(float(c1[ci] - c0[ci]))
            ).cast("int")
            interp = F.greatest(F.lit(0), F.least(F.lit(255), interp))
            expr = F.when(val <= F.lit(float(v1)), interp).otherwise(expr)
        expr = F.when(
            val <= F.lit(float(ents[0][0])), F.lit(ents[0][1 + ci])
        ).otherwise(expr)
        return expr.cast("int")

    return [chan(c) for c in range(4)]


# ---------------------------------------------------------------------------
# Hillshade menu: standard / combined / Igor / multidirectional
# ---------------------------------------------------------------------------
#
# Reference semantics (apps/gdaldem_lib.cpp, float32 there — float64 here,
# which is what makes the Spark and DuckDB twins cross-engine comparable):
#
# * Gradient (Gradient<T, HORN>::calc, gdaldem_lib.cpp:783):
#   x = ((w0 + 2*w3 + w6) - (w2 + 2*w5 + w8)) / (xres * xscale)
#   y = ((w6 + 2*w7 + w8) - (w0 + 2*w1 + w2)) / (yres * yscale)
#   with yres NEGATIVE for north-up rasters (geotransform[5]); the z
#   factor z/8 (z/2 for Zevenbergen-Thorne) is folded into the shading
#   constants exactly as GDALCreateHillshadeData does.
# * Standard (GDALHillshadeAlg, :1016): cang_mul_254 =
#   (254*sin(alt) - (y*cos(az) - x*sin(az))*cos(alt)*zf*254)
#   / sqrt(1 + zf^2*(x^2+y^2)); output 1.0 when <= 0 else 1 + cang_mul_254.
# * Combined (GDALHillshadeCombinedAlg, :1151): slope = zf^2*(x^2+y^2);
#   cang = 1 - acos(standard_cosine) * atan(sqrt(slope)) * 4/pi^2;
#   output 1.0 when <= 0 else 1 + 254*cang.
# * Igor (GDALHillshadeIgorAlg, :947): slopeStrength = slopeDeg/90;
#   aspect = atan2(dy2, -dx_aspect) (unscaled Horn sums, aspect-sign
#   convention); aspectStrength = 1 - angdiff(aspect, 3pi/2 - az)/pi;
#   output 255 * (1 - slopeStrength*aspectStrength).
# * Multidirectional (GDALHillshadeMultiDirectionalAlg, :1255, USGS
#   OF 92-422): per-azimuth lambertian terms at 225/270/315/360 deg
#   clamped at 0, blended with weights sin^2(aspect - az) expressed in
#   x/y (w225 = (x^2+y^2)/2 - x*y, w270 = x^2, w315 = (x^2+y^2) - w225,
#   w360 = y^2), normalized by (x^2+y^2) and the slope denominator; flat
#   pixels return 1 + 254*sin(alt).

_HS_MODES = ("standard", "combined", "igor", "multidirectional")


def _hs_consts(z: float, xres: float, yres: float, xscale: float,
               yscale: float, alt: float, az: float,
               zevenbergen: bool) -> dict:
    zf = z / (2.0 if zevenbergen else 8.0)
    altr, azr = math.radians(alt), math.radians(az)
    return {
        "inv_ew": 1.0 / (xres * xscale),
        "inv_ns": 1.0 / (yres * yscale),
        "zf": zf,
        "sin_alt": math.sin(altr),
        "cos_az_cos_alt_z": math.cos(azr) * math.cos(altr) * zf,
        "sin_az_cos_alt_z": math.sin(azr) * math.cos(altr) * zf,
        "square_z": zf * zf,
        "cos_alt_z": math.cos(altr) * zf,
        "cos225_cos_alt_z": math.cos(math.radians(225.0))
        * math.cos(altr) * zf,
        # Igor's reference direction 3pi/2 - az, pre-normalized into
        # [0, 2pi) so the twins share one constant
        "igor_ref": (1.5 * math.pi - azr) % (2.0 * math.pi),
    }


def hillshade_col(mode: str = "standard",
                  w: Sequence[Column] | None = None,
                  z: float = 1.0, xres: float = 1.0, yres: float = -1.0,
                  xscale: float = 1.0, yscale: float = 1.0,
                  alt: float = 45.0, az: float = 315.0,
                  zevenbergen: bool = False) -> Column:
    """One hillshade mode over a w0..w8 window as pure column math."""
    if mode not in _HS_MODES:
        raise ValueError(f"unknown hillshade mode {mode!r}")
    w = _wcols(w)
    c = _hs_consts(z, xres, yres, xscale, yscale, alt, az, zevenbergen)
    if zevenbergen:
        x = (w[3] - w[5]) * F.lit(c["inv_ew"])
        y = (w[7] - w[1]) * F.lit(c["inv_ns"])
    else:
        x = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) \
            * F.lit(c["inv_ew"])
        y = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) \
            * F.lit(c["inv_ns"])
    xx_yy = x * x + y * y

    if mode == "standard":
        num = (
            F.lit(254.0 * c["sin_alt"])
            - (y * F.lit(254.0 * c["cos_az_cos_alt_z"])
               - x * F.lit(254.0 * c["sin_az_cos_alt_z"]))
        )
        cang = num / F.sqrt(F.lit(1.0) + F.lit(c["square_z"]) * xx_yy)
        return F.when(cang <= 0.0, F.lit(1.0)).otherwise(F.lit(1.0) + cang)

    if mode == "combined":
        slope = xx_yy * F.lit(c["square_z"])
        cosine = (
            F.lit(c["sin_alt"])
            - (y * F.lit(c["cos_az_cos_alt_z"])
               - x * F.lit(c["sin_az_cos_alt_z"]))
        ) / F.sqrt(F.lit(1.0) + slope)
        cang = F.lit(1.0) - F.acos(cosine) * F.atan(F.sqrt(slope)) \
            * F.lit(4.0 / (math.pi * math.pi))
        return F.when(cang <= 0.0, F.lit(1.0)).otherwise(
            F.lit(1.0) + F.lit(254.0) * cang
        )

    if mode == "igor":
        slope_deg = F.degrees(F.atan(F.sqrt(xx_yy) * F.lit(c["zf"])))
        if zevenbergen:
            adx = w[5] - w[3]
            ady = w[7] - w[1]
        else:
            # aspect gradient: unscaled Horn sums, east-positive sign
            adx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
            ady = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
        aspect = F.atan2(ady, -adx)
        # DifferenceBetweenAngles(aspect, 3pi/2 - az, 2pi): aspect is in
        # (-pi, pi] so its normalization is one conditional add
        n1 = F.when(aspect < 0, aspect + F.lit(2.0 * math.pi)) \
            .otherwise(aspect)
        diff = F.abs(n1 - F.lit(c["igor_ref"]))
        diff = F.when(diff > F.lit(math.pi),
                      F.lit(2.0 * math.pi) - diff).otherwise(diff)
        strength = (slope_deg * F.lit(1.0 / 90.0)) \
            * (F.lit(1.0) - diff * F.lit(1.0 / math.pi))
        return F.lit(255.0) * (F.lit(1.0) - strength)

    # multidirectional
    def clamp0(v: Column) -> Column:
        return F.when(v <= 0.0, F.lit(0.0)).otherwise(v)

    v225 = clamp0(F.lit(127.0 * c["sin_alt"])
                  + (x - y) * F.lit(127.0 * c["cos225_cos_alt_z"]))
    v270 = clamp0(F.lit(127.0 * c["sin_alt"])
                  - x * F.lit(127.0 * c["cos_alt_z"]))
    v315 = clamp0(F.lit(127.0 * c["sin_alt"])
                  + (x + y) * F.lit(127.0 * c["cos225_cos_alt_z"]))
    v360 = clamp0(F.lit(127.0 * c["sin_alt"])
                  - y * F.lit(127.0 * c["cos_alt_z"]))
    w225 = F.lit(0.5) * xx_yy - x * y
    w270 = x * x
    w315 = xx_yy - w225
    w360 = y * y
    blended = (w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360) / xx_yy
    cang = F.lit(1.0) + blended / F.sqrt(
        F.lit(1.0) + F.lit(c["square_z"]) * xx_yy
    )
    return F.when(xx_yy == 0.0,
                  F.lit(1.0 + 254.0 * c["sin_alt"])).otherwise(cang)


def sql_hillshade(mode: str, nbr: Sequence[str],
                  z: float = 1.0, xres: float = 1.0, yres: float = -1.0,
                  xscale: float = 1.0, yscale: float = 1.0,
                  alt: float = 45.0, az: float = 315.0,
                  zevenbergen: bool = False) -> str:
    """DuckDB twin of :func:`hillshade_col` — identical expression tree
    and double constants over 9 neighbor-pixel SQL expressions (afWin
    order), so the engines agree to libm ULP."""
    if mode not in _HS_MODES:
        raise ValueError(f"unknown hillshade mode {mode!r}")
    c = _hs_consts(z, xres, yres, xscale, yscale, alt, az, zevenbergen)
    n = [f"({e})" for e in nbr]
    if zevenbergen:
        x = f"(({n[3]} - {n[5]}) * {c['inv_ew']!r})"
        y = f"(({n[7]} - {n[1]}) * {c['inv_ns']!r})"
    else:
        x = (f"((({n[0]} + {n[3]} + {n[3]} + {n[6]}) - "
             f"({n[2]} + {n[5]} + {n[5]} + {n[8]})) * {c['inv_ew']!r})")
        y = (f"((({n[6]} + {n[7]} + {n[7]} + {n[8]}) - "
             f"({n[0]} + {n[1]} + {n[1]} + {n[2]})) * {c['inv_ns']!r})")
    xx_yy = f"({x} * {x} + {y} * {y})"

    if mode == "standard":
        num = (f"({254.0 * c['sin_alt']!r} - ({y} * "
               f"{254.0 * c['cos_az_cos_alt_z']!r} - {x} * "
               f"{254.0 * c['sin_az_cos_alt_z']!r}))")
        cang = f"({num} / sqrt(1.0 + {c['square_z']!r} * {xx_yy}))"
        return f"CASE WHEN {cang} <= 0.0 THEN 1.0 ELSE 1.0 + {cang} END"

    if mode == "combined":
        slope = f"({xx_yy} * {c['square_z']!r})"
        cosine = (f"(({c['sin_alt']!r} - ({y} * {c['cos_az_cos_alt_z']!r} "
                  f"- {x} * {c['sin_az_cos_alt_z']!r})) / "
                  f"sqrt(1.0 + {slope}))")
        cang = (f"(1.0 - acos({cosine}) * atan(sqrt({slope})) * "
                f"{4.0 / (math.pi * math.pi)!r})")
        return (f"CASE WHEN {cang} <= 0.0 THEN 1.0 "
                f"ELSE 1.0 + 254.0 * {cang} END")

    if mode == "igor":
        slope_deg = f"degrees(atan(sqrt({xx_yy}) * {c['zf']!r}))"
        if zevenbergen:
            adx = f"({n[5]} - {n[3]})"
            ady = f"({n[7]} - {n[1]})"
        else:
            adx = (f"(({n[2]} + {n[5]} + {n[5]} + {n[8]}) - "
                   f"({n[0]} + {n[3]} + {n[3]} + {n[6]}))")
            ady = (f"(({n[6]} + {n[7]} + {n[7]} + {n[8]}) - "
                   f"({n[0]} + {n[1]} + {n[1]} + {n[2]}))")
        aspect = f"atan2({ady}, -{adx})"
        n1 = (f"(CASE WHEN {aspect} < 0 THEN {aspect} + "
              f"{2.0 * math.pi!r} ELSE {aspect} END)")
        diff = f"abs({n1} - {c['igor_ref']!r})"
        diff = (f"(CASE WHEN {diff} > {math.pi!r} THEN "
                f"{2.0 * math.pi!r} - {diff} ELSE {diff} END)")
        strength = (f"(({slope_deg}) * {1.0 / 90.0!r}) * "
                    f"(1.0 - {diff} * {1.0 / math.pi!r})")
        return f"255.0 * (1.0 - {strength})"

    # multidirectional
    def clamp0(v: str) -> str:
        return f"(CASE WHEN {v} <= 0.0 THEN 0.0 ELSE {v} END)"

    sa127 = repr(127.0 * c["sin_alt"])
    v225 = clamp0(f"({sa127} + ({x} - {y}) * "
                  f"{127.0 * c['cos225_cos_alt_z']!r})")
    v270 = clamp0(f"({sa127} - {x} * {127.0 * c['cos_alt_z']!r})")
    v315 = clamp0(f"({sa127} + ({x} + {y}) * "
                  f"{127.0 * c['cos225_cos_alt_z']!r})")
    v360 = clamp0(f"({sa127} - {y} * {127.0 * c['cos_alt_z']!r})")
    w225 = f"(0.5 * {xx_yy} - {x} * {y})"
    w270 = f"({x} * {x})"
    w315 = f"({xx_yy} - {w225})"
    w360 = f"({y} * {y})"
    blended = (f"(({w225} * {v225} + {w270} * {v270} + {w315} * {v315} + "
               f"{w360} * {v360}) / {xx_yy})")
    cang = (f"(1.0 + {blended} / sqrt(1.0 + {c['square_z']!r} * {xx_yy}))")
    return (f"CASE WHEN {xx_yy} = 0.0 THEN {1.0 + 254.0 * c['sin_alt']!r} "
            f"ELSE {cang} END")


def sql_color_relief(val_expr: str, entries: Sequence[ColorEntry]) -> list[str]:
    """DuckDB twin of :func:`color_relief_cols` — same CASE structure and
    the same double literals, so interpolation is cross-engine exact."""
    ents = _check_entries(entries)

    def chan(ci: int) -> str:
        expr = str(ents[-1][1 + ci])
        for i in range(len(ents) - 1, 0, -1):
            v0, *c0 = ents[i - 1]
            v1, *c1 = ents[i]
            ratio = f"((({val_expr}) - {float(v0)!r}) / {float(v1 - v0)!r})"
            interp = (
                f"greatest(0, least(255, floor(0.5 + {float(c0[ci])!r} + "
                f"{ratio} * {float(c1[ci] - c0[ci])!r})::int))"
            )
            expr = (
                f"CASE WHEN ({val_expr}) <= {float(v1)!r} THEN {interp} "
                f"ELSE {expr} END"
            )
        expr = (
            f"CASE WHEN ({val_expr}) <= {float(ents[0][0])!r} "
            f"THEN {ents[0][1 + ci]} ELSE {expr} END"
        )
        return f"({expr})::int"

    return [chan(c) for c in range(4)]
