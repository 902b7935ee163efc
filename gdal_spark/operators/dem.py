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
