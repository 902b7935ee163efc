"""Line rasterization: Bresenham burn + ALL_TOUCHED supercover.

Completes the gdal_rasterize geometry menu (points and exact polygon
scanline fill already live in gdal_spark/queries.py): linestring burning
in the reference's two modes.

Reference semantics (alg/llrasterize.cpp):

* ``GDALdllImageLine`` (llrasterize.cpp:256): classic integer Bresenham
  per segment over the floor()-ed endpoints; the driving axis is the one
  with the larger |delta|; intermediate vertices are burnt only once
  (the end point of every non-final segment is skipped,
  llrasterize.cpp:330 "Do not burn the end point") so MERGE_ALG=ADD has
  no double-burn artifacts; the optional variant (Z) interpolates
  linearly per driving-axis step.
* ``GDALdllImageLineAllTouched`` (llrasterize.cpp:407): every pixel the
  segment passes through ("supercover").  Segments are first swapped
  left-to-right; |dx| < .01 is treated as vertical and |dy| < .01 as
  horizontal, both with the end pixel computed as
  ``floor(end - 1e-4)`` (EPSILON_INTERSECT_ONLY); the general case steps
  pixel to pixel, which burns, per X column, every row the segment
  crosses while x is strictly below the column/segment end.

Spark-first re-derivation (NOT a port of the stepping loops):

* Bresenham's error recurrence has the closed form
  ``off(k) = ceil((2*k*dmin - dmax) / (2*dmax))`` for the k-th pixel
  along the driving axis (off = cumulative secondary-axis steps; proven
  against the reference recurrence in tests/test_rasterize_lines.py), so
  the whole algorithm is one ``explode(sequence(0, n))`` plus column
  math — map-side, JVM-only, amplification proportional to the burnt
  pixel count exactly like the reference's loop.
* The ALL_TOUCHED stepping loop burns, in column iX, the rows from
  ``floor(y_enter)`` to the last row whose boundary is crossed while
  ``x < min(column end, segment end)``:
  rising segments: ``r_hi = ceil(y_exit) - 1`` (a row entered exactly at
  the corner belongs to the next column); falling segments:
  ``r_lo = floor(y_exit)`` (rows are entered at their OPEN upper edge).
  That turns the loop into two nested explodes (columns, then rows per
  column) of pure column arithmetic.

At 100 TB: the input is a distributed segment table; every stage is
map-side explode + filter until the single groupBy(pixel) merge shuffle
(partial aggregation combines map-side).  No joins except the optional
consecutive-segment dedup anti-join (ADD mode parity), which is a
co-partitioned equi-join on (line_id, seq, pixel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPSILON_INTERSECT_ONLY = 1e-4  # llrasterize.cpp:419


# ---------------------------------------------------------------------------
# Bresenham (GDALdllImageLine)
# ---------------------------------------------------------------------------

def burn_segments_bresenham(
    segments: DataFrame, width: int, height: int,
    line_id: str = "line_id", seq: str = "seq", is_last: str = "is_last",
    x0: str = "x0", y0: str = "y0", x1: str = "x1", y1: str = "y1",
    burn: str = "burn", z: "tuple[str, str] | None" = None,
) -> DataFrame:
    """Per-segment Bresenham pixels -> (line_id, seq, ix, iy, burn).

    One explode over the driving axis; off(k) closed form replaces the
    error recurrence.  End points of non-final segments are skipped
    (llrasterize.cpp:330) so polyline vertices burn once.

    ``z=(z0_col, z1_col)`` enables BURN_VALUE_FROM=Z (llrasterize.cpp:
    322,361): the variant interpolates linearly over the FLOORED
    driving-axis pixel delta — v(k) = v0 + k*(v1-v0)/dmax, v(k) = v0
    when dmax = 0 — and is emitted as an extra ``zval`` column.
    """
    ix0 = F.floor(F.col(x0)).cast("long")
    iy0 = F.floor(F.col(y0)).cast("long")
    ix1 = F.floor(F.col(x1)).cast("long")
    iy1 = F.floor(F.col(y1)).cast("long")
    zcols = []
    if z is not None:
        zcols = [F.col(z[0]).alias("_z0"), F.col(z[1]).alias("_z1")]
    p = segments.select(
        F.col(line_id).alias("line_id"), F.col(seq).alias("seq"),
        F.col(burn).alias("burn"), *zcols,
        ix0.alias("_ix0"), iy0.alias("_iy0"),
        F.abs(ix1 - ix0).alias("_ddx"), F.abs(iy1 - iy0).alias("_ddy"),
        F.when(ix0 > ix1, F.lit(-1)).otherwise(F.lit(1)).alias("_xs"),
        F.when(iy0 > iy1, F.lit(-1)).otherwise(F.lit(1)).alias("_ys"),
        F.col(is_last).alias("_last"),
    ).select(
        "*",
        F.greatest("_ddx", "_ddy").alias("_dmax"),
        F.least("_ddx", "_ddy").alias("_dmin"),
        (F.col("_ddx") >= F.col("_ddy")).alias("_xdrv"),
    ).select(
        "*",
        (F.col("_dmax")
         - F.when(F.col("_last"), F.lit(0)).otherwise(F.lit(1)))
        .alias("_n"),
    )
    # Spark's sequence() descends when start > stop, so guard + filter
    e = p.filter(F.col("_n") >= 0).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.greatest("_n", F.lit(0))))
        .alias("_k"),
    ).filter(F.col("_k") <= F.col("_n"))
    # closed form of the Bresenham error recurrence (secondary-axis steps
    # after k driving-axis steps); dmax = 0 -> single pixel, off = 0
    off = F.when(F.col("_dmax") == 0, F.lit(0)).otherwise(
        F.ceil(
            (2 * F.col("_k") * F.col("_dmin") - F.col("_dmax"))
            / (2.0 * F.col("_dmax"))
        )
    ).cast("long")
    ix = F.when(
        F.col("_xdrv"), F.col("_ix0") + F.col("_k") * F.col("_xs")
    ).otherwise(F.col("_ix0") + off * F.col("_xs"))
    iy = F.when(
        F.col("_xdrv"), F.col("_iy0") + off * F.col("_ys")
    ).otherwise(F.col("_iy0") + F.col("_k") * F.col("_ys"))
    out_cols = ["line_id", "seq", ix.alias("ix"), iy.alias("iy"), "burn"]
    if z is not None:
        zval = F.when(F.col("_dmax") == 0, F.col("_z0")).otherwise(
            F.col("_z0")
            + F.col("_k") * (F.col("_z1") - F.col("_z0")) / F.col("_dmax")
        )
        out_cols.append(zval.alias("zval"))
    return e.select(*out_cols).filter(
        (F.col("ix") >= 0) & (F.col("ix") < width)
        & (F.col("iy") >= 0) & (F.col("iy") < height)
    )


def sql_bresenham_pixels(
    segs: str, width: int, height: int, z: bool = False,
) -> str:
    """DuckDB twin of :func:`burn_segments_bresenham` over a CTE named
    ``segs`` with columns (line_id, seq, is_last, x0, y0, x1, y1, burn).
    Returns a SELECT producing (line_id, seq, ix, iy, burn).  With
    ``z=True`` the CTE must also carry (z0, z1) and the output gains the
    interpolated ``zval`` (v0 + k*(v1-v0)/dmax over the floored
    driving-axis delta, llrasterize.cpp:322,361)."""
    zsel = zthru0 = zthru1 = ""
    if z:
        zsel = """,
       CASE WHEN _dmax = 0 THEN _z0
            ELSE _z0 + _k * (_z1 - _z0) / _dmax END AS zval"""
        zthru0 = " z0 AS _z0, z1 AS _z1,"
        zthru1 = " _z0, _z1,"
    return f"""
SELECT line_id, seq,
       CASE WHEN _xdrv THEN _ix0 + _k * _xs
            ELSE _ix0 + _off * _xs END AS ix,
       CASE WHEN _xdrv THEN _iy0 + _off * _ys
            ELSE _iy0 + _k * _ys END AS iy,
       burn{zsel}
FROM (
  SELECT *,
         CASE WHEN _dmax = 0 THEN 0
              ELSE ceil((2 * _k * _dmin - _dmax) / (2.0 * _dmax))::bigint
         END AS _off
  FROM (
    SELECT *, unnest(generate_series(0, _n)) AS _k
    FROM (
      SELECT line_id, seq, burn,{zthru1} _ix0, _iy0, _xs, _ys,
             greatest(_ddx, _ddy) AS _dmax, least(_ddx, _ddy) AS _dmin,
             _ddx >= _ddy AS _xdrv,
             greatest(_ddx, _ddy)
               - CASE WHEN is_last THEN 0 ELSE 1 END AS _n
      FROM (
        SELECT line_id, seq, is_last, burn,{zthru0}
               floor(x0)::bigint AS _ix0, floor(y0)::bigint AS _iy0,
               abs(floor(x1)::bigint - floor(x0)::bigint) AS _ddx,
               abs(floor(y1)::bigint - floor(y0)::bigint) AS _ddy,
               CASE WHEN floor(x0) > floor(x1) THEN -1 ELSE 1 END AS _xs,
               CASE WHEN floor(y0) > floor(y1) THEN -1 ELSE 1 END AS _ys
        FROM {segs}
      )
    ) WHERE _n >= 0
  )
)
WHERE ix >= 0 AND ix < {width} AND iy >= 0 AND iy < {height}"""


# ---------------------------------------------------------------------------
# ALL_TOUCHED (GDALdllImageLineAllTouched)
# ---------------------------------------------------------------------------

def burn_segments_all_touched(
    segments: DataFrame, width: int, height: int,
    line_id: str = "line_id", seq: str = "seq",
    x0: str = "x0", y0: str = "y0", x1: str = "x1", y1: str = "y1",
    burn: str = "burn", intersect_only: bool = False,
) -> DataFrame:
    """Supercover pixels per segment -> (line_id, seq, ix, iy, burn).

    Two nested explodes (X columns, then the row span crossed within
    each column); the .01 vertical/horizontal thresholds and the 1e-4
    end-pixel epsilon follow llrasterize.cpp:479,560.  Assumes geometry
    is inside (or near) the raster — fully-off-raster pixels are
    filtered, matching the reference's clipping for in-range input.

    ``intersect_only`` is the reference's bIntersectOnly (set when
    burning POLYGON boundaries in ALL_TOUCHED mode,
    gdalrasterize.cpp:748): vertical/horizontal segments whose constant
    coordinate sits within 1e-4 of a pixel boundary are skipped
    entirely, so pixel-aligned polygon edges do not over-burn the
    neighbouring row/column (GDAL issues #6414 / #7523).
    """
    eps = EPSILON_INTERSECT_ONLY
    # left-to-right swap (llrasterize.cpp:470)
    sx0 = F.least(F.col(x0), F.col(x1))
    sx1 = F.greatest(F.col(x0), F.col(x1))
    sy0 = F.when(F.col(x0) <= F.col(x1), F.col(y0)).otherwise(F.col(y1))
    sy1 = F.when(F.col(x0) <= F.col(x1), F.col(y1)).otherwise(F.col(y0))
    p = segments.select(
        F.col(line_id).alias("line_id"), F.col(seq).alias("seq"),
        F.col(burn).alias("burn"),
        sx0.alias("_x0"), sy0.alias("_y0"),
        sx1.alias("_x1"), sy1.alias("_y1"),
    )
    vert = F.abs(F.col("_x0") - F.col("_x1")) < 0.01
    horz = F.abs(F.col("_y0") - F.col("_y1")) < 0.01
    if intersect_only:
        aligned_x = (
            (F.abs(F.col("_x0") - F.round(F.col("_x0"))) < F.lit(eps))
            & (F.abs(F.col("_x1") - F.round(F.col("_x1"))) < F.lit(eps))
        )
        aligned_y = (
            (F.abs(F.col("_y0") - F.round(F.col("_y0"))) < F.lit(eps))
            & (F.abs(F.col("_y1") - F.round(F.col("_y1"))) < F.lit(eps))
        )
        p = p.filter(~(vert & aligned_x) & ~(horz & aligned_y))
    # column range: vertical -> the single floor(x1) column; horizontal
    # -> floor(xmin)..floor(xmax - eps); general -> floor(x0) up to the
    # last column whose entry x is strictly below the segment end
    cx_lo = F.when(vert, F.floor(F.col("_x1"))).otherwise(
        F.floor(F.col("_x0"))
    ).cast("long")
    gen_cx_hi = (
        F.floor(F.col("_x1")).cast("long")
        - F.when(F.col("_x1") == F.floor(F.col("_x1")), F.lit(1))
        .otherwise(F.lit(0))
    )
    cx_hi = (
        F.when(vert, F.floor(F.col("_x1")))
        .when(horz, F.floor(F.col("_x1") - F.lit(eps)))
        .otherwise(gen_cx_hi)
    ).cast("long")
    cols = p.select(
        "*", cx_lo.alias("_cxlo"), cx_hi.alias("_cxhi"),
        vert.alias("_vert"), horz.alias("_horz"),
    ).filter(
        (F.col("_cxhi") >= F.col("_cxlo"))
        & (F.col("_cxhi") >= 0) & (F.col("_cxlo") < width)
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.greatest("_cxlo", F.lit(0).cast("long")),
                F.least("_cxhi", F.lit(int(width - 1)).cast("long")),
            )
        ).alias("ix"),
    )
    slope = (F.col("_y1") - F.col("_y0")) / (F.col("_x1") - F.col("_x0"))
    y_in = F.col("_y0") + (
        F.greatest(F.col("_x0"), F.col("ix").cast("double")) - F.col("_x0")
    ) * slope
    y_out = F.col("_y0") + (
        F.least(F.col("_x1"), (F.col("ix") + 1).cast("double"))
        - F.col("_x0")
    ) * slope
    rising = F.col("_y1") >= F.col("_y0")
    gen_rlo = F.when(
        rising, F.floor(y_in)
    ).otherwise(F.least(F.floor(y_in), F.floor(y_out))).cast("long")
    gen_rhi = F.when(
        rising,
        F.greatest(F.floor(y_in), F.ceil(y_out) - 1),
    ).otherwise(F.floor(y_in)).cast("long")
    v_lo = F.floor(F.least(F.col("_y0"), F.col("_y1"))).cast("long")
    v_hi = F.floor(
        F.greatest(F.col("_y0"), F.col("_y1")) - F.lit(eps)
    ).cast("long")
    r_lo = (
        F.when(F.col("_vert"), v_lo)
        .when(F.col("_horz"), F.floor(F.col("_y0")))
        .otherwise(gen_rlo)
    ).cast("long")
    r_hi = (
        F.when(F.col("_vert"), v_hi)
        .when(F.col("_horz"), F.floor(F.col("_y0")))
        .otherwise(gen_rhi)
    ).cast("long")
    rows = cols.select(
        "line_id", "seq", "burn", "ix",
        r_lo.alias("_rlo"), r_hi.alias("_rhi"),
    ).filter(
        (F.col("_rhi") >= F.col("_rlo"))
        & (F.col("_rhi") >= 0) & (F.col("_rlo") < height)
    ).select(
        "line_id", "seq", "burn", "ix",
        F.explode(
            F.sequence(
                F.greatest("_rlo", F.lit(0).cast("long")),
                F.least("_rhi", F.lit(int(height - 1)).cast("long")),
            )
        ).alias("iy"),
    )
    return rows.select("line_id", "seq", "ix", "iy", "burn")


def sql_all_touched_pixels(
    segs: str, width: int, height: int, intersect_only: bool = False,
) -> str:
    """DuckDB twin of :func:`burn_segments_all_touched` over a CTE named
    ``segs`` (line_id, seq, x0, y0, x1, y1, burn) ->
    (line_id, seq, ix, iy, burn)."""
    eps = EPSILON_INTERSECT_ONLY
    skip = ""
    if intersect_only:
        skip = f""" AND NOT (_vert
            AND abs(_x0 - round(_x0)) < {eps!r}
            AND abs(_x1 - round(_x1)) < {eps!r})
          AND NOT (_horz
            AND abs(_y0 - round(_y0)) < {eps!r}
            AND abs(_y1 - round(_y1)) < {eps!r})"""
    return f"""
SELECT line_id, seq, ix,
       unnest(generate_series(greatest(_rlo, 0),
                              least(_rhi, {height - 1}))) AS iy,
       burn
FROM (
  SELECT line_id, seq, burn, ix,
         CASE WHEN _vert THEN floor(least(_y0, _y1))::bigint
              WHEN _horz THEN floor(_y0)::bigint
              WHEN _y1 >= _y0 THEN floor(_yin)::bigint
              ELSE least(floor(_yin), floor(_yout))::bigint END AS _rlo,
         CASE WHEN _vert THEN floor(greatest(_y0, _y1) - {eps!r})::bigint
              WHEN _horz THEN floor(_y0)::bigint
              WHEN _y1 >= _y0
                THEN greatest(floor(_yin), ceil(_yout) - 1)::bigint
              ELSE floor(_yin)::bigint END AS _rhi
  FROM (
    SELECT *,
           _y0 + (greatest(_x0, ix::double) - _x0) * _slope AS _yin,
           _y0 + (least(_x1, (ix + 1)::double) - _x0) * _slope AS _yout
    FROM (
      SELECT *,
             unnest(generate_series(greatest(_cxlo, 0),
                                    least(_cxhi, {width - 1}))) AS ix,
             CASE WHEN _x1 = _x0 THEN 0.0
                  ELSE (_y1 - _y0) / (_x1 - _x0) END AS _slope
      FROM (
        SELECT *,
               CASE WHEN _vert THEN floor(_x1)::bigint
                    ELSE floor(_x0)::bigint END AS _cxlo,
               CASE WHEN _vert THEN floor(_x1)::bigint
                    WHEN _horz THEN floor(_x1 - {eps!r})::bigint
                    ELSE floor(_x1)::bigint
                      - CASE WHEN _x1 = floor(_x1) THEN 1 ELSE 0 END
               END AS _cxhi
        FROM (
          SELECT line_id, seq, burn,
                 least(x0, x1) AS _x0, greatest(x0, x1) AS _x1,
                 CASE WHEN x0 <= x1 THEN y0 ELSE y1 END AS _y0,
                 CASE WHEN x0 <= x1 THEN y1 ELSE y0 END AS _y1,
                 abs(x0 - x1) < 0.01 AS _vert,
                 abs(y0 - y1) < 0.01 AS _horz
          FROM {segs}
        )
      ) WHERE _cxhi >= _cxlo AND _cxhi >= 0 AND _cxlo < {width}{skip}
    )
  )
) WHERE _rhi >= _rlo AND _rhi >= 0 AND _rlo < {height}"""


# ---------------------------------------------------------------------------
# Merge (MERGE_ALG=REPLACE / ADD)
# ---------------------------------------------------------------------------

def merge_burns(
    pixels: DataFrame, merge_alg: str = "replace",
    dedup_consecutive: bool = False,
) -> DataFrame:
    """Merge per-segment pixels into the raster: one groupBy(pixel)
    shuffle with partial aggregation.

    * ``replace`` — last feature wins (gdal_rasterize default): max_by
      over the (line_id, seq) order key.
    * ``add`` — MERGE_ALG=ADD sums burns; with ``dedup_consecutive``
      (the reference's bAvoidBurningSamePoints for ALL_TOUCHED,
      llrasterize.cpp:411) pixels burnt by BOTH a segment and its
      predecessor in the same line burn once: distinct per segment,
      then an anti-join against seq-1's pixel set.
    """
    if merge_alg not in ("replace", "add"):
        raise ValueError(f"unknown merge_alg {merge_alg!r}")
    if merge_alg == "replace":
        order = F.col("line_id") * F.lit(1_000_000) + F.col("seq")
        return pixels.groupBy("ix", "iy").agg(
            F.max_by("burn", order).alias("val")
        )
    px = pixels.select("line_id", "seq", "ix", "iy", "burn").distinct()
    if dedup_consecutive:
        prev = px.select(
            "line_id", (F.col("seq") + 1).alias("seq"), "ix", "iy"
        )
        px = px.join(
            prev, ["line_id", "seq", "ix", "iy"], "left_anti"
        )
    return px.groupBy("ix", "iy").agg(F.sum("burn").alias("val"))
