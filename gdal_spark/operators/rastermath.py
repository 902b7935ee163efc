"""Band-level raster math: checksum, statistics, histogram, reclassify,
band algebra (gdal raster calc), mosaicking (gdal_merge) and point query
(gdallocationinfo).

Reference semantics:

* ``GDALChecksumImage`` (alg/gdalchecksum.cpp:48) — THE oracle of the
  reference's autotest suite: for pixel linear index i = y*xsize + x,
  checksum += int(value) % primes[i % 11] with primes
  [7,11,13,17,19,23,29,31,37,41,43], masked to 16 bits.  Floating data is
  first converted with the GDALCopyWords float->Int32 rule
  (floor(v + 0.5), clamped to ±2147483647, non-finite -> INT_MIN).
  The mask commutes with addition for non-negative terms, so the
  distributed form is one map-side expression + a global SUM % 65536.
* ``GDALRasterBand::ComputeStatistics`` (gcore/gdalrasterband.cpp) —
  min / max / mean / POPULATION stddev.
* ``GDALRasterBand::GetHistogram`` (gcore/gdalrasterband.cpp, bucket rule
  at the `dfIndex = floor((dfValue - dfMin) * dfScale)` site with
  dfScale = nBuckets / (dfMax - dfMin)): out-of-range pixels are dropped,
  or clamped into the first/last bucket when bIncludeOutOfRange.
* Reclassify (frmts/vrt/vrtreclassifier.{h,cpp}, apps/
  gdalalg_raster_reclassify.cpp): "SRC=DST;..." mappings where SRC is a
  constant, an open/closed/±inf interval, NO_DATA or DEFAULT, and DST is
  a constant, NO_DATA or PASS_THROUGH.
* gdal raster calc (apps/gdalalg_raster_calc.cpp): named-band expression
  evaluated per pixel.
* gdal_merge / gdal raster mosaic: later inputs overwrite earlier ones
  except where they are nodata.
* gdallocationinfo: inverse geotransform (pixel = floor((X - originX) /
  pixel_size), line = floor((originY - Y) / pixel_size)) then report the
  band value under the point.

Spark-first plans: checksum/stats/histogram are map-side expressions with
single partial-aggregated reductions (histogram shuffles on at most
``n_buckets`` keys); reclassify/calc are pure column CASE/expr math
(map-only); mosaic is one shuffle on the pixel key with max_by partial
aggregation; locationinfo is an equi-join on the pixel key (broadcast
when the raster side is small, shuffle-hash co-partitioned otherwise).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHECKSUM_PRIMES = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]


def checksum_int_col(value: Column, floating: bool = True) -> Column:
    """GDALCopyWords double->Int32 conversion used by the checksum
    (alg/gdalchecksum.cpp IntFromDouble)."""
    if not floating:
        return value.cast("long")
    v = value.cast("double") + F.lit(0.5)
    return (
        F.when(F.isnan(v), F.lit(-2147483648))
        .when(v < F.lit(-2147483647.0), F.lit(-2147483647))
        .when(v > F.lit(2147483647.0), F.lit(2147483647))
        .otherwise(F.floor(v))
        .cast("long")
    )


def checksum_image(
    cells: DataFrame, width: int,
    x: str = "gx", y: str = "gy", value: str = "val",
    floating: bool = True,
) -> DataFrame:
    """Distributed GDALChecksumImage over a (x, y, val) raster of row
    width ``width``: one map-side expression, one global sum — the 16-bit
    mask is applied once at the end (valid because every term is in
    [0, 42] after the positive-modulo of non-negative int values; for
    possibly-negative data the per-term sign matches C's truncating %)."""
    idx = (F.col(y) * F.lit(width) + F.col(x)) % 11
    prime = F.element_at(
        F.array(*[F.lit(p) for p in CHECKSUM_PRIMES]), (idx + 1).cast("int")
    )
    term = checksum_int_col(F.col(value), floating) % prime
    return cells.agg(
        F.pmod(F.sum(term), F.lit(65536)).cast("int").alias("checksum")
    )


def sql_checksum_term(x: str, y: str, val: str, width: int,
                      floating: bool = True) -> str:
    """DuckDB twin of the per-pixel checksum term."""
    primes = "[" + ",".join(str(p) for p in CHECKSUM_PRIMES) + "]"
    if floating:
        iv = (
            f"(CASE WHEN ({val})::double + 0.5 < -2147483647.0 THEN -2147483647 "
            f"WHEN ({val})::double + 0.5 > 2147483647.0 THEN 2147483647 "
            f"ELSE floor(({val})::double + 0.5)::bigint END)"
        )
    else:
        iv = f"({val})::bigint"
    return f"({iv} % ({primes})[((({y}) * {width} + ({x})) % 11) + 1])"


def compute_statistics(
    cells: DataFrame, value: str = "val",
) -> DataFrame:
    """gdalinfo -stats: min / max / mean / population stddev (GDAL's
    ComputeStatistics uses sqrt(M2/n), not the sample estimator)."""
    v = F.col(value).cast("double")
    return cells.agg(
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.avg(v).alias("vmean"),
        # population stddev = sqrt(E[x^2] - mean^2), the GDAL formulation
        F.sqrt(F.avg(v * v) - F.avg(v) * F.avg(v)).alias("vstddev"),
        F.count(F.lit(1)).alias("n"),
    )


def histogram(
    cells: DataFrame, vmin: float, vmax: float, n_buckets: int,
    value: str = "val", include_out_of_range: bool = False,
) -> DataFrame:
    """GDALRasterBand::GetHistogram bucket rule, zero-filled buckets.

    One groupBy shuffle on <= n_buckets keys (map-side combine), then a
    broadcast join against the bucket frame for the zero fill."""
    scale = float(n_buckets) / (float(vmax) - float(vmin))
    raw = F.floor((F.col(value).cast("double") - F.lit(float(vmin)))
                  * F.lit(scale))
    if include_out_of_range:
        bucket = F.greatest(
            F.lit(0), F.least(F.lit(n_buckets - 1), raw.cast("long"))
        )
        sel = cells
    else:
        bucket = raw.cast("long")
        sel = cells.filter((raw >= 0) & (raw < n_buckets))
    counts = sel.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spark = cells.sparkSession
    frame = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        frame.join(F.broadcast(counts), "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Reclassify
# ---------------------------------------------------------------------------

_INTERVAL_RE = re.compile(
    r"^\s*([\[(])\s*([^,\s]+)\s*,\s*([^,\s\])]+)\s*([\])])\s*$"
)


def _parse_bound(tok: str) -> float:
    t = tok.strip().lower()
    if t in ("inf", "+inf", "infinity"):
        return float("inf")
    if t == "-inf":
        return float("-inf")
    return float(tok)


def reclassify_col(
    value: Column, mapping: str,
    nodata: float | None = None,
) -> Column:
    """Build the reclassification CASE column from a GDAL mapping string,
    e.g. ``"[0,40)=1;[40,90)=2;(90,inf]=3;NO_DATA=0;DEFAULT=9"``.

    Intervals follow vrtreclassifier.cpp: '[' / ']' closed, '(' / ')'
    open, ``inf`` bounds allowed; SRC ``NO_DATA`` matches the nodata
    value; ``DEFAULT`` catches everything unmatched; DST may be a
    constant, ``NO_DATA`` or ``PASS_THROUGH``.  Without a DEFAULT,
    unmatched pixels become NULL (the reference raises a runtime error
    per pixel — NULL is the relational rendering of that)."""
    v = value.cast("double")
    conds: list[tuple[Column, Column]] = []
    default: Column | None = None

    def dst_col(tok: str) -> Column:
        t = tok.strip()
        if t.upper() == "NO_DATA":
            if nodata is None:
                raise ValueError("DST NO_DATA requires a nodata value")
            return F.lit(float(nodata))
        if t.upper() == "PASS_THROUGH":
            return v
        return F.lit(float(t))

    for part in mapping.split(";"):
        part = part.strip()
        if not part:
            continue
        src, _, dst = part.partition("=")
        if not _:
            raise ValueError(f"mapping entry without '=': {part!r}")
        s = src.strip()
        d = dst_col(dst)
        if s.upper() == "DEFAULT":
            default = d
            continue
        if s.upper() == "NO_DATA":
            if nodata is None:
                raise ValueError("SRC NO_DATA requires a nodata value")
            conds.append((v == F.lit(float(nodata)), d))
            continue
        m = _INTERVAL_RE.match(s)
        if m:
            lo_b, lo, hi, hi_b = m.groups()
            lo_v, hi_v = _parse_bound(lo), _parse_bound(hi)
            cond = F.lit(True)
            if lo_v != float("-inf"):
                cond = cond & (
                    v >= F.lit(lo_v) if lo_b == "[" else v > F.lit(lo_v)
                )
            if hi_v != float("inf"):
                cond = cond & (
                    v <= F.lit(hi_v) if hi_b == "]" else v < F.lit(hi_v)
                )
            conds.append((cond, d))
        else:
            conds.append((v == F.lit(float(s)), d))

    expr: Column | None = None
    for cond, d in conds:
        expr = F.when(cond, d) if expr is None else expr.when(cond, d)
    if expr is None:
        return default if default is not None else F.lit(None).cast("double")
    return expr.otherwise(default) if default is not None else expr


def raster_calc(
    bands: dict[str, DataFrame], expr: str,
    x: str = "gx", y: str = "gy", value: str = "val",
) -> DataFrame:
    """gdal raster calc: named-band pixel algebra.  Each input raster is
    (x, y, val); the expression references bands by their dict name.
    Bands are equi-joined on the pixel key (inner — gdal raster calc
    requires matching extents), then the expression runs as one JVM
    column expression.  At scale: co-partitioned joins on the compact
    (long, long) key, map-only afterwards."""
    out: DataFrame | None = None
    for name, df in bands.items():
        side = df.select(x, y, F.col(value).alias(name))
        out = side if out is None else out.join(side, [x, y])
    assert out is not None, "at least one band required"
    return out.select(x, y, F.expr(expr).alias("val"))


def mosaic(
    rasters: Sequence[DataFrame], nodata: float | None = None,
    x: str = "gx", y: str = "gy", value: str = "val",
) -> DataFrame:
    """gdal_merge semantics: inputs are stacked in argument order and the
    LAST non-nodata value wins per pixel.  Union + one groupBy(pixel)
    with max_by partial aggregation — never a join, never a window."""
    tagged = None
    for i, df in enumerate(rasters):
        t = df.select(x, y, F.col(value).alias("_v"),
                      F.lit(i).alias("_src"))
        tagged = t if tagged is None else tagged.unionAll(t)
    assert tagged is not None, "at least one raster required"
    if nodata is not None:
        tagged = tagged.filter(F.col("_v") != F.lit(float(nodata)))
    return tagged.groupBy(x, y).agg(
        F.max_by("_v", "_src").alias(value)
    )


def locationinfo(
    points: DataFrame, cells: DataFrame,
    origin_x: float, origin_y: float, pixel_size: float,
    mx: str = "mx", my: str = "my",
    x: str = "gx", y: str = "gy", value: str = "val",
    broadcast_raster: bool = True,
) -> DataFrame:
    """gdallocationinfo: points (with projected coords mx, my) ->
    (pixel, line, value) under the inverse geotransform.  The raster join
    is broadcast for window-sized rasters, shuffle-hash otherwise."""
    pix = F.floor((F.col(mx) - F.lit(float(origin_x)))
                  / F.lit(float(pixel_size))).cast("long")
    lin = F.floor((F.lit(float(origin_y)) - F.col(my))
                  / F.lit(float(pixel_size))).cast("long")
    pts = points.withColumn("pixel", pix).withColumn("line", lin)
    r = cells.select(
        F.col(x).alias("pixel"), F.col(y).alias("line"),
        F.col(value).alias("value"),
    )
    if broadcast_raster:
        r = F.broadcast(r)
    return pts.join(r, ["pixel", "line"], "left")


# ---------------------------------------------------------------------------
# Histogram equalization (gdalenhance -equalize, apps/gdalenhance_bin.cpp):
# v → floor((cdf(v) − cdf_min) / (N − cdf_min) · 255 + 0.5) over the global
# histogram.
#
# Scale shape (the rgb2pct pattern): the histogram is a bounded groupBy
# (≤256 groups at any data volume) collected to the driver, the remap
# table broadcasts, and the application is a map-only HOF transform — no
# per-pixel shuffle anywhere.
# ---------------------------------------------------------------------------

def equalize_mapping(raster: DataFrame, value_col: str = "data",
                     levels: int = 256) -> list[int]:
    """Global equalization lookup table (length ``levels``) from the tile
    DataFrame's exploded pixel histogram."""
    import numpy as np

    hist_rows = (
        raster.select(F.explode(value_col).alias("v"))
        .groupBy(F.col("v").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = np.zeros(levels, dtype=np.int64)
    for r in hist_rows:
        counts[int(r.v)] = int(r.n)
    cdf = np.cumsum(counts)
    n_total = int(cdf[-1])
    cdf_min = int(counts[counts > 0][0]) if (counts > 0).any() else 0
    denom = max(n_total - cdf_min, 1)
    lut = np.floor(
        (cdf - cdf_min).clip(min=0) / denom * (levels - 1) + 0.5
    ).astype(np.int64)
    return [int(x) for x in lut]


def apply_equalize(raster: DataFrame, lut: list[int],
                   value_col: str = "data") -> DataFrame:
    """Map every pixel through the broadcast LUT (JVM element_at — no
    Python)."""
    lut_col = F.array(*[F.lit(int(v)) for v in lut])
    return raster.withColumn(
        value_col,
        F.transform(
            value_col,
            lambda v: F.element_at(lut_col, v.cast("int") + 1)
            .cast("double"),
        ),
    )


# ---------------------------------------------------------------------------
# nearblack (apps/nearblack_lib.cpp): mask the near-black collar that scan
# digitization / reprojection leaves around imagery.  The reference scans
# every row from BOTH ends, masking the contiguous run of pixels within
# near_dist of black until the first bright pixel, then repeats vertically.
# Distributed form: per-row [lo, hi] bright extents (one bounded aggregate
# on the row key), per-column likewise, broadcast back — a pixel is collar
# iff it lies outside its row extent OR its column extent.  Interior dark
# pixels (not edge-connected) are untouched, exactly like the reference.
# ---------------------------------------------------------------------------


def nearblack_mask(
    cells: DataFrame, near_dist: float,
    x: str = "gx", y: str = "gy", val: str = "val",
) -> DataFrame:
    """→ cells + boolean ``collar``.  Two bounded aggregates (one row per
    raster row / column — metadata-scale relative to pixels) broadcast
    back onto the pixel table; everything else is map-only."""
    bright = cells.filter(F.col(val) > near_dist)
    rows = bright.groupBy(y).agg(
        F.min(x).alias("_rlo"), F.max(x).alias("_rhi"))
    cols = bright.groupBy(x).agg(
        F.min(y).alias("_clo"), F.max(y).alias("_chi"))
    out = (
        cells.join(F.broadcast(rows), y, "left")
        .join(F.broadcast(cols), x, "left")
    )
    collar = (
        F.col("_rlo").isNull()
        | (F.col(x) < F.col("_rlo")) | (F.col(x) > F.col("_rhi"))
        | F.col("_clo").isNull()
        | (F.col(y) < F.col("_clo")) | (F.col(y) > F.col("_chi"))
    )
    return out.withColumn("collar", collar).drop(
        "_rlo", "_rhi", "_clo", "_chi")


def sql_nearblack_collar(near_dist: float,
                         x: str = "x", y: str = "y", val: str = "val") -> str:
    """DuckDB window-function twin of the collar predicate (over a CTE
    named ``v`` with columns x, y, val)."""
    b = f"CASE WHEN val > {near_dist!r} THEN {x} END"
    by = f"CASE WHEN val > {near_dist!r} THEN {y} END"
    return (
        f"(min({b}) OVER (PARTITION BY {y}) IS NULL"
        f" OR {x} < min({b}) OVER (PARTITION BY {y})"
        f" OR {x} > max({b}) OVER (PARTITION BY {y})"
        f" OR min({by}) OVER (PARTITION BY {x}) IS NULL"
        f" OR {y} < min({by}) OVER (PARTITION BY {x})"
        f" OR {y} > max({by}) OVER (PARTITION BY {x}))"
    )


# ---------------------------------------------------------------------------
# Histogram MATCHING (the companion to equalization: remap a source
# raster so its value distribution follows a reference raster's — the
# standard radiometric-normalization step before mosaicking scenes).
# LUT rule: lut[v] = smallest reference value g whose reference CDF is
# >= the source CDF at v, compared by INTEGER cross-multiplication
# (cdf_src(v) * n_ref <= cdf_ref(g) * n_src) so both engines agree
# exactly with no float quantiles.
#
# Scale: two bounded histograms (<=levels groups each, partial-agg
# shuffles), a <=levels LUT broadcast, then a map-only remap.
# ---------------------------------------------------------------------------

def match_histogram_mapping(src: DataFrame, ref: DataFrame,
                            value_col: str = "data",
                            levels: int = 256) -> list[int]:
    """Length-``levels`` LUT mapping source values onto the reference
    distribution (identity for values absent from the source)."""
    import numpy as np

    def hist(raster: DataFrame) -> np.ndarray:
        counts = np.zeros(levels, dtype=np.int64)
        for r in (
            raster.select(F.explode(value_col).alias("v"))
            .groupBy(F.col("v").cast("long").alias("v"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ):
            counts[int(r.v)] = int(r.n)
        return counts

    cs = np.cumsum(hist(src))
    hr = hist(ref)
    cr = np.cumsum(hr)
    ns, nr = int(cs[-1]), int(cr[-1])
    ref_vals = np.nonzero(hr)[0]
    if ref_vals.size == 0 or ns == 0:
        return list(range(levels))
    # first present reference value whose scaled CDF reaches the source's
    cr_present = cr[ref_vals] * ns
    idx = np.searchsorted(cr_present, cs * nr, side="left")
    idx = np.clip(idx, 0, ref_vals.size - 1)
    return [int(ref_vals[i]) for i in idx]
