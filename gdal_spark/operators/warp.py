"""True reprojection warp: geographic (EPSG:4326 pixel grid) source →
WebMercator (EPSG:3857 / XYZ tile) target.

Reference semantics: gdalwarp's core path (apps/gdalwarp_lib.cpp +
alg/gdalwarper.cpp): for every DESTINATION pixel center, inverse-transform
to source coordinates and sample (nearest kernel with the reference's
``int(x + 1e-10)`` truncation parity, as in the resampling gates).

Spark-first plan (the 100 TB shape):

1. The source raster is a DataFrame of fixed-size blocks keyed (bx, by).
2. Each target tile derives the geo-block RANGE it needs from its own
   bounds in closed form (pure JVM column math incl. the Mercator inverse
   via exp/atan), explodes to (tile, needed-block) pairs, and equi-joins
   the source on the block key — the warp's only shuffle, and it moves
   exactly the halo-free working set.
3. A per-tile ``applyInPandas`` assembles the destination pixels from the
   joined blocks with one vectorized index computation.

No driver-side gather, no broadcast of the raster, no Python loops over
pixels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_RES = 0.25          # degrees per source pixel
GEO_BLOCK = 180         # source block edge (pixels)
GEO_W = int(round(360.0 / GEO_RES))   # 1440
GEO_H = int(round(180.0 / GEO_RES))   # 720
TILE = 256


def geo_pixel_value(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Closed-form world value of geographic pixel (i, j) — shared with the
    SQL oracle."""
    return (i * 31 + j * 17 + 7) % 256


def synthetic_geo_raster(spark: SparkSession) -> DataFrame:
    """The world as GEO_BLOCK² blocks of the 0.25° grid: (bx, by, data)."""
    nbx = GEO_W // GEO_BLOCK
    nby = GEO_H // GEO_BLOCK
    base = spark.range(nbx * nby).select(
        (F.col("id") % nbx).cast("int").alias("bx"),
        F.floor(F.col("id") / nbx).cast("int").alias("by"),
    )

    def fill(batches):
        jj, ii = np.mgrid[0:GEO_BLOCK, 0:GEO_BLOCK]
        for pdf in batches:
            out = pdf.copy()
            out["data"] = [
                geo_pixel_value(
                    bx * GEO_BLOCK + ii, by * GEO_BLOCK + jj
                ).ravel().astype(np.float64)
                for bx, by in zip(pdf["bx"], pdf["by"])
            ]
            yield out[["bx", "by", "data"]]

    return base.mapInPandas(fill, "bx int, by int, data array<double>")


def _merc_lat(gy_frac_col):
    """Latitude (degrees) of a WebMercator y fraction (0..1, 0 = north) —
    sinh expanded through exp() so the SQL oracle is bit-identical."""
    t = F.lit(float(np.pi)) * (F.lit(1.0) - F.lit(2.0) * gy_frac_col)
    return F.degrees(F.atan((F.exp(t) - F.exp(-t)) / F.lit(2.0)))


def warp_reproject_nearest(
    src_blocks: DataFrame, tiles: DataFrame, zoom: int
) -> DataFrame:
    """Warp the geographic block raster onto the given WebMercator tiles
    (columns tx, ty) at ``zoom``.  Output per tile: (tx, ty, n_px,
    val_sum, digest) — digest = md5 of the comma-joined integer pixel
    values in row-major order (the gdal2tiles checksum style)."""
    n_px = (1 << zoom) * TILE

    # closed-form geo-block range per tile from its edge bounds
    gx0 = F.col("tx").cast("double") * TILE
    gx1 = (F.col("tx") + 1).cast("double") * TILE
    gy0 = F.col("ty").cast("double") * TILE
    gy1 = (F.col("ty") + 1).cast("double") * TILE
    i0 = F.floor(gx0 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    i1 = F.floor(gx1 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    j0 = F.floor(
        (F.lit(90.0) - _merc_lat(gy0 / n_px)) / GEO_RES + 1e-10
    )
    j1 = F.floor(
        (F.lit(90.0) - _merc_lat(gy1 / n_px)) / GEO_RES + 1e-10
    )
    need = (
        tiles.select(
            "tx", "ty",
            F.greatest(F.lit(0), (i0 / GEO_BLOCK).cast("long")).alias("_bx0"),
            F.least(
                F.lit(GEO_W // GEO_BLOCK - 1), (i1 / GEO_BLOCK).cast("long")
            ).alias("_bx1"),
            F.greatest(F.lit(0), (j0 / GEO_BLOCK).cast("long")).alias("_by0"),
            F.least(
                F.lit(GEO_H // GEO_BLOCK - 1), (j1 / GEO_BLOCK).cast("long")
            ).alias("_by1"),
        )
        .withColumn("_bx", F.explode(F.sequence("_bx0", "_bx1")))
        .withColumn("_by", F.explode(F.sequence("_by0", "_by1")))
        .select(
            "tx", "ty",
            F.col("_bx").cast("int").alias("bx"),
            F.col("_by").cast("int").alias("by"),
        )
    )
    joined = need.join(src_blocks, on=["bx", "by"], how="inner")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        blocks = {
            (int(r.bx), int(r.by)): np.asarray(r.data, dtype=np.float64)
            .reshape(GEO_BLOCK, GEO_BLOCK)
            for r in pdf.itertuples()
        }
        py, px = np.mgrid[0:TILE, 0:TILE]
        gx = tx * TILE + px + 0.5
        gy = ty * TILE + py + 0.5
        i = np.floor(gx * (360.0 / n_px / GEO_RES) + 1e-10).astype(np.int64)
        t = np.pi * (1.0 - 2.0 * gy / n_px)
        lat = np.degrees(np.arctan((np.exp(t) - np.exp(-t)) / 2.0))
        j = np.floor((90.0 - lat) / GEO_RES + 1e-10).astype(np.int64)
        i = np.clip(i, 0, GEO_W - 1)
        j = np.clip(j, 0, GEO_H - 1)
        vals = np.empty((TILE, TILE), dtype=np.int64)
        for (bx, by), arr in blocks.items():
            m = (i // GEO_BLOCK == bx) & (j // GEO_BLOCK == by)
            vals[m] = arr[j[m] % GEO_BLOCK, i[m] % GEO_BLOCK].astype(
                np.int64
            )
        covered = np.zeros((TILE, TILE), dtype=bool)
        for (bx, by) in blocks:
            covered |= (i // GEO_BLOCK == bx) & (j // GEO_BLOCK == by)
        if not covered.all():
            raise RuntimeError(
                f"tile ({tx},{ty}): {int((~covered).sum())} px missing "
                "source blocks"
            )
        flat = vals.ravel()
        digest = hashlib.md5(
            ",".join(str(int(v)) for v in flat).encode()
        ).hexdigest()
        return pd.DataFrame([{
            "tx": tx, "ty": ty, "n_px": int(flat.shape[0]),
            "val_sum": int(flat.sum()), "digest": digest,
        }])

    return joined.groupBy("tx", "ty").applyInPandas(
        assemble, "tx int, ty int, n_px long, val_sum long, digest string"
    )


def warp_reproject_bilinear(
    src_blocks: DataFrame, tiles: DataFrame, zoom: int
) -> DataFrame:
    """Bilinear reprojection warp (gdalwarp -r bilinear parity: taps at
    floor(src - 0.5) and +1, frac weights — the same convention as the
    in-grid resampling gates).  The needed-block range extends one block
    each side so edge taps never miss (the halo ships through the same
    block-key equi-join).  Output per tile: (tx, ty, n_px, val_micro_sum,
    digest) with values in integer micro-units."""
    n_px = (1 << zoom) * TILE

    gx0 = F.col("tx").cast("double") * TILE
    gx1 = (F.col("tx") + 1).cast("double") * TILE
    gy0 = F.col("ty").cast("double") * TILE
    gy1 = (F.col("ty") + 1).cast("double") * TILE
    i0 = F.floor(gx0 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    i1 = F.floor(gx1 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    j0 = F.floor((F.lit(90.0) - _merc_lat(gy0 / n_px)) / GEO_RES + 1e-10)
    j1 = F.floor((F.lit(90.0) - _merc_lat(gy1 / n_px)) / GEO_RES + 1e-10)
    need = (
        tiles.select(
            "tx", "ty",
            F.greatest(
                F.lit(0), (i0 / GEO_BLOCK).cast("long") - 1
            ).alias("_bx0"),
            F.least(
                F.lit(GEO_W // GEO_BLOCK - 1),
                (i1 / GEO_BLOCK).cast("long") + 1,
            ).alias("_bx1"),
            F.greatest(
                F.lit(0), (j0 / GEO_BLOCK).cast("long") - 1
            ).alias("_by0"),
            F.least(
                F.lit(GEO_H // GEO_BLOCK - 1),
                (j1 / GEO_BLOCK).cast("long") + 1,
            ).alias("_by1"),
        )
        .withColumn("_bx", F.explode(F.sequence("_bx0", "_bx1")))
        .withColumn("_by", F.explode(F.sequence("_by0", "_by1")))
        .select(
            "tx", "ty",
            F.col("_bx").cast("int").alias("bx"),
            F.col("_by").cast("int").alias("by"),
        )
    )
    joined = need.join(src_blocks, on=["bx", "by"], how="inner")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        blocks = {
            (int(r.bx), int(r.by)): np.asarray(r.data, dtype=np.float64)
            .reshape(GEO_BLOCK, GEO_BLOCK)
            for r in pdf.itertuples()
        }

        def fetch(i: np.ndarray, j: np.ndarray) -> np.ndarray:
            i = np.clip(i, 0, GEO_W - 1)
            j = np.clip(j, 0, GEO_H - 1)
            out = np.empty(i.shape, dtype=np.float64)
            seen = np.zeros(i.shape, dtype=bool)
            for (bx, by), arr in blocks.items():
                m = (i // GEO_BLOCK == bx) & (j // GEO_BLOCK == by)
                out[m] = arr[j[m] % GEO_BLOCK, i[m] % GEO_BLOCK]
                seen |= m
            if not seen.all():
                raise RuntimeError(
                    f"tile ({tx},{ty}): bilinear taps missing blocks"
                )
            return out

        py, px = np.mgrid[0:TILE, 0:TILE]
        gx = tx * TILE + px + 0.5
        gy = ty * TILE + py + 0.5
        sx = gx * (360.0 / n_px / GEO_RES)
        t = np.pi * (1.0 - 2.0 * gy / n_px)
        lat = np.degrees(np.arctan((np.exp(t) - np.exp(-t)) / 2.0))
        sy = (90.0 - lat) / GEO_RES
        x0 = np.floor(sx - 0.5).astype(np.int64)
        y0 = np.floor(sy - 0.5).astype(np.int64)
        fx = sx - 0.5 - x0
        fy = sy - 0.5 - y0
        v = (
            fetch(x0, y0) * (1.0 - fx) * (1.0 - fy)
            + fetch(x0 + 1, y0) * fx * (1.0 - fy)
            + fetch(x0, y0 + 1) * (1.0 - fx) * fy
            + fetch(x0 + 1, y0 + 1) * fx * fy
        )
        vi = np.floor(v * 1e6 + 0.5).astype(np.int64).ravel()
        digest = hashlib.md5(
            ",".join(str(int(x)) for x in vi).encode()
        ).hexdigest()
        return pd.DataFrame([{
            "tx": tx, "ty": ty, "n_px": int(vi.shape[0]),
            "val_micro_sum": int(vi.sum()), "digest": digest,
        }])

    return joined.groupBy("tx", "ty").applyInPandas(
        assemble,
        "tx int, ty int, n_px long, val_micro_sum long, digest string",
    )


def warp_reproject_average(
    src_blocks: DataFrame, tiles: DataFrame, zoom: int,
    kernel: str = "average",
) -> DataFrame:
    """Footprint-weighted reprojection warp kernels (``gdalwarp -r
    average/sum/rms/mode``, alg/gdalwarpkernel.cpp GWKAverageOrModeThread
    — the GDAL >= 3.1 weighted forms): each destination pixel's
    source-space FOOTPRINT rectangle comes from transforming its edges
    (x linear in longitude, y through the exact Mercator inverse), and
    every overlapped source pixel contributes with weight = overlap
    fraction ``max(0, min(x1, i+1) - max(x0, i))`` per axis.

    * ``average`` — weighted mean (normalized by footprint area),
    * ``sum``     — plain weighted sum (GDAL 3.1 ``sum``: total flux,
      no normalization),
    * ``rms``     — sqrt of the weighted mean of squares,
    * ``mode``    — the value with the largest total weight among the
      taps; ties break to the SMALLEST value (the reference's
      first-found scan order over an ascending histogram).

    At z2 the footprint spans <= 1.41 source pixels per axis, so a fixed
    3x3 tap stencil covers every case; all accumulations run in the SAME
    term order as the SQL oracle so the float chain is bit-identical.
    Output per tile: (tx, ty, n_px, val_micro_sum, digest) in integer
    micro-units."""
    if kernel not in ("average", "sum", "rms", "mode"):
        raise ValueError(f"unknown footprint kernel: {kernel}")
    n_px = (1 << zoom) * TILE

    gx0 = F.col("tx").cast("double") * TILE
    gx1 = (F.col("tx") + 1).cast("double") * TILE
    gy0 = F.col("ty").cast("double") * TILE
    gy1 = (F.col("ty") + 1).cast("double") * TILE
    i0 = F.floor(gx0 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    i1 = F.floor(gx1 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    j0 = F.floor((F.lit(90.0) - _merc_lat(gy0 / n_px)) / GEO_RES + 1e-10)
    j1 = F.floor((F.lit(90.0) - _merc_lat(gy1 / n_px)) / GEO_RES + 1e-10)
    need = (
        tiles.select(
            "tx", "ty",
            F.greatest(
                F.lit(0), (i0 / GEO_BLOCK).cast("long") - 1
            ).alias("_bx0"),
            F.least(
                F.lit(GEO_W // GEO_BLOCK - 1),
                (i1 / GEO_BLOCK).cast("long") + 1,
            ).alias("_bx1"),
            F.greatest(
                F.lit(0), (j0 / GEO_BLOCK).cast("long") - 1
            ).alias("_by0"),
            F.least(
                F.lit(GEO_H // GEO_BLOCK - 1),
                (j1 / GEO_BLOCK).cast("long") + 1,
            ).alias("_by1"),
        )
        .withColumn("_bx", F.explode(F.sequence("_bx0", "_bx1")))
        .withColumn("_by", F.explode(F.sequence("_by0", "_by1")))
        .select(
            "tx", "ty",
            F.col("_bx").cast("int").alias("bx"),
            F.col("_by").cast("int").alias("by"),
        )
    )
    joined = need.join(src_blocks, on=["bx", "by"], how="inner")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        blocks = {
            (int(r.bx), int(r.by)): np.asarray(r.data, dtype=np.float64)
            .reshape(GEO_BLOCK, GEO_BLOCK)
            for r in pdf.itertuples()
        }

        def fetch(i: np.ndarray, j: np.ndarray) -> np.ndarray:
            i = np.clip(i, 0, GEO_W - 1)
            j = np.clip(j, 0, GEO_H - 1)
            out = np.empty(i.shape, dtype=np.float64)
            seen = np.zeros(i.shape, dtype=bool)
            for (bx, by), arr in blocks.items():
                m = (i // GEO_BLOCK == bx) & (j // GEO_BLOCK == by)
                out[m] = arr[j[m] % GEO_BLOCK, i[m] % GEO_BLOCK]
                seen |= m
            if not seen.all():
                raise RuntimeError(
                    f"tile ({tx},{ty}): average taps missing blocks"
                )
            return out

        py, px = np.mgrid[0:TILE, 0:TILE]
        kx = 360.0 / n_px / GEO_RES
        sx0 = (tx * TILE + px).astype(np.float64) * kx
        sx1 = (tx * TILE + px + 1).astype(np.float64) * kx

        def jspace(gy):
            t = np.pi * (1.0 - 2.0 * gy / n_px)
            lat = np.degrees(np.arctan((np.exp(t) - np.exp(-t)) / 2.0))
            return (90.0 - lat) / GEO_RES

        sy0 = jspace((ty * TILE + py).astype(np.float64))
        sy1 = jspace((ty * TILE + py + 1).astype(np.float64))
        xb = np.floor(sx0 + 1e-10).astype(np.int64)
        yb = np.floor(sy0 + 1e-10).astype(np.int64)
        wx = [
            np.maximum(
                0.0, np.minimum(sx1, xb + k + 1) - np.maximum(sx0, xb + k)
            )
            for k in range(3)
        ]
        wy = [
            np.maximum(
                0.0, np.minimum(sy1, yb + li + 1) - np.maximum(sy0, yb + li)
            )
            for li in range(3)
        ]
        if kernel == "mode":
            vals, ws = [], []
            for li in range(3):
                for k in range(3):
                    vals.append(fetch(xb + k, yb + li))
                    ws.append(wx[k] * wy[li])
            # total weight per tap value (ties: smallest value wins)
            best_v = None
            best_w = None
            for i in range(9):
                wsum = np.zeros((TILE, TILE), dtype=np.float64)
                for j in range(9):
                    wsum = wsum + np.where(vals[j] == vals[i], ws[j], 0.0)
                if best_v is None:
                    best_v, best_w = vals[i].copy(), wsum
                else:
                    take = (wsum > best_w) | (
                        (wsum == best_w) & (vals[i] < best_v))
                    best_v = np.where(take, vals[i], best_v)
                    best_w = np.where(take, wsum, best_w)
            v = best_v
        else:
            num = np.zeros((TILE, TILE), dtype=np.float64)
            for li in range(3):
                for k in range(3):
                    tap = fetch(xb + k, yb + li)
                    if kernel == "rms":
                        tap = tap * tap
                    num = num + wx[k] * wy[li] * tap
            if kernel == "sum":
                v = num
            else:
                den = (wx[0] + wx[1] + wx[2]) * (wy[0] + wy[1] + wy[2])
                v = num / den
                if kernel == "rms":
                    v = np.sqrt(v)
        vi = np.floor(v * 1e6 + 0.5).astype(np.int64).ravel()
        digest = hashlib.md5(
            ",".join(str(int(x)) for x in vi).encode()
        ).hexdigest()
        return pd.DataFrame([{
            "tx": tx, "ty": ty, "n_px": int(vi.shape[0]),
            "val_micro_sum": int(vi.sum()), "digest": digest,
        }])

    return joined.groupBy("tx", "ty").applyInPandas(
        assemble,
        "tx int, ty int, n_px long, val_micro_sum long, digest string",
    )


def _merc_yfrac_col(lat_deg_col):
    """Forward WebMercator y fraction (0..1, 0 = north) of latitude in
    degrees — tan/ln written identically in the numpy kernel and the SQL
    oracle."""
    t = F.tan(
        F.lit(float(np.pi) / 4.0)
        + lat_deg_col * F.lit(float(np.pi) / 360.0)
    )
    return (F.lit(1.0) - F.log(t) / F.lit(float(np.pi))) / F.lit(2.0)


def warp_reproject_to_geographic(
    src_tiles: DataFrame, blocks: DataFrame, zoom: int
) -> DataFrame:
    """The REVERSE warp: WebMercator tile raster → geographic 0.25° blocks
    (gdalwarp 3857→4326).  Same plan as the forward direction: each target
    block derives its mercator tile range in closed form (forward Mercator
    via tan/ln column math), explodes to (block, tile) pairs, equi-joins
    the source tiles, assembles per block.  Nearest kernel, int(x+1e-10)
    parity.  Output per block: (bx, by, n_px, val_sum, digest)."""
    n_px = (1 << zoom) * TILE

    lon0 = F.col("bx").cast("double") * GEO_BLOCK * GEO_RES - 180.0
    lon1 = (F.col("bx") + 1).cast("double") * GEO_BLOCK * GEO_RES - 180.0
    lat_top = 90.0 - F.col("by").cast("double") * GEO_BLOCK * GEO_RES
    lat_bot = 90.0 - (F.col("by") + 1).cast("double") * GEO_BLOCK * GEO_RES
    gx0 = F.floor((lon0 + 180.0) / 360.0 * n_px + 1e-10)
    gx1 = F.floor((lon1 + 180.0) / 360.0 * n_px + 1e-10)
    gy0 = F.floor(_merc_yfrac_col(lat_top) * n_px + 1e-10)
    gy1 = F.floor(_merc_yfrac_col(lat_bot) * n_px + 1e-10)
    nt = 1 << zoom
    need = (
        blocks.select(
            "bx", "by",
            F.greatest(F.lit(0), (gx0 / TILE).cast("long")).alias("_tx0"),
            F.least(F.lit(nt - 1), (gx1 / TILE).cast("long")).alias("_tx1"),
            F.greatest(F.lit(0), (gy0 / TILE).cast("long")).alias("_ty0"),
            F.least(F.lit(nt - 1), (gy1 / TILE).cast("long")).alias("_ty1"),
        )
        .withColumn("_tx", F.explode(F.sequence("_tx0", "_tx1")))
        .withColumn("_ty", F.explode(F.sequence("_ty0", "_ty1")))
        .select(
            "bx", "by",
            F.col("_tx").cast("int").alias("tx"),
            F.col("_ty").cast("int").alias("ty"),
        )
    )
    joined = need.join(
        src_tiles.select("tx", "ty", "data"), on=["tx", "ty"], how="inner"
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        bx = int(pdf["bx"].iloc[0])
        by = int(pdf["by"].iloc[0])
        tiles = {
            (int(r.tx), int(r.ty)): np.asarray(r.data, dtype=np.float64)
            .reshape(TILE, TILE)
            for r in pdf.itertuples()
        }
        jj, ii = np.mgrid[0:GEO_BLOCK, 0:GEO_BLOCK]
        lon = (bx * GEO_BLOCK + ii + 0.5) * GEO_RES - 180.0
        lat = 90.0 - (by * GEO_BLOCK + jj + 0.5) * GEO_RES
        gx = np.floor((lon + 180.0) / 360.0 * n_px + 1e-10).astype(np.int64)
        t = np.tan(np.pi / 4.0 + lat * (np.pi / 360.0))
        yf = (1.0 - np.log(t) / np.pi) / 2.0
        gy = np.floor(yf * n_px + 1e-10).astype(np.int64)
        gx = np.clip(gx, 0, n_px - 1)
        gy = np.clip(gy, 0, n_px - 1)
        vals = np.empty((GEO_BLOCK, GEO_BLOCK), dtype=np.int64)
        covered = np.zeros((GEO_BLOCK, GEO_BLOCK), dtype=bool)
        for (tx, ty), arr in tiles.items():
            m = (gx // TILE == tx) & (gy // TILE == ty)
            vals[m] = arr[gy[m] % TILE, gx[m] % TILE].astype(np.int64)
            covered |= m
        if not covered.all():
            raise RuntimeError(
                f"block ({bx},{by}): {int((~covered).sum())} px missing"
            )
        flat = vals.ravel()
        digest = hashlib.md5(
            ",".join(str(int(v)) for v in flat).encode()
        ).hexdigest()
        return pd.DataFrame([{
            "bx": bx, "by": by, "n_px": int(flat.shape[0]),
            "val_sum": int(flat.sum()), "digest": digest,
        }])

    return joined.groupBy("bx", "by").applyInPandas(
        assemble, "bx int, by int, n_px long, val_sum long, digest string"
    )


def warp_reproject_to_utm(
    src_blocks: DataFrame,
    tiles: DataFrame,
    zone: int,
    e_origin: float,
    n_top: float,
    res_m: float,
    tile_px: int = 128,
) -> DataFrame:
    """Warp the geographic block raster onto a UTM target grid
    (``gdalwarp -t_srs EPSG:326{zone}``): same dst-pixel inverse-transform
    architecture as the Mercator warps, but the inverse is the Krüger
    BETA-series transverse-Mercator inverse (spatial/crs.py — ref PROJ
    tmerc via ogr/ogrct.cpp:1002; alg/gdalwarper.cpp dst-scanline loop).

    ``tiles`` has (ux, uy); tile (ux, uy) covers easting
    [e_origin + ux·tile_px·res_m, +tile_px·res_m) and northing
    (n_top − uy·tile_px·res_m, −tile_px·res_m] (row-major, north-up).

    Plan (the 100 TB shape, like warp_reproject_nearest): each tile
    derives its needed geo-block RANGE from the EXACT Column-math UTM
    inverse at its 4 corners plus a fixed pad (the same role as
    GDALSuggestedWarpOutput's edge sampling), explodes to (tile, block)
    pairs, equi-joins the source on the block key — the only shuffle —
    and a per-tile kernel assembles dst pixels with the vectorized
    numpy mirror of the identical inverse expression tree."""
    from gdal_spark.spatial import crs as CRS

    span = float(tile_px) * float(res_m)
    e_min = F.lit(e_origin) + F.col("ux").cast("double") * span
    n_max = F.lit(n_top) - F.col("uy").cast("double") * span
    corners = []
    for de, dn in ((0.0, 0.0), (span, 0.0), (0.0, span), (span, span)):
        lon_c, lat_c = CRS.utm_inverse(
            e_min + F.lit(de), n_max - F.lit(dn), zone)
        corners.append((lon_c, lat_c))
    pad = 0.35  # > max interior-vs-corner deflection at tile scale
    lon_lo = F.least(*[c[0] for c in corners]) - pad
    lon_hi = F.greatest(*[c[0] for c in corners]) + pad
    lat_lo = F.least(*[c[1] for c in corners]) - pad
    lat_hi = F.greatest(*[c[1] for c in corners]) + pad
    nbx = GEO_W // GEO_BLOCK
    nby = GEO_H // GEO_BLOCK
    need = (
        tiles.select(
            "ux", "uy",
            F.greatest(
                F.lit(0),
                F.floor((lon_lo + 180.0) / (GEO_RES * GEO_BLOCK))
                .cast("long"),
            ).alias("_bx0"),
            F.least(
                F.lit(nbx - 1),
                F.floor((lon_hi + 180.0) / (GEO_RES * GEO_BLOCK))
                .cast("long"),
            ).alias("_bx1"),
            F.greatest(
                F.lit(0),
                F.floor((90.0 - lat_hi) / (GEO_RES * GEO_BLOCK))
                .cast("long"),
            ).alias("_by0"),
            F.least(
                F.lit(nby - 1),
                F.floor((90.0 - lat_lo) / (GEO_RES * GEO_BLOCK))
                .cast("long"),
            ).alias("_by1"),
        )
        .withColumn("_bx", F.explode(F.sequence("_bx0", "_bx1")))
        .withColumn("_by", F.explode(F.sequence("_by0", "_by1")))
        .select(
            "ux", "uy",
            F.col("_bx").cast("int").alias("bx"),
            F.col("_by").cast("int").alias("by"),
        )
    )
    joined = need.join(src_blocks, on=["bx", "by"], how="inner")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.spatial.crs import np_utm_inverse_mirror

        ux = int(pdf["ux"].iloc[0])
        uy = int(pdf["uy"].iloc[0])
        blocks = {
            (int(r.bx), int(r.by)): np.asarray(r.data, dtype=np.float64)
            .reshape(GEO_BLOCK, GEO_BLOCK)
            for r in pdf.itertuples()
        }
        py, px = np.mgrid[0:tile_px, 0:tile_px]
        e = e_origin + (ux * tile_px + px + 0.5) * res_m
        n = n_top - (uy * tile_px + py + 0.5) * res_m
        lon, lat = np_utm_inverse_mirror(e, n, zone)
        i = np.floor((lon + 180.0) / GEO_RES + 1e-10).astype(np.int64)
        j = np.floor((90.0 - lat) / GEO_RES + 1e-10).astype(np.int64)
        i = np.clip(i, 0, GEO_W - 1)
        j = np.clip(j, 0, GEO_H - 1)
        vals = np.empty((tile_px, tile_px), dtype=np.int64)
        covered = np.zeros((tile_px, tile_px), dtype=bool)
        for (bx, by), arr in blocks.items():
            m = (i // GEO_BLOCK == bx) & (j // GEO_BLOCK == by)
            vals[m] = arr[j[m] % GEO_BLOCK, i[m] % GEO_BLOCK].astype(
                np.int64)
            covered |= m
        if not covered.all():
            raise RuntimeError(
                f"utm tile ({ux},{uy}): {int((~covered).sum())} px missing "
                "source blocks")
        flat = vals.ravel()
        digest = hashlib.md5(
            ",".join(str(int(v)) for v in flat).encode()).hexdigest()
        return pd.DataFrame([{
            "ux": ux, "uy": uy, "n_px": int(flat.shape[0]),
            "val_sum": int(flat.sum()), "digest": digest,
        }])

    return joined.groupBy("ux", "uy").applyInPandas(
        assemble, "ux int, uy int, n_px long, val_sum long, digest string"
    )


def _np_cubic_w(t: np.ndarray, tap: int) -> np.ndarray:
    """Catmull-Rom A=-0.5 weight for the tap at integer offset ``tap``
    given fractional position t ∈ [0,1) — the gdalwarp cubic
    (alg/gdalwarpkernel.cpp GWKCubic); expression order mirrors the SQL
    oracle and the Column kernel in operators/tiles.py exactly."""
    A = -0.5
    x = t - float(tap)
    ax = np.abs(x)
    w_inner = ((A + 2.0) * ax - (A + 3.0)) * ax * ax + 1.0
    w_outer = A * (((ax - 5.0) * ax + 8.0) * ax - 4.0)
    return np.where(ax < 1.0, w_inner, np.where(ax < 2.0, w_outer, 0.0))


def warp_reproject_cubic(
    src_blocks: DataFrame, tiles: DataFrame, zoom: int
) -> DataFrame:
    """Cubic reprojection warp (gdalwarp -r cubic — completes the warp
    kernel menu next to nearest/bilinear/average/mode/rms/sum): same
    dst-pixel inverse transform and block equi-join as the bilinear warp,
    4×4 Catmull-Rom taps at floor(src − 0.5) − 1 … + 2 with separable
    weights, edge-clamped; values micro-quantized for the digest."""
    n_px = (1 << zoom) * TILE

    gx0 = F.col("tx").cast("double") * TILE
    gx1 = (F.col("tx") + 1).cast("double") * TILE
    gy0 = F.col("ty").cast("double") * TILE
    gy1 = (F.col("ty") + 1).cast("double") * TILE
    i0 = F.floor(gx0 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    i1 = F.floor(gx1 * F.lit(360.0 / n_px / GEO_RES) + 1e-10)
    j0 = F.floor((F.lit(90.0) - _merc_lat(gy0 / n_px)) / GEO_RES + 1e-10)
    j1 = F.floor((F.lit(90.0) - _merc_lat(gy1 / n_px)) / GEO_RES + 1e-10)
    need = (
        tiles.select(
            "tx", "ty",
            F.greatest(
                F.lit(0), (i0 / GEO_BLOCK).cast("long") - 1
            ).alias("_bx0"),
            F.least(
                F.lit(GEO_W // GEO_BLOCK - 1),
                (i1 / GEO_BLOCK).cast("long") + 1,
            ).alias("_bx1"),
            F.greatest(
                F.lit(0), (j0 / GEO_BLOCK).cast("long") - 1
            ).alias("_by0"),
            F.least(
                F.lit(GEO_H // GEO_BLOCK - 1),
                (j1 / GEO_BLOCK).cast("long") + 1,
            ).alias("_by1"),
        )
        .withColumn("_bx", F.explode(F.sequence("_bx0", "_bx1")))
        .withColumn("_by", F.explode(F.sequence("_by0", "_by1")))
        .select(
            "tx", "ty",
            F.col("_bx").cast("int").alias("bx"),
            F.col("_by").cast("int").alias("by"),
        )
    )
    joined = need.join(src_blocks, on=["bx", "by"], how="inner")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        blocks = {
            (int(r.bx), int(r.by)): np.asarray(r.data, dtype=np.float64)
            .reshape(GEO_BLOCK, GEO_BLOCK)
            for r in pdf.itertuples()
        }

        def fetch(i: np.ndarray, j: np.ndarray) -> np.ndarray:
            i = np.clip(i, 0, GEO_W - 1)
            j = np.clip(j, 0, GEO_H - 1)
            out = np.empty(i.shape, dtype=np.float64)
            seen = np.zeros(i.shape, dtype=bool)
            for (bx, by), arr in blocks.items():
                m = (i // GEO_BLOCK == bx) & (j // GEO_BLOCK == by)
                out[m] = arr[j[m] % GEO_BLOCK, i[m] % GEO_BLOCK]
                seen |= m
            if not seen.all():
                raise RuntimeError(
                    f"tile ({tx},{ty}): cubic taps missing blocks")
            return out

        py, px = np.mgrid[0:TILE, 0:TILE]
        gx = tx * TILE + px + 0.5
        gy = ty * TILE + py + 0.5
        sx = gx * (360.0 / n_px / GEO_RES)
        t = np.pi * (1.0 - 2.0 * gy / n_px)
        lat = np.degrees(np.arctan((np.exp(t) - np.exp(-t)) / 2.0))
        sy = (90.0 - lat) / GEO_RES
        x0 = np.floor(sx - 0.5).astype(np.int64)
        y0 = np.floor(sy - 0.5).astype(np.int64)
        fx = sx - 0.5 - x0
        fy = sy - 0.5 - y0
        v = None
        for dy in (-1, 0, 1, 2):
            wy = _np_cubic_w(fy, dy)
            for dx in (-1, 0, 1, 2):
                term = fetch(x0 + dx, y0 + dy) * _np_cubic_w(fx, dx) * wy
                v = term if v is None else v + term
        vi = np.floor(v * 1e6 + 0.5).astype(np.int64).ravel()
        digest = hashlib.md5(
            ",".join(str(int(x)) for x in vi).encode()).hexdigest()
        return pd.DataFrame([{
            "tx": tx, "ty": ty, "n_px": int(vi.shape[0]),
            "val_micro_sum": int(vi.sum()), "digest": digest,
        }])

    return joined.groupBy("tx", "ty").applyInPandas(
        assemble,
        "tx int, ty int, n_px long, val_micro_sum long, digest string",
    )
