"""Raster neighborhood/stencil operators: sieve, fill-nodata, pansharpen.

Reference semantics:
* Sieve — ``GDALSieveFilter`` (alg/gdalsievefilter.cpp): raster polygons
  (4-connected same-value regions) smaller than a threshold are merged into
  their LARGEST neighbouring polygon (its pixel value replaces theirs).
* FillNodata — ``GDALFillNodata`` (alg/gdalfillnodata.cpp): nodata pixels
  are interpolated by inverse-distance weighting of the nearest valid pixel
  found in each search direction within ``max_distance``.
* Pansharpen — ``GDALPansharpenOperation`` (alg/gdalpansharpen.cpp):
  weighted-Brovey — out_i = ms_i × pan / pseudo_pan with pseudo_pan =
  Σ w_i·ms_i, MS bands upsampled (nearest) to the pan grid.

Spark-first plans:
* sieve: region labeling = the polygonize CC stage (equi-joins + min-label
  propagation); sizes and the largest-neighbour vote are two keyed
  aggregates; everything shuffles on int region ids, never pixel payloads.
* fill_nodata: the 4 directional "nearest valid pixel" scans are window
  functions (last_value ignorenulls over x- and y-ordered windows) — no
  joins, no UDFs; 2 range-partition shuffles (rows, then columns).
* pansharpen: pure column math, map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gdal_spark.operators.polygonize import label_regions


def sieve_filter(
    cells: DataFrame, threshold: int,
    x: str = "gx", y: str = "gy", value: str = "val",
    width: int | None = None, cc_max_iter: int | None = None,
) -> DataFrame:
    """One sieve pass: regions with < ``threshold`` cells take the value of
    their largest neighbouring region (ties broken by smallest region id —
    deterministic). Output: (x, y, val) per cell with sieved values.

    GDAL's in-memory union-find cascades small-into-small merges within one
    call; this distributed MVP is a single merge ROUND — apply it
    repeatedly for cascades (each round is a fixed set of keyed joins).
    Regions with no neighbour (whole-raster region) keep their value."""
    labeled = label_regions(cells, x, y, value, width, cc_max_iter).persist()
    sizes = labeled.groupBy("region_id").agg(
        F.count(F.lit(1)).alias("n_cells"), F.first("_v").alias("_rv")
    )

    # neighbour pairs between DIFFERENT regions (any value): shifted joins
    l_side = labeled.select("region_id", "_x", "_y")
    r_side = labeled.select(
        F.col("region_id").alias("region_b"),
        F.col("_x").alias("_xb"), F.col("_y").alias("_yb"),
    )
    pr = l_side.join(
        r_side,
        (F.col("_xb") == F.col("_x") + 1) & (F.col("_yb") == F.col("_y")),
    )
    pd_ = l_side.join(
        r_side,
        (F.col("_xb") == F.col("_x")) & (F.col("_yb") == F.col("_y") + 1),
    )
    pairs = (
        pr.unionAll(pd_)
        .filter(F.col("region_id") != F.col("region_b"))
        .select("region_id", "region_b")
    )
    # both directions (adjacency is symmetric), deduped
    pairs = pairs.unionAll(
        pairs.select(
            F.col("region_b").alias("region_id"),
            F.col("region_id").alias("region_b"),
        )
    ).distinct()

    nbr_sz = sizes.select(
        F.col("region_id").alias("region_b"),
        F.col("n_cells").alias("_nb_cells"), F.col("_rv").alias("_nb_v"),
    )
    w = Window.partitionBy("region_id").orderBy(
        F.col("_nb_cells").desc(), F.col("region_b").asc()
    )
    best_nbr = (
        pairs.join(nbr_sz, "region_b")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("region_id", F.col("_nb_v").alias("_merge_v"))
    )
    region_val = (
        sizes.join(best_nbr, "region_id", "left")
        .select(
            "region_id",
            F.when(
                (F.col("n_cells") < threshold)
                & F.col("_merge_v").isNotNull(),
                F.col("_merge_v"),
            ).otherwise(F.col("_rv")).alias("_out_v"),
        )
    )
    out = labeled.join(region_val, "region_id").select(
        F.col("_x").alias(x), F.col("_y").alias(y),
        F.col("_out_v").alias(value),
    )
    out = out.localCheckpoint(eager=True)
    labeled.unpersist()
    return out


def fill_nodata(
    cells: DataFrame, max_distance: int,
    x: str = "gx", y: str = "gy", value: str = "val",
) -> DataFrame:
    """Fill null cells by inverse-distance weighting of the nearest valid
    cell in each of the 4 axis directions within ``max_distance`` (the
    GDALFillNodata search restricted to its 4 scan directions, no smoothing
    iterations). Input must be a DENSE grid (every (x, y) present, null
    value = nodata). Output: (x, y, val, filled:boolean).

    Each directional scan is last_value(..., ignorenulls) over an ordered
    window — the Spark-native form of GDAL's line-scan pass; weights are
    1/d, filled = Σ v/d ÷ Σ 1/d over the directions that found a pixel."""
    vcol = F.col(value)
    packed = F.when(vcol.isNotNull(), F.struct(F.col(x), F.col(y), vcol))

    def scan(part: str, order, tag: str):
        w = (
            Window.partitionBy(part).orderBy(order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return F.last(packed, ignorenulls=True).over(w).alias(tag)

    df = cells.select(
        F.col(x), F.col(y), vcol.alias(value),
        scan(y, F.col(x).asc(), "_L"),
        scan(y, F.col(x).desc(), "_R"),
        scan(x, F.col(y).asc(), "_U"),
        scan(x, F.col(y).desc(), "_D"),
    )

    def term(tag: str, axis: str):
        c = F.col(tag)
        d = F.abs(F.col(axis) - c[axis]).cast("double")
        ok = c.isNotNull() & (d <= F.lit(float(max_distance)))
        return (
            F.when(ok, c[value] / d).otherwise(F.lit(0.0)),
            F.when(ok, F.lit(1.0) / d).otherwise(F.lit(0.0)),
        )

    nL, wL = term("_L", x)
    nR, wR = term("_R", x)
    nU, wU = term("_U", y)
    nD, wD = term("_D", y)
    wsum = wL + wR + wU + wD
    filled_val = F.when(
        vcol.isNotNull(), vcol
    ).when(wsum > 0.0, (nL + nR + nU + nD) / wsum)
    return df.select(
        F.col(x), F.col(y),
        filled_val.alias(value),
        (vcol.isNull() & (wsum > 0.0)).alias("filled"),
    )


def pansharpen_brovey(
    pan: DataFrame, ms: DataFrame, weights: list,
    x: str = "gx", y: str = "gy",
    pan_val: str = "pan", band_cols: tuple = ("b1", "b2", "b3"),
) -> DataFrame:
    """Weighted-Brovey pansharpening (gdalpansharpen.cpp:
    WeightedBroveyPositiveWeights): MS pixels at half resolution are
    upsampled to the pan grid by NEAREST (gx>>1, gy>>1 — the reference's
    default MS→pan resampling for a 2× ratio), then
    out_i = ms_i × pan / (Σ w_i·ms_i). Map-only: the MS side joins on the
    decimated key — broadcast when small, equi-join at scale."""
    if len(weights) != len(band_cols):
        raise ValueError("one weight per band")
    msk = ms.select(
        F.col(x).alias("_mx"), F.col(y).alias("_my"),
        *[F.col(b) for b in band_cols],
    )
    j = pan.withColumn("_mx", F.shiftright(F.col(x), 1)).withColumn(
        "_my", F.shiftright(F.col(y), 1)
    ).join(msk, ["_mx", "_my"])
    pseudo = None
    for wgt, b in zip(weights, band_cols):
        t = F.lit(float(wgt)) * F.col(b)
        pseudo = t if pseudo is None else pseudo + t
    out_cols = [F.col(x), F.col(y), F.col(pan_val)]
    for b in band_cols:
        out_cols.append(
            F.when(pseudo > 0.0, F.col(b) * F.col(pan_val) / pseudo)
            .otherwise(F.lit(0.0)).alias(f"sharp_{b}")
        )
    return j.select(*out_cols)
