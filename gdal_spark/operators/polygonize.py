"""Raster → vector POLYGONIZE (alg/polygonize.cpp GDALPolygonize analog).

Connected regions of equal pixel value become polygon features. The
reference scans scanline pairs with a connectivity merger; the Spark-first
decomposition:

1. TWO-LEVEL connected components (the same contraction structure as
   DBSCAN, operators/cluster.py): label each BLOCK of the grid locally
   with one vectorized union-find pass (shift-derived same-value edges,
   no joins), then resolve only the block-BOUNDARY-crossing edges — a
   contracted graph whose size is the total region perimeter, not the
   pixel count.  Small contracted graphs (<= 5M edges) collapse with a
   bounded driver union-find; larger ones fall back to the distributed
   pointer-jumping CC (operators/dedup.py).
2. per-component geometry: the unit-cell squares union through the
   edge-cancellation ring tracer (operators/dissolve.py) — one shuffle on
   the component id, yielding exact boundary rings (holes included).

Output per region: (region_id = min cell id, pixel value, n_cells,
boundary rings → n_rings, perimeter, area).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.cluster import _cell_local_roots, _DRIVER_CC_MAX_EDGES
from gdal_spark.operators.dedup import connected_components
from gdal_spark.operators.dissolve import _ring_signed_area, union_coverage_rings

# Block edge (cells) for the local-labeling stage: 128x128 = 16,384 cells
# per task — large enough that boundary edges are ~1% of cell count, small
# enough that the per-block union-find stays in cache.
_LBL_BLOCK = 128


def label_regions(
    cells: DataFrame, x: str = "gx", y: str = "gy", value: str = "val",
    width: int | None = None, cc_max_iter: int | None = None,
    connectedness: int = 4, block: int = _LBL_BLOCK,
) -> DataFrame:
    """Connected-component region labeling of a cell table (4- or
    8-adjacency, same value) — the shared first stage of polygonize and the
    sieve filter.  ``connectedness`` mirrors the reference's option
    (``GDALPolygonize``/``GDALSieveFilter`` ``nConnectedness``, the
    ``gdal_polygonize -8`` flag; alg/polygonize.cpp:40): 8 adds the two
    diagonal directions to the edge set.

    Two-level plan: per-block vectorized union-find (one ``applyInPandas``
    task per ``block``×``block`` window — local edges come from array
    SHIFTS, never joins), then only block-crossing neighbor pairs join the
    contracted graph between block-local roots.  The contracted graph is
    perimeter-sized; it resolves with a bounded driver union-find (the
    rgb2pct-histogram collect pattern) or, past 5M edges, the distributed
    pointer-jumping CC.  Correctness: contraction is a CC quotient —
    components of the quotient lift to components of the original; every
    component's global-min cid is a local root in its own block, so the
    composed label stays "min cid of component".

    Output: (cid, _x, _y, _v, region_id) with region_id = min cid of the
    component. ``width`` is the grid width used to derive the scalar cell
    id (y*width + x); defaults to max(x)+1 computed from the data (one tiny
    aggregate). ``cc_max_iter`` bounds the fallback CC's rounds."""
    if connectedness not in (4, 8):
        raise ValueError(f"connectedness must be 4 or 8, got {connectedness}")
    if width is None:
        ext = cells.agg(F.max(x).alias("mx")).first()
        width = ext["mx"] + 1
    if cc_max_iter is None:
        cc_max_iter = 64
    c = cells.select(
        (F.col(y) * width + F.col(x)).alias("cid"),
        F.col(x).alias("_x"), F.col(y).alias("_y"),
        F.col(value).cast("double").alias("_v"),
    )

    dirs = [(1, 0), (0, 1)]
    if connectedness == 8:
        dirs += [(1, 1), (-1, 1)]

    def block_components(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        xs = pdf["_x"].to_numpy(np.int64)
        ys = pdf["_y"].to_numpy(np.int64)
        vs = pdf["_v"].to_numpy(np.float64)
        cids = pdf["cid"].to_numpy(np.int64)
        lx = xs % block
        ly = ys % block
        pos = np.full((block, block), -1, np.int64)
        pos[ly, lx] = np.arange(n)
        vg = np.full((block, block), np.nan)
        vg[ly, lx] = vs

        parent = np.arange(n, dtype=np.int64)

        def find(i: int) -> int:
            r = i
            while parent[r] != r:
                r = parent[r]
            while parent[i] != i:
                parent[i], i = r, parent[i]
            return r

        for dx, dy in dirs:
            if dx >= 0:
                axs, bxs = slice(0, block - dx), slice(dx, block)
            else:
                axs, bxs = slice(-dx, block), slice(0, block + dx)
            ays, bys = slice(0, block - dy), slice(dy, block)
            pa, pb = pos[ays, axs], pos[bys, bxs]
            va, vb = vg[ays, axs], vg[bys, bxs]
            m = (pa >= 0) & (pb >= 0) & (va == vb)
            for ia, ib in zip(pa[m], pb[m]):
                ra, rb = find(int(ia)), find(int(ib))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(int(i)) for i in range(n)), np.int64, n)
        # local component label = min cid of the local component
        min_cid: dict[int, int] = {}
        for r, cc_ in zip(roots, cids):
            cur = min_cid.get(int(r))
            if cur is None or cc_ < cur:
                min_cid[int(r)] = int(cc_)
        lbl = np.fromiter(
            (min_cid[int(r)] for r in roots), np.int64, n)
        return pd.DataFrame({"cid": cids, "root": lbl})

    m = (
        c.withColumn("_bx", F.floor(F.col("_x") / block))
        .withColumn("_by", F.floor(F.col("_y") / block))
        .groupBy("_bx", "_by")
        .applyInPandas(block_components, "cid long, root long")
        .localCheckpoint(eager=True)
    )

    # block-CROSSING neighbor pairs only → contracted edges between roots
    right = c.select(
        F.col("cid").alias("cid_b"), F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"), F.col("_v").alias("_vb"),
    )
    crossings = []
    for dx, dy in dirs:
        cond = (
            (F.col("_xb") == F.col("_x") + dx)
            & (F.col("_yb") == F.col("_y") + dy)
            & (F.col("_vb") == F.col("_v"))
        )
        crossing = F.lit(False)
        if dx == 1:
            crossing = crossing | (F.col("_x") % block == block - 1)
        if dx == -1:
            crossing = crossing | (F.col("_x") % block == 0)
        if dy == 1:
            crossing = crossing | (F.col("_y") % block == block - 1)
        crossings.append(
            c.join(right, cond & crossing).select(
                F.col("cid").alias("id_a"), F.col("cid_b").alias("id_b"))
        )
    cross_cells = crossings[0]
    for e in crossings[1:]:
        cross_cells = cross_cells.unionAll(e)
    cross = (
        cross_cells
        .join(m.select(F.col("cid").alias("id_a"),
                       F.col("root").alias("_ra")), "id_a")
        .join(m.select(F.col("cid").alias("id_b"),
                       F.col("root").alias("_rb")), "id_b")
        .filter(F.col("_ra") != F.col("_rb"))
        .select(F.least("_ra", "_rb").alias("id_a"),
                F.greatest("_ra", "_rb").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_contracted = cross.count()
    spark = cells.sparkSession
    if n_contracted == 0:
        glbl = None
    elif n_contracted <= _DRIVER_CC_MAX_EDGES:
        rows = cross.collect()
        uf = _cell_local_roots(pd.DataFrame(
            {"id_a": [r["id_a"] for r in rows],
             "id_b": [r["id_b"] for r in rows]}
        ))
        glbl = F.broadcast(spark.createDataFrame(
            uf.rename(columns={"id": "_groot", "root": "_glbl"})))
    else:  # contracted graph still huge → distributed pointer-jumping CC
        glbl = connected_components(cross, max_iter=cc_max_iter).select(
            F.col("doc_id").alias("_groot"),
            F.col("cluster_id").alias("_glbl"),
        )
    lab = c.join(m, "cid")
    if glbl is None:
        return lab.withColumn("region_id", F.col("root")).drop("root")
    return (
        lab.join(glbl, lab["root"] == F.col("_groot"), "left")
        .select(
            "cid", "_x", "_y", "_v",
            F.coalesce(F.col("_glbl"), F.col("root")).alias("region_id"),
        )
    )


def polygonize(
    cells: DataFrame, x: str = "gx", y: str = "gy", value: str = "val",
    width: int | None = None, cc_max_iter: int | None = None,
) -> DataFrame:
    """Polygonize a cell table (one row per pixel): region labeling
    (label_regions) + per-region boundary-ring tracing."""
    labeled = label_regions(cells, x, y, value, width, cc_max_iter)

    def trace(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = int(pdf["region_id"].iloc[0])
        squares = []
        for xx, yy in zip(pdf["_x"], pdf["_y"]):
            x0, y0 = float(xx), float(yy)
            squares.append([np.array(
                [[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1], [x0, y0 + 1],
                 [x0, y0]]
            )])
        rings = union_coverage_rings(squares)
        areas = [_ring_signed_area(r) for r in rings]
        perim = float(sum(
            np.abs(np.diff(r[:, 0])).sum() + np.abs(np.diff(r[:, 1])).sum()
            for r in rings
        ))
        return pd.DataFrame(
            {
                "region_id": [rid],
                "val": [float(pdf["_v"].iloc[0])],
                "n_cells": [len(squares)],
                "n_rings": [len(rings)],
                "area": [float(sum(areas))],
                "perimeter": [perim],
            }
        )

    schema = (
        "region_id long, val double, n_cells long, n_rings int, "
        "area double, perimeter double"
    )
    return labeled.select("region_id", "_x", "_y", "_v").groupBy(
        "region_id"
    ).applyInPandas(trace, schema)
