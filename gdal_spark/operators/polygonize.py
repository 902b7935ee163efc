"""Raster → vector POLYGONIZE (alg/polygonize.cpp GDALPolygonize analog).

Connected regions of equal pixel value become polygon features. The
reference scans scanline pairs with a connectivity merger; the Spark-first
decomposition reuses two primitives this engine already has:

1. same-value 4-adjacency edges via two SELF EQUI-JOINS on shifted pixel
   keys (right neighbor, down neighbor) — no custom scan, no UDF;
2. connected components over those edges (operators/dedup.py
   connected_components — min-label propagation, O(region diameter)
   rounds);
3. per-component geometry: the unit-cell squares union through the
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

from gdal_spark.operators.dedup import connected_components
from gdal_spark.operators.dissolve import _ring_signed_area, union_coverage_rings


def label_regions(
    cells: DataFrame, x: str = "gx", y: str = "gy", value: str = "val",
    width: int | None = None, cc_max_iter: int | None = None,
    connectedness: int = 4,
) -> DataFrame:
    """Connected-component region labeling of a cell table (4- or
    8-adjacency, same value) — the shared first stage of polygonize and the
    sieve filter.  ``connectedness`` mirrors the reference's option
    (``GDALPolygonize``/``GDALSieveFilter`` ``nConnectedness``, the
    ``gdal_polygonize -8`` flag; alg/polygonize.cpp:40): 8 adds the two
    diagonal neighbor joins (down-right, down-left) to the edge set —
    still plain shifted-key equi-joins, no scan kernel.
    Output: (cid, _x, _y, _v, region_id) with region_id = min cid of the
    component. ``width`` is the grid width used to derive the scalar cell
    id (y*width + x); defaults to max(x)+1 computed from the data (one tiny
    aggregate). ``cc_max_iter`` bounds the label-propagation rounds;
    min-label propagation advances one hop per round and a serpentine
    region's diameter can approach the CELL COUNT (not the width), so the
    safe default is width×height. Convergence exits early, so the budget
    only costs rounds when a region actually needs them — pass a smaller
    ``cc_max_iter`` to fail fast instead."""
    if connectedness not in (4, 8):
        raise ValueError(f"connectedness must be 4 or 8, got {connectedness}")
    if width is None or cc_max_iter is None:
        ext = cells.agg(F.max(x).alias("mx"), F.max(y).alias("my")).first()
        if width is None:
            width = ext["mx"] + 1
        if cc_max_iter is None:
            cc_max_iter = max(int(width) * (int(ext["my"]) + 1), 64)
    c = cells.select(
        (F.col(y) * width + F.col(x)).alias("cid"),
        F.col(x).alias("_x"), F.col(y).alias("_y"),
        F.col(value).alias("_v"),
    )
    right = c.select(
        F.col("cid").alias("cid_b"), F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"), F.col("_v").alias("_vb"),
    )
    # 4-adjacency, same value: two equi-joins on shifted keys
    e_right = c.join(
        right,
        (F.col("_xb") == F.col("_x") + 1) & (F.col("_yb") == F.col("_y"))
        & (F.col("_vb") == F.col("_v")),
    ).select(F.col("cid").alias("id_a"), F.col("cid_b").alias("id_b"))
    e_down = c.join(
        right,
        (F.col("_xb") == F.col("_x")) & (F.col("_yb") == F.col("_y") + 1)
        & (F.col("_vb") == F.col("_v")),
    ).select(F.col("cid").alias("id_a"), F.col("cid_b").alias("id_b"))
    edges = e_right.unionAll(e_down)
    if connectedness == 8:
        e_dr = c.join(
            right,
            (F.col("_xb") == F.col("_x") + 1)
            & (F.col("_yb") == F.col("_y") + 1)
            & (F.col("_vb") == F.col("_v")),
        ).select(F.col("cid").alias("id_a"), F.col("cid_b").alias("id_b"))
        e_dl = c.join(
            right,
            (F.col("_xb") == F.col("_x") - 1)
            & (F.col("_yb") == F.col("_y") + 1)
            & (F.col("_vb") == F.col("_v")),
        ).select(F.col("cid").alias("id_a"), F.col("cid_b").alias("id_b"))
        edges = edges.unionAll(e_dr).unionAll(e_dl)

    comp = connected_components(edges, max_iter=cc_max_iter).select(
        F.col("doc_id").alias("cid"), F.col("cluster_id").alias("region_id")
    )
    # singleton cells (no same-value neighbor) are their own region
    return c.join(comp, "cid", "left").withColumn(
        "region_id", F.coalesce("region_id", F.col("cid"))
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
