"""k-nearest-neighbour search over geotagged rows.

Reference semantics: GDALGridNearestNeighbor / moving-window metrics search a
CPLQuadTree (bucket 8, depth 12) with an expanding window until enough
candidates are found (alg/gdalgrid.cpp:905+, port/cpl_quad_tree.cpp:138-231);
the refine metric is the spherical-law-of-cosines great-circle distance
(ogr/ogr_geo_utils.cpp:25-46).

Spark-first design, two strategies:

* ``knn_join`` — queries are broadcast-small (the common shape: a probe set
  against a planetary point table). Each partition computes distances of its
  points to ALL queries vectorized (M×Q numpy), keeps only its LOCAL top-k
  per query (map-side pruning — the shuffle carries at most
  partitions × Q × k rows, independent of table size), then a global
  ``row_number`` window takes the final top-k. This is the
  TakeOrderedAndProject pattern generalized per query key.

* ``knn_cell_join`` — both sides large: points bucketed by quadkey cell;
  each query probes its own cell plus ``ring`` rings of neighbours (the
  k-ring expansion analog of the quadtree's expanding window), equi-join on
  cell, exact refine, window top-k. Correct iff the k-th neighbour lies
  within the ring radius — callers choose ring from data density, or use
  ``knn_join`` for exactness.

Ties break by (distance, id) ascending — deterministic, matching the
FIXTURES.md §6 oracle rule.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from gdal_spark.spatial import geometry as G
from gdal_spark.spatial import tilemath as TM


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_id: str = "i",
    query_id: str = "query_id",
    lon: str = "lon",
    lat: str = "lat",
    include_self: bool = False,
) -> DataFrame:
    """Exact kNN of each query against all points.

    Output: (query_id, neighbor_id, rank, dist_m) with rank 1..k by
    (dist_m, neighbor_id). ``include_self=False`` drops exact id matches
    (self-join convention when queries ⊂ points).
    """
    spark = points.sparkSession
    q_rows = queries.select(query_id, lon, lat).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_lon = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_lat = np.array([r[2] for r in q_rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((q_ids, q_lon, q_lat))

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("dist_m", DoubleType()),
        ]
    )
    id_i = points.columns.index(point_id)
    lon_i = points.columns.index(lon)
    lat_i = points.columns.index(lat)

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qlon, qlat = bc.value
        nq = ids.shape[0]
        # Running per-partition top-k accumulators: (Q, ≤k) matrices — the
        # whole merge is vectorized over ALL queries at once (one (Q, P)
        # broadcasted distance evaluation per batch, no per-query loop).
        acc_d = np.full((nq, 0), np.inf)
        acc_i = np.full((nq, 0), -1, dtype=np.int64)
        # chunk the point axis so (Q, chunk) temporaries stay L2-resident —
        # a full (Q, 65536) float64 block costs ~6 temp arrays × 50 MB
        chunk = max(1, 262144 // max(nq, 1))
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            p_id = pdf.iloc[:, id_i].to_numpy(dtype=np.int64)
            p_lon = pdf.iloc[:, lon_i].to_numpy(dtype=np.float64)
            p_lat = pdf.iloc[:, lat_i].to_numpy(dtype=np.float64)
            for s in range(0, p_id.shape[0], chunk):
                e = s + chunk
                d = G.great_circle_distance(
                    qlat[:, None], qlon[:, None],
                    p_lat[None, s:e], p_lon[None, s:e],
                )  # (Q, chunk) — same elementwise formula as the scalar path
                i = np.broadcast_to(p_id[None, s:e], d.shape)
                if not include_self:
                    d = np.where(i == ids[:, None], np.inf, d)
                cand_d = np.concatenate([acc_d, d], axis=1)
                cand_i = np.concatenate([acc_i, i], axis=1)
                if cand_d.shape[1] > k:
                    part = np.argpartition(cand_d, k - 1, axis=1)[:, :k]
                    cand_d = np.take_along_axis(cand_d, part, axis=1)
                    cand_i = np.take_along_axis(cand_i, part, axis=1)
                acc_d, acc_i = cand_d, cand_i
        keep = np.isfinite(acc_d)
        rows = {
            "query_id": np.repeat(ids, keep.sum(axis=1)),
            "neighbor_id": acc_i[keep],
            "dist_m": acc_d[keep],
        }
        yield pd.DataFrame(rows)

    partial = points.mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("neighbor_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_m")
    )


def knn_cell_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    zoom: int = 7,
    ring: int = 1,
    point_id: str = "i",
    query_id: str = "query_id",
    lon: str = "lon",
    lat: str = "lat",
    include_self: bool = False,
) -> DataFrame:
    """Cell-bucketed approximate-window kNN (exact within ``ring`` rings).

    Points carry (tx, ty) at ``zoom``; each query explodes to the
    (2·ring+1)² neighbouring cells (k-ring expansion on the tile grid, the
    quadkey analog of H3 k-ring), equi-joins, refines with the exact
    great-circle metric, and window-top-k's.
    """
    ptx, pty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    pts = points.select(
        F.col(point_id).alias("neighbor_id"),
        F.col(lon).alias("_plon"),
        F.col(lat).alias("_plat"),
        ptx.alias("cell_tx"),
        pty.alias("cell_ty"),
    )
    qtx, qty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    offsets = F.sequence(F.lit(-ring), F.lit(ring))
    qry = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(lon).alias("_qlon"),
            F.col(lat).alias("_qlat"),
            qtx.alias("_qtx"),
            qty.alias("_qty"),
        )
        .withColumn("_dx", F.explode(offsets))
        .withColumn("_dy", F.explode(offsets))
        .withColumn(
            "cell_tx", F.pmod(F.col("_qtx") + F.col("_dx"), F.lit(1 << zoom))
        )  # antimeridian wrap: tx is cyclic modulo 2^zoom
        .withColumn("cell_ty", F.col("_qty") + F.col("_dy"))
    )
    # pmod wrap can alias probe cells when 2*ring+1 >= 2^zoom — dedup so a
    # neighbor is joined at most once per query
    qry = qry.dropDuplicates(["query_id", "cell_tx", "cell_ty"])
    joined = qry.join(pts, on=["cell_tx", "cell_ty"], how="inner")
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    d2r = float(np.pi / 180.0)
    dist = F.acos(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(-1.0),
                F.sin(F.col("_qlat") * d2r) * F.sin(F.col("_plat") * d2r)
                + F.cos(F.col("_qlat") * d2r)
                * F.cos(F.col("_plat") * d2r)
                * F.cos((F.col("_plon") - F.col("_qlon")) * d2r),
            ),
        )
    ) * F.lit(G.EARTH_RADIUS)
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_m")
    )


def knn_cell_join_adaptive(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    zoom: int = 7,
    max_ring: int = 64,
    point_id: str = "i",
    query_id: str = "query_id",
    lon: str = "lon",
    lat: str = "lat",
    include_self: bool = False,
) -> DataFrame:
    """Expanding k-ring kNN -- the distributed analog of the reference's
    expanding quadtree window (alg/gdalgrid.cpp:905+, cpl_quad_tree.cpp:
    138-231): each iteration probes one ring perimeter of WebMercator cells;
    a query searches until it has k candidates, then continues for a
    per-query MARGIN of ceil(sec(|lat|)) + 1 further rings before retiring.

    The margin accounts for Mercator's conformal scale factor: ground
    distance = mercator distance x cos(lat), so a candidate k rings away in
    ground terms can be up to ~k*sec(lat) rings away on the tile grid.
    Iterations join only still-searching queries (a monotonically shrinking
    set) against the cell-bucketed point table; the candidate union is
    refined with the exact great-circle metric + window top-k.
    """
    ptx, pty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    pts = points.select(
        F.col(point_id).alias("neighbor_id"),
        F.col(lon).alias("_plon"),
        F.col(lat).alias("_plat"),
        ptx.alias("cell_tx"),
        pty.alias("cell_ty"),
    ).persist()
    qtx, qty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    margin = (
        F.ceil(
            F.lit(1.0)
            / F.cos(F.radians(F.least(F.abs(F.col(lat)), F.lit(85.0))))
        )
        + F.lit(1)
    ).cast("int")
    todo = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(lon).alias("_qlon"),
        F.col(lat).alias("_qlat"),
        qtx.alias("_qtx"),
        qty.alias("_qty"),
        margin.alias("_margin"),
        F.lit(None).cast("int").alias("_retire_ring"),
    ).persist()

    collected = None
    ring = 0
    while ring <= max_ring:
        if todo.isEmpty():
            break
        offsets = [
            (dx, dy)
            for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)
            if max(abs(dx), abs(dy)) == ring
        ]
        probe = todo.select(
            "query_id", "_qlon", "_qlat",
            F.explode(
                F.array(*[
                    F.struct(
                        F.pmod(
                            F.col("_qtx") + F.lit(dx), F.lit(1 << zoom)
                        ).alias("cell_tx"),  # antimeridian wrap
                        (F.col("_qty") + F.lit(dy)).alias("cell_ty"),
                    )
                    for dx, dy in offsets
                ])
            ).alias("c"),
        ).select("query_id", "_qlon", "_qlat", "c.cell_tx", "c.cell_ty")
        found = probe.join(pts, on=["cell_tx", "cell_ty"], how="inner").select(
            "query_id", "_qlon", "_qlat", "neighbor_id", "_plon", "_plat"
        )
        if not include_self:
            found = found.filter(F.col("neighbor_id") != F.col("query_id"))
        collected = found if collected is None else collected.unionAll(found)
        # localCheckpoint truncates the union lineage — without it the plan
        # (and analysis time) grows quadratically with ring count
        collected = collected.localCheckpoint(eager=True)
        counts = (
            collected.dropDuplicates(["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("_n"))
        )
        todo = (
            todo.join(counts, "query_id", "left")
            .withColumn(
                "_retire_ring",
                F.when(
                    F.col("_retire_ring").isNull()
                    & (F.coalesce(F.col("_n"), F.lit(0)) >= k),
                    F.lit(ring) + F.col("_margin"),
                ).otherwise(F.col("_retire_ring")),
            )
            .filter(
                F.col("_retire_ring").isNull()
                | (F.col("_retire_ring") > ring)
            )
            .drop("_n")
            .localCheckpoint(eager=True)
        )
        ring += 1

    d2r = float(np.pi / 180.0)
    dist = F.acos(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(-1.0),
                F.sin(F.col("_qlat") * d2r) * F.sin(F.col("_plat") * d2r)
                + F.cos(F.col("_qlat") * d2r)
                * F.cos(F.col("_plat") * d2r)
                * F.cos((F.col("_plon") - F.col("_qlon")) * d2r),
            ),
        )
    ) * F.lit(G.EARTH_RADIUS)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col("neighbor_id").asc()
    )
    return (
        collected.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("dist_m", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_m")
    )
