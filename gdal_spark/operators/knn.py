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
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

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
                    # exact (dist asc, id asc) top-k per row, tie-safe:
                    # duplicate coordinates (hot-cell 1e-4 quantization) make
                    # equal distances realizable, and argpartition keeps an
                    # arbitrary element among equals. Reorder columns by id
                    # first, then a STABLE argsort on dist — stability turns
                    # the id pre-order into the exact tiebreak.
                    idord = np.argsort(cand_i, axis=1, kind="stable")
                    cand_d = np.take_along_axis(cand_d, idord, axis=1)
                    cand_i = np.take_along_axis(cand_i, idord, axis=1)
                    dord = np.argsort(cand_d, axis=1, kind="stable")[:, :k]
                    cand_d = np.take_along_axis(cand_d, dord, axis=1)
                    cand_i = np.take_along_axis(cand_i, dord, axis=1)
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
    # Map-side partial top-k BEFORE the rank shuffle: the global top-k under
    # the TOTAL order (dist, neighbor_id) equals the top-k of per-batch
    # top-k's, so the window's shuffle carries ≤ batches × queries × k rows
    # instead of the full join output (queries × candidates).
    cand = joined.withColumn("dist_m", dist).select(
        "query_id", "neighbor_id", "dist_m"
    )
    partial = _partial_topk_batches(cand, k)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_m")
    )


def _partial_topk_batches(cand: DataFrame, k: int) -> DataFrame:
    """Arrow-batch-level top-k per query over (query_id, neighbor_id,
    dist_m) — exact under the (dist, id) total order, pure numpy."""
    schema = "query_id long, neighbor_id long, dist_m double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            q = pdf["query_id"].to_numpy(dtype=np.int64)
            n = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            d = pdf["dist_m"].to_numpy(dtype=np.float64)
            order = np.lexsort((n, d, q))
            q, n, d = q[order], n[order], d[order]
            new_grp = np.empty(q.shape[0], dtype=bool)
            new_grp[0] = True
            new_grp[1:] = q[1:] != q[:-1]
            starts = np.nonzero(new_grp)[0]
            lens = np.diff(np.r_[starts, q.shape[0]])
            rank = np.arange(q.shape[0]) - np.repeat(starts, lens)
            keep = rank < k
            yield pd.DataFrame(
                {"query_id": q[keep], "neighbor_id": n[keep],
                 "dist_m": d[keep]}
            )

    return cand.mapInPandas(run, schema)


def _gc_dist_col() -> "F.Column":
    """Exact great-circle distance column over (_qlat,_qlon,_plat,_plon) —
    spherical law of cosines, same formula as ogr/ogr_geo_utils.cpp:25-46."""
    d2r = float(np.pi / 180.0)
    return F.acos(
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


_MAXLAT_RAD = float(np.radians(85.05112878))  # WebMercator latitude limit


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
    on_capped: str = "error",
) -> DataFrame:
    """Expanding k-ring kNN — the distributed analog of the reference's
    expanding quadtree window (alg/gdalgrid.cpp:905+, cpl_quad_tree.cpp:
    138-231), restructured for scale as O(log max_ring) Spark jobs:

    Phase 1 (geometric ring batching): probe Chebyshev ring *batches*
    [0..1], [2..3], [4..7], ... doubling the radius each round, joining
    only still-unsatisfied queries against the cell-bucketed point table,
    until every query has >= k distinct candidates (or max_ring is hit).
    Each batch is one join + one count — not one job per ring.

    Phase 2 (guaranteed completion): the k-th candidate's *actual*
    great-circle distance d_k is an upper bound on the true k-th-neighbor
    distance. Convert d_k to a provably sufficient cell rectangle:
      |dlat| <= d_k/Re  (meridional arc can't exceed total arc), and from
      haversine  sin(d/2Re) >= cos(lat_max)*sin(dlon/2), so
      dlon <= 2*asin(min(1, sin(d_k/2Re)/cos(lat_max)))  with
      lat_max = min(|lat_q| + d_k/Re, 85.051...) the worst reachable
      latitude. Map both to Mercator meters -> cell counts (+1 for the
      query's in-cell offset) and probe every not-yet-probed cell in that
      rectangle. The final window top-k over the union is therefore EXACT
      (Mercator's sec(lat) anisotropy is handled by construction, not by a
      heuristic additive margin). Queries that never reach k candidates
      within max_ring get no phase-2 exactness guarantee; ``on_capped``
      controls what happens to them: ``"error"`` (default) raises so a
      silent best-effort result can never masquerade as exact, ``"flag"``
      returns them with a boolean ``exact`` column (False for capped
      queries, True otherwise — the column is always present in flag mode
      so the schema is deterministic).
    """
    if on_capped not in ("error", "flag"):
        raise ValueError("on_capped must be 'error' or 'flag'")
    spark = points.sparkSession
    out_cols = ["query_id", "neighbor_id", "rank", "dist_m"]
    n_cells = 1 << zoom
    cell_m = 2.0 * TM.ORIGIN_SHIFT / n_cells  # Mercator meters per cell

    ptx, pty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    pts = points.select(
        F.col(point_id).alias("neighbor_id"),
        F.col(lon).alias("_plon"),
        F.col(lat).alias("_plat"),
        ptx.alias("cell_tx"),
        pty.alias("cell_ty"),
    ).persist()
    qtx, qty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    todo = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(lon).alias("_qlon"),
        F.col(lat).alias("_qlat"),
        qtx.alias("_qtx"),
        qty.alias("_qty"),
    ).persist()

    def _probe_cells(q: DataFrame, lo_col, hi_col) -> DataFrame:
        """Explode q to its cells with Chebyshev ring in [lo, hi]; tx wraps
        at the antimeridian (pmod), ty outside the grid is dropped, and
        wrap-aliased cells are deduped per query."""
        return (
            q.withColumn("_dx", F.explode(F.sequence(-hi_col, hi_col)))
            .withColumn("_dy", F.explode(F.sequence(-hi_col, hi_col)))
            .filter(F.greatest(F.abs("_dx"), F.abs("_dy")) >= lo_col)
            .withColumn(
                "cell_tx", F.pmod(F.col("_qtx") + F.col("_dx"), F.lit(n_cells))
            )
            .withColumn("cell_ty", F.col("_qty") + F.col("_dy"))
            .filter(
                (F.col("cell_ty") >= 0) & (F.col("cell_ty") < n_cells)
            )
            .dropDuplicates(["query_id", "cell_tx", "cell_ty"])
            .select("query_id", "_qlon", "_qlat", "cell_tx", "cell_ty")
        )

    def _found(probe: DataFrame) -> DataFrame:
        f = probe.join(pts, on=["cell_tx", "cell_ty"], how="inner").select(
            "query_id", "_qlon", "_qlat", "neighbor_id", "_plon", "_plat"
        )
        if not include_self:
            f = f.filter(F.col("neighbor_id") != F.col("query_id"))
        return f

    collected = None
    done_parts: list[DataFrame] = []
    lo, hi = 0, 1
    n_todo = todo.count()
    while n_todo > 0 and lo <= max_ring:
        hi = min(hi, max_ring)
        probe = _probe_cells(todo, F.lit(lo), F.lit(hi))
        found = _found(probe)
        collected = found if collected is None else collected.unionAll(found)
        # localCheckpoint truncates the growing union lineage (few batches,
        # but each references the previous union)
        collected = collected.localCheckpoint(eager=True)
        counts = (
            collected.dropDuplicates(["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        merged = todo.join(counts, "query_id", "left").withColumn(
            "_probed", F.lit(hi)
        )
        newly_done = merged.filter(F.coalesce("_n", F.lit(0)) >= k).drop("_n")
        done_parts.append(newly_done.localCheckpoint(eager=True))
        new_todo = (
            merged.filter(F.coalesce("_n", F.lit(0)) < k)
            .drop("_n", "_probed")
            .localCheckpoint(eager=True)
        )
        todo.unpersist()
        todo = new_todo.persist()
        n_todo = todo.count()
        lo, hi = hi + 1, hi * 2 + 1

    if collected is None:  # empty query set
        pts.unpersist()
        todo.unpersist()
        fields = [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("rank", LongType()),
            StructField("dist_m", DoubleType()),
        ]
        if on_capped == "flag":
            fields.append(StructField("exact", BooleanType()))
        return spark.createDataFrame([], StructType(fields))

    # stragglers that hit the max_ring cap have no phase-2 exactness bound:
    # raise (default) or mark them, never return silent best-effort rows
    capped = None
    if n_todo > 0:
        if on_capped == "error":
            pts.unpersist()
            todo.unpersist()
            raise RuntimeError(
                f"{n_todo} queries did not reach k={k} candidates within "
                f"max_ring={max_ring}; their results would be best-effort. "
                "Raise max_ring/lower zoom, or pass on_capped='flag' to get "
                "them with exact=false."
            )
        capped = (
            todo.select("query_id")
            .withColumn("_capped", F.lit(True))
            .localCheckpoint(eager=True)
        )
    qstate = todo.withColumn("_probed", F.lit(min(max(hi // 2, 1), max_ring)))
    for part in done_parts:
        qstate = qstate.unionByName(part)

    # ---- phase 2: probe the d_k-derived rectangle beyond the probed square
    dedup = collected.dropDuplicates(["query_id", "neighbor_id"])
    wv = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col("neighbor_id").asc()
    )
    dk = (
        dedup.withColumn("dist_m", _gc_dist_col())
        .withColumn("rank", F.row_number().over(wv))
        .filter(F.col("rank") == k)
        .select("query_id", F.col("dist_m").alias("_dk"))
    )
    re_ = G.EARTH_RADIUS
    phi = F.radians(F.col("_qlat"))
    dphi = F.col("_dk") / F.lit(re_)
    y_of = lambda p: F.lit(re_) * F.log(
        F.tan(F.lit(float(np.pi / 4.0)) + p / 2.0)
    )
    phi_hi = F.least(phi + dphi, F.lit(_MAXLAT_RAD))
    phi_lo = F.greatest(phi - dphi, F.lit(-_MAXLAT_RAD))
    dy_max = F.greatest(y_of(phi_hi) - y_of(phi), y_of(phi) - y_of(phi_lo))
    cos_max = F.cos(F.least(F.abs(phi) + dphi, F.lit(_MAXLAT_RAD)))
    dlam = 2.0 * F.asin(
        F.least(F.lit(1.0), F.sin(F.col("_dk") / F.lit(2.0 * re_)) / cos_max)
    )
    dx_merc = F.lit(re_) * dlam
    r_y = (F.ceil(dy_max / F.lit(cell_m)) + 1).cast("int")
    r_x = F.least(
        (F.ceil(dx_merc / F.lit(cell_m)) + 1).cast("int"),
        F.lit(n_cells // 2),  # x wraps: half the world covers every cell
    )
    ext = (
        qstate.join(dk, "query_id", "inner")
        .withColumn("_r", F.greatest(r_x, r_y))
        .filter(F.col("_r") > F.col("_probed"))
    )
    probe2 = (
        ext.withColumn("_dx", F.explode(F.sequence(-r_x, r_x)))
        .withColumn("_dy", F.explode(F.sequence(-r_y, r_y)))
        .filter(
            F.greatest(F.abs("_dx"), F.abs("_dy")) > F.col("_probed")
        )
        .withColumn(
            "cell_tx", F.pmod(F.col("_qtx") + F.col("_dx"), F.lit(n_cells))
        )
        .withColumn("cell_ty", F.col("_qty") + F.col("_dy"))
        .filter((F.col("cell_ty") >= 0) & (F.col("cell_ty") < n_cells))
        .dropDuplicates(["query_id", "cell_tx", "cell_ty"])
        .select("query_id", "_qlon", "_qlat", "cell_tx", "cell_ty")
    )
    collected = collected.unionAll(_found(probe2))

    out = (
        collected.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("dist_m", _gc_dist_col())
        .withColumn("rank", F.row_number().over(wv))
        .filter(F.col("rank") <= k)
        .select(*out_cols)
    )
    if on_capped == "flag":
        if capped is not None:
            out = (
                out.join(F.broadcast(capped), "query_id", "left")
                .withColumn("exact", F.col("_capped").isNull())
                .drop("_capped")
            )
        else:
            out = out.withColumn("exact", F.lit(True))
    # materialize before unpersisting the inputs the plan references
    out = out.localCheckpoint(eager=True)
    pts.unpersist()
    todo.unpersist()
    return out


def _hex_axial_cells(lon_col, lat_col, size: float):
    """Axial hex-cell (q, r) columns of a pointy-top hexagonal grid with
    circumradius ``size`` (degrees, planar): fractional axial coords +
    the standard cube-rounding CASE chain (Patel's hex-grid reference,
    public) — pure JVM column math.  The hex binning is ENGINE-INTERNAL
    (candidate generation only); correctness comes from the exact refine,
    so no cross-engine rounding parity is required."""
    s3 = float(np.sqrt(3.0))
    qf = (lon_col * F.lit(s3 / 3.0) - lat_col / F.lit(3.0)) / F.lit(size)
    rf = (lat_col * F.lit(2.0 / 3.0)) / F.lit(size)
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = F.round(xf, 0), F.round(yf, 0), F.round(zf, 0)
    dx, dy, dz = F.abs(rx - xf), F.abs(ry - yf), F.abs(rz - zf)
    # exactly one coordinate is corrected to restore x+y+z=0: the one
    # with the largest rounding error (x -> q, z -> r; y is implicit)
    cq = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    cr = F.when((dx > dy) & (dx > dz), rz).when(dy > dz, rz).otherwise(
        -rx - ry)
    return cq.cast("long"), cr.cast("long")


def knn_hex_kring_join(
    points: DataFrame, queries: DataFrame, k: int, ring: int,
    size: float, point_id: str = "o_orderkey",
) -> DataFrame:
    """kNN by HEX k-ring expansion + exact great-circle refine (the
    north-star H3-style shape on a flat axial hex grid): base points
    bucket to hex cells once; each query explodes its radius-``ring``
    hex k-ring (the axial-coordinate disk |dq|<=k, max(-k,-dq-k)<=dr<=
    min(k,-dq+k) — (3k^2+3k+1) cells, closed form), candidates come from
    ONE equi-join on the (q, r) cell key, and the exact spherical
    law-of-cosines distance (ogr/ogr_geo_utils.cpp:25-46 parity) refines
    to the top-k with deterministic (dist, neighbor_id) tie-break.
    With ``ring`` covering the populated grid the result is exact (the
    demo gate's contract, like the zoom-2 quadkey variant); production
    sizes trade ring radius for recall."""
    from pyspark.sql import Window

    pq, pr = _hex_axial_cells(F.col("lon"), F.col("lat"), size)
    base = points.select(
        F.col(point_id).alias("neighbor_id"),
        F.col("lon").alias("_plon"), F.col("lat").alias("_plat"),
        pq.alias("_cq"), pr.alias("_cr"),
    )
    qq, qr = _hex_axial_cells(F.col("lon"), F.col("lat"), size)
    qc = queries.select(
        "query_id",
        F.col("lon").alias("_qlon"), F.col("lat").alias("_qlat"),
        qq.alias("_q0"), qr.alias("_r0"),
    )
    probe = (
        qc.withColumn("_dq", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
        .withColumn("_dr", F.explode(F.sequence(
            F.greatest(F.lit(-ring), -F.col("_dq") - ring),
            F.least(F.lit(ring), -F.col("_dq") + ring))))
        .select(
            "query_id", "_qlon", "_qlat",
            (F.col("_q0") + F.col("_dq")).alias("_cq"),
            (F.col("_r0") + F.col("_dr")).alias("_cr"),
        )
    )
    cand = probe.join(base, on=["_cq", "_cr"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    wd = cand.withColumn("dist_m", _gc_dist_col()).select(
        "query_id", "neighbor_id", "dist_m")

    # Per-partition top-k PRE-REDUCTION before the per-query window: the
    # exhaustive ring join emits (queries x points) candidates, and
    # shuffling all of them into the window costs more than the join
    # itself.  An Arrow-batched per-partition selection keeps only
    # (queries x k) rows per partition — identical (dist, neighbor_id)
    # order, so the final window sees bit-identical survivors; the
    # global shuffle shrinks from |candidates| to (#partitions x k x
    # #queries), the same two-level shape as the engine's CC and rank
    # reductions.
    import numpy as np
    import pandas as pd

    kk = int(k)

    def _prereduce(batches):
        acc: dict = {}
        for pdf in batches:
            for qid, g in pdf.groupby("query_id", sort=False):
                arr = g[["neighbor_id", "dist_m"]].to_numpy(dtype=np.float64)
                prev = acc.get(qid)
                if prev is not None:
                    arr = np.vstack([prev, arr])
                if arr.shape[0] > kk:
                    idx = np.lexsort((arr[:, 0], arr[:, 1]))[:kk]
                    arr = arr[idx]
                acc[qid] = arr
        if not acc:
            yield pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "dist_m": pd.Series([], dtype="float64")})
            return
        qids = np.concatenate(
            [np.full(a.shape[0], q, dtype=np.int64) for q, a in acc.items()])
        mat = np.vstack(list(acc.values()))
        yield pd.DataFrame(
            {"query_id": qids,
             "neighbor_id": mat[:, 0].astype(np.int64),
             "dist_m": mat[:, 1]})

    red = wd.mapInPandas(
        _prereduce, schema="query_id long, neighbor_id long, dist_m double")
    wv = Window.partitionBy("query_id").orderBy(
        F.asc("dist_m"), F.asc("neighbor_id"))
    return (
        red.withColumn("rank", F.row_number().over(wv))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_m")
    )
