"""Spatial clustering operators: DBSCAN and cluster-within (single linkage).

Reference semantics: PostGIS ``ST_ClusterDBSCAN`` / ``ST_ClusterWithin``
(window/aggregate forms) — the spatial clustering the reference's users run
via the SQLite/PostGIS dialect on OGR layers (the reference delegates to the
database engine; here we ARE the engine, so the operator is native).

DBSCAN (Ester et al., KDD 1996) on planar point coordinates:

* a point is **core** when ≥ ``minpts`` points (including itself) lie within
  ``eps`` (Euclidean on the coordinate plane — PostGIS semantics: the
  geometry's own coordinate units, here degrees);
* clusters are the connected components of the core-core ≤ eps graph;
* a non-core point within eps of ≥ 1 core point is a **border** point of
  that core's cluster (ties broken by MIN cluster id — PostGIS leaves the
  choice arbitrary; we pin it for determinism);
* everything else is noise (emitted with ``cluster_id IS NULL``).

Scale design (the 100 TB story):

* The within-eps neighbor join is a **cell-bucketed equi-join**: each point
  lands in grid cell ``(floor(x/eps), floor(y/eps))``; one side explodes to
  its 3×3 cell neighborhood so candidates meet on an exact 2-int key — the
  same bucket-join shape as the engine's PIP cell join and LSH band join.
  No all-pairs product anywhere; a hot cell (the fixture teleports every
  100th row to one spot) is exactly the skew AQE's skew-join splitting
  handles, and the 3×3 explode constant-factors the shuffle, it does not
  square it.
* Cluster formation reuses :func:`gdal_spark.operators.dedup.
  connected_components` — min-label propagation with pointer jumping,
  O(log diameter) rounds, per-round checkpoint lifecycle.
* Distance test is ``dx*dx + dy*dy <= eps*eps`` with the IDENTICAL float
  expression on the oracle side, so boundary comparisons agree bit-for-bit
  (no sqrt, no epsilon).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.dedup import connected_components

# Contracted cross-cell graphs up to this many edges are solved by a
# driver-side union-find (a bounded collect: 5M edges = ~80 MB of longs);
# larger graphs use the distributed min-label CC.
_DRIVER_CC_MAX_EDGES = 5_000_000


def _cell_local_roots(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find over one cell's internal edges (id_a, id_b) → one row per
    member id with root = MIN id of its cell-local component.  A cell holds
    at most the points of one eps-grid bucket, so this is a tiny in-memory
    problem regardless of total data size."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf["id_a"], pdf["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    members: dict[int, list[int]] = {}
    ids = set(int(v) for v in pdf["id_a"]) | set(int(v) for v in pdf["id_b"])
    for i in ids:
        members.setdefault(find(i), []).append(i)
    rows = {"id": [], "root": []}
    for root, ms in members.items():
        lo = min(ms)
        for i in ms:
            rows["id"].append(i)
            rows["root"].append(lo)
    return pd.DataFrame(rows)


def within_eps_pairs(
    points: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Directed pairs (u, v), u != v, with Euclidean distance ≤ eps.

    Cell-bucketed: grid side = eps, so any ≤-eps pair is in the same or an
    adjacent cell. One side explodes to the 3×3 neighborhood (constant ×9
    row factor on the probe side only), candidates meet on an exact
    (cx, cy) equi-join key, then the exact squared-distance filter runs
    JVM-side in whole-stage codegen. Returns BOTH directions of each pair
    (the degree-count and CC consumers want symmetric edges).
    """
    cx = F.floor(F.col(x_col) / F.lit(eps))
    cy = F.floor(F.col(y_col) / F.lit(eps))
    cells = points.select(
        F.col(id_col).alias("_cid"),
        F.col(x_col).alias("_cx_val"),
        F.col(y_col).alias("_cy_val"),
        cx.alias("_cell_x"),
        cy.alias("_cell_y"),
    )
    probe = (
        points.select(
            F.col(id_col).alias("_pid"),
            F.col(x_col).alias("_px_val"),
            F.col(y_col).alias("_py_val"),
            cx.alias("_pcx"),
            cy.alias("_pcy"),
        )
        .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "_pid", "_px_val", "_py_val",
            (F.col("_pcx") + F.col("_dx")).alias("_cell_x"),
            (F.col("_pcy") + F.col("_dy")).alias("_cell_y"),
        )
    )
    ddx = F.col("_px_val") - F.col("_cx_val")
    ddy = F.col("_py_val") - F.col("_cy_val")
    return (
        probe.join(cells, ["_cell_x", "_cell_y"])
        .filter(F.col("_pid") != F.col("_cid"))
        .filter(ddx * ddx + ddy * ddy <= F.lit(eps) * F.lit(eps))
        .select(F.col("_pid").alias("u"), F.col("_cid").alias("v"))
    )


def cluster_dbscan(
    points: DataFrame,
    eps: float,
    minpts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_iter: int = 25,
) -> DataFrame:
    """DBSCAN. Output: (id_col, cluster_id bigint-or-null, is_core bool).

    cluster_id = MIN id among the cluster's core points; noise rows keep
    their input row with cluster_id NULL / is_core false.
    """
    # localCheckpoint (not persist): the CC loop re-PLANS its input lineage
    # every round — leaving the 3x3-explode join in the logical plan costs
    # more in per-round Catalyst planning than the whole CC execution
    # (measured 34 s -> 13 s at sf0.01). Checkpointing truncates the plan.
    pairs = within_eps_pairs(points, eps, id_col, x_col, y_col).localCheckpoint(
        eager=True
    )
    deg = pairs.groupBy("u").agg(F.count(F.lit(1)).alias("_n"))
    # core: neighbors-within-eps INCLUDING self >= minpts
    core = deg.filter(F.col("_n") + 1 >= F.lit(minpts)).select("u").persist()
    # Two-level CC: a DBSCAN cluster is locally DENSE, so most core-core
    # edges live INSIDE one eps-grid cell.  Contract each cell's internal
    # components first — one Arrow pass over the CORE POINTS (a small
    # minority of the input) per cell, recomputing the within-cell eps graph
    # from coordinates with a vectorized chunked distance kernel — then
    # resolve only the contracted cross-cell graph.  Correctness:
    # contraction is a standard CC quotient, components of the quotient
    # graph lift to components of the original.  The contracted graph
    # (one vertex per cell-local component) is collected and solved with a
    # driver-side union-find when it is small (bounded collect, same
    # pattern as the rgb2pct histogram); past the threshold it falls back
    # to the distributed min-label CC — at 10^12 rows the contracted graph
    # is ~#occupied-cells-sized, still billions of times smaller than the
    # edge set.
    eps2 = eps * eps

    def _cell_components(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["_u"].to_numpy("int64")
        xs = pdf["_x"].to_numpy("float64")
        ys = pdf["_y"].to_numpy("float64")
        n = ids.shape[0]
        lbl = ids.copy()
        if n > 1:
            sentinel = np.int64(2 ** 62)
            # min-label propagation to fixpoint; the eps-cell graph's hop
            # diameter is geometrically tiny (any two points in a cell are
            # within eps*sqrt(2)), so this converges in a few rounds; the
            # 512-row chunks bound the adjacency slab for hot cells
            while True:
                new = lbl.copy()
                for s in range(0, n, 512):
                    e = min(n, s + 512)
                    dx = xs[s:e, None] - xs[None, :]
                    dy = ys[s:e, None] - ys[None, :]
                    adj = dx * dx + dy * dy <= eps2
                    cand = np.where(adj, lbl[None, :], sentinel)
                    new[s:e] = np.minimum(new[s:e], cand.min(axis=1))
                if (new == lbl).all():
                    break
                lbl = new
        return pd.DataFrame({"id": ids, "root": lbl})

    cellm = points.select(
        F.col(id_col).alias("_gid"),
        F.col(x_col).alias("_gx"),
        F.col(y_col).alias("_gy"),
        F.floor(F.col(x_col) / F.lit(eps)).alias("_gcx"),
        F.floor(F.col(y_col) / F.lit(eps)).alias("_gcy"),
    )
    core_pts = core.join(
        cellm, core["u"] == cellm["_gid"]
    ).select(
        F.col("u").alias("_u"), F.col("_gx").alias("_x"),
        F.col("_gy").alias("_y"), "_gcx", "_gcy",
    )
    # every core point appears in exactly one cell → one (id, root) row
    # each; isolated-in-cell cores (minpts=1 singletons included) root to
    # themselves
    m = (
        core_pts.groupBy("_gcx", "_gcy")
        .applyInPandas(_cell_components, "id long, root long")
        .select(F.col("id").alias("u"), F.col("root").alias("_root"))
        .localCheckpoint(eager=True)
    )
    # cross-cell core-core pairs → contracted edges between local roots
    cross = (
        pairs.join(
            cellm.select(F.col("_gid").alias("u"),
                         F.col("_gcx").alias("_ax"),
                         F.col("_gcy").alias("_ay")), "u")
        .join(cellm.select(F.col("_gid").alias("v"),
                           F.col("_gcx").alias("_bx"),
                           F.col("_gcy").alias("_by")), "v")
        .filter((F.col("u") < F.col("v"))
                & ((F.col("_ax") != F.col("_bx"))
                   | (F.col("_ay") != F.col("_by"))))
        .join(m.select(F.col("u").alias("u"), F.col("_root").alias("_ra")),
              "u")
        .join(m.select(F.col("u").alias("v"), F.col("_root").alias("_rb")),
              "v")
        .filter(F.col("_ra") != F.col("_rb"))
        .select(F.least("_ra", "_rb").alias("id_a"),
                F.greatest("_ra", "_rb").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_contracted = cross.count()
    if n_contracted <= _DRIVER_CC_MAX_EDGES:
        rows = cross.collect()
        pdf = pd.DataFrame(
            {"id_a": [r["id_a"] for r in rows],
             "id_b": [r["id_b"] for r in rows]}
        )
        uf = _cell_local_roots(pdf)
        spark = points.sparkSession
        if len(uf):
            root_lbl = F.broadcast(spark.createDataFrame(
                uf.rename(columns={"id": "_core_root", "root": "_rlbl"})
            ))
            core_lbl = (
                m.join(root_lbl, m["_root"] == F.col("_core_root"), "left")
                .select(
                    "u",
                    F.coalesce(F.col("_rlbl"), F.col("_root")).alias("_lbl"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            core_lbl = m.select(
                "u", F.col("_root").alias("_lbl")
            ).localCheckpoint(eager=True)
    else:  # contracted graph still huge → distributed min-label CC
        cc = connected_components(cross, max_iter=max_iter).select(
            F.col("doc_id").alias("_core_root"),
            F.col("cluster_id").alias("_rlbl"),
        )
        core_lbl = (
            m.join(cc, m["_root"] == cc["_core_root"], "left")
            .select(
                "u", F.coalesce(F.col("_rlbl"), F.col("_root")).alias("_lbl")
            )
            .localCheckpoint(eager=True)
        )
    # border: non-core with >=1 core neighbor → min core-cluster label
    border_lbl = (
        pairs.join(core_lbl.withColumnRenamed("u", "_cu"), pairs["v"] == F.col("_cu"))
        .join(core_lbl.withColumnRenamed("u", "_su").select("_su"),
              pairs["u"] == F.col("_su"), "left_anti")
        .groupBy("u")
        .agg(F.min("_lbl").alias("_lbl"))
    )
    labels = core_lbl.select("u", "_lbl", F.lit(True).alias("is_core")).unionAll(
        border_lbl.select("u", "_lbl", F.lit(False).alias("is_core"))
    )
    out = (
        points.select(F.col(id_col).alias("u"))
        .join(labels, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.col("_lbl").alias("cluster_id"),
            F.coalesce(F.col("is_core"), F.lit(False)).alias("is_core"),
        )
    )
    out = out.localCheckpoint(eager=True)
    core.unpersist()
    return out


def cluster_within(
    points: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_iter: int = 25,
) -> DataFrame:
    """Single-linkage clustering: ST_ClusterWithin semantics — clusters are
    connected components of the ≤-eps graph over ALL points; singletons are
    their own cluster. Output: (id_col, cluster_id, cluster_size)."""
    pairs = (
        within_eps_pairs(points, eps, id_col, x_col, y_col)
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
        .localCheckpoint(eager=True)  # truncate before the CC loop re-plans
    )
    cc = connected_components(pairs, max_iter=max_iter).select(
        F.col("doc_id").alias("_mid"),
        F.col("cluster_id").alias("_lbl"),
        "cluster_size",
    )
    return (
        points.select(F.col(id_col).alias("_pid2"))
        .join(cc, F.col("_pid2") == F.col("_mid"), "left")
        .select(
            F.col("_pid2").alias(id_col),
            F.coalesce(F.col("_lbl"), F.col("_pid2")).alias("cluster_id"),
            F.coalesce(F.col("cluster_size"), F.lit(1)).alias("cluster_size"),
        )
    )


# ---------------------------------------------------------------------------
# ST_ClusterKMeans (PostGIS window-function semantics, deterministic form):
# Lloyd iterations over integer micro-quantized planar coordinates.
# ---------------------------------------------------------------------------

def st_cluster_kmeans(
    points: DataFrame, seeds: list[tuple[int, int]], iters: int = 2,
    x: str = "xu", y: str = "yu",
) -> DataFrame:
    """K-means (Lloyd) over integer micro-coordinates — the deterministic
    twin of PostGIS ``ST_ClusterKMeans`` (whose k-means++ seeding is
    RNG-arbitrary; we pin literal seeds so both engines agree).

    Scale design: each ASSIGNMENT round is a pure column expression —
    per-point distance keys ``d2*8 + j`` against the k driver-collected
    centroid LITERALS, folded with ``least(...)`` (order-free integer
    min; ties break to the lower cluster id).  No join ever touches the
    point side; each UPDATE round is one bounded (k-row) partial-agg
    shuffle, and the integer ``sum // count`` centroid is order-free.
    k is bounded (a clustering parameter, not data), so the per-round
    driver collect is k rows — the same driver-paced iteration contract
    as PageRank/BFS.

    Returns (cluster_id, n_points, cx_micro, cy_micro) — counts and
    centroids AFTER the final update; empty clusters keep their previous
    centroid with n_points = 0.
    """
    spark = points.sparkSession
    cents = [(int(j), int(cx), int(cy))
             for j, (cx, cy) in enumerate(seeds)]
    k = len(cents)
    assign = None
    for _ in range(iters):
        keys = [
            ((F.col(x) - F.lit(cx)) * (F.col(x) - F.lit(cx))
             + (F.col(y) - F.lit(cy)) * (F.col(y) - F.lit(cy)))
            * 8 + F.lit(j)
            for j, cx, cy in cents
        ]
        assign = points.withColumn(
            "cluster_id", (F.least(*keys) % 8).cast("int"))
        upd = {
            r["cluster_id"]: (int(r["n"]), int(r["cx"]), int(r["cy"]))
            for r in assign.groupBy("cluster_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"sum({x}) div count(*)").alias("cx"),
                F.expr(f"sum({y}) div count(*)").alias("cy"),
            ).collect()
        }
        cents = [
            (j, upd[j][1], upd[j][2]) if j in upd else (j, cx, cy)
            for j, cx, cy in cents
        ]
        counts = {j: upd[j][0] if j in upd else 0 for j, _, _ in cents}
    out = [(j, counts[j], cx, cy) for j, cx, cy in cents]
    return spark.createDataFrame(
        out, "cluster_id int, n_points long, cx_micro long, cy_micro long")
