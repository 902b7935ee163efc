"""Polygon↔polygon spatial join (predicate menu) + rectangle clip.

Reference semantics: OGRGeometry::Intersects/Touches/Overlaps/Contains/
Within/Equals between two polygon layers (ogr/ogrgeometry.cpp:571,6002-6402;
exercised by autotest/ogr/ogr_geom.py:2430-2475) and OGRLayer::Clip
(ogr/ogrlayer.cpp:7538, apps/gdalalg_vector_clip.cpp) for rectangular clip
geometries.

Spark-first plan (the 100 TB shape):

* ``poly_relate_join`` — both layers large: each polygon's envelope is
  covered with WebMercator tile cells at a fixed zoom (pure column math,
  explode of per-axis sequences), the layers equi-join on the cell key, and
  duplicate candidates are eliminated map-side with the *reference-cell*
  trick (a pair is kept only in the top-left cell of its envelope
  intersection — no distinct/shuffle needed, standard in distributed spatial
  joins). Only then does the exact numpy relate kernel
  (spatial/geometry.py:relate_polygons) run per candidate pair inside an
  Arrow-batched mapInPandas. Skewed cells (many polygons in one cell) are
  ordinary equi-join skew — AQE skew-split applies.

* ``clip_to_rect`` — map-only: envelope prefilter as a pushdown-friendly
  column predicate, then the Sutherland–Hodgman kernel
  (spatial/geometry.py:clip_rings_rect) per row in mapInPandas.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.spatial import geometry as G
from gdal_spark.spatial import tilemath as TM

FLAGS = ["intersects", "touches", "overlaps", "contains", "within", "equals"]


def _with_cover(df: DataFrame, zoom: int, id_col: str, rings_col: str,
                suffix: str) -> DataFrame:
    """Envelope → tile-range columns → exploded (cell_tx, cell_ty) cover.

    ty of the envelope TOP (ymax) is the smallest ty (XYZ y grows south).
    The tile ranges (_txmin/_tymin) ride along for reference-cell dedup.
    """
    txmin, tymin = TM.lonlat_to_tile(F.col("xmin"), F.col("ymax"), zoom)
    txmax, tymax = TM.lonlat_to_tile(F.col("xmax"), F.col("ymin"), zoom)
    return (
        df.select(
            F.col(id_col).alias(f"id{suffix}"),
            F.col(rings_col).alias(f"rings{suffix}"),
            txmin.alias(f"_txmin{suffix}"),
            tymin.alias(f"_tymin{suffix}"),
            txmax.alias(f"_txmax{suffix}"),
            tymax.alias(f"_tymax{suffix}"),
        )
        .withColumn(
            "cell_tx",
            F.explode(F.sequence(f"_txmin{suffix}", f"_txmax{suffix}")),
        )
        .withColumn(
            "cell_ty",
            F.explode(F.sequence(f"_tymin{suffix}", f"_tymax{suffix}")),
        )
    )


def poly_relate_join(
    a: DataFrame, b: DataFrame, zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id",
    rings_a: str = "rings", rings_b: str = "rings",
) -> DataFrame:
    """All candidate (envelope-overlapping) pairs with the full predicate
    set. Output: (id_a, id_b, intersects, touches, overlaps, contains,
    within, equals); pairs whose envelopes share no cover cell are disjoint
    by construction and not emitted.

    Both inputs need envelope columns (xmin, ymin, xmax, ymax) alongside the
    ring arrays — at scale these are precomputed storage columns so the
    cover math stays whole-stage-codegen column work.
    """
    ca = _with_cover(a, zoom, id_a, rings_a, "_a")
    cb = _with_cover(b, zoom, id_b, rings_b, "_b")
    cand = (
        ca.join(cb, on=["cell_tx", "cell_ty"], how="inner")
        # reference-cell dedup: envelope-intersection's top-left cell only.
        # tile index is monotone in lon (and anti-monotone in lat), so the
        # intersection's txmin = max of the two txmins, same for tymin.
        .filter(
            (F.col("cell_tx") == F.greatest("_txmin_a", "_txmin_b"))
            & (F.col("cell_ty") == F.greatest("_tymin_a", "_tymin_b"))
        )
        .select("id_a", "rings_a", "id_b", "rings_b")
    )

    schema = "id_a long, id_b long, " + ", ".join(
        f"{f} boolean" for f in FLAGS
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ["id_a", "id_b", *FLAGS]}
            for ia, ra, ib, rb in zip(
                pdf["id_a"], pdf["rings_a"], pdf["id_b"], pdf["rings_b"]
            ):
                rel = G.relate_polygons(
                    G.rings_to_numpy(ra), G.rings_to_numpy(rb)
                )
                rows["id_a"].append(ia)
                rows["id_b"].append(ib)
                for f in FLAGS:
                    rows[f].append(rel[f])
            yield pd.DataFrame(rows)

    return cand.mapInPandas(refine, schema)


def poly_de9im_join(
    a: DataFrame, b: DataFrame, zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id",
    rings_a: str = "rings", rings_b: str = "rings",
) -> DataFrame:
    """Full DE-9IM relate join (OGR_G_Relate, ogr/ogrgeometry.cpp:6494):
    same cell-cover candidate plan as ``poly_relate_join`` (equi-join +
    reference-cell dedup, AQE skew-split applies), refined by the exact
    9-cell matrix kernel.  Output: (id_a, id_b, de9im string, intersects)."""
    ca = _with_cover(a, zoom, id_a, rings_a, "_a")
    cb = _with_cover(b, zoom, id_b, rings_b, "_b")
    cand = (
        ca.join(cb, on=["cell_tx", "cell_ty"], how="inner")
        .filter(
            (F.col("cell_tx") == F.greatest("_txmin_a", "_txmin_b"))
            & (F.col("cell_ty") == F.greatest("_tymin_a", "_tymin_b"))
        )
        .select("id_a", "rings_a", "id_b", "rings_b")
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id_a": [], "id_b": [], "de9im": [], "intersects": []}
            for ia, ra, ib, rb in zip(
                pdf["id_a"], pdf["rings_a"], pdf["id_b"], pdf["rings_b"]
            ):
                m = G.de9im_polygons(
                    G.rings_to_numpy(ra), G.rings_to_numpy(rb)
                )
                rows["id_a"].append(ia)
                rows["id_b"].append(ib)
                rows["de9im"].append(m)
                rows["intersects"].append(
                    m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F"
                )
            yield pd.DataFrame(rows)

    return cand.mapInPandas(
        refine, "id_a long, id_b long, de9im string, intersects boolean"
    )


def clip_to_rect(
    df: DataFrame, xmin: float, ymin: float, xmax: float, ymax: float,
    id_col: str = "poly_id", rings_col: str = "rings",
) -> DataFrame:
    """Clip every polygon to an axis-aligned box; rows whose clipped
    geometry is empty are dropped. Output: (id, rings, n_rings, clip_area).
    """
    pre = df.filter(
        (F.col("xmin") <= F.lit(xmax)) & (F.col("xmax") >= F.lit(xmin))
        & (F.col("ymin") <= F.lit(ymax)) & (F.col("ymax") >= F.lit(ymin))
    ).select(F.col(id_col).alias("id"), F.col(rings_col).alias("_rings"))

    schema = (
        "id long, rings array<array<array<double>>>, "
        "n_rings int, clip_area double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rings_out, n_rings, areas = [], [], [], []
            for pid, rings in zip(pdf["id"], pdf["_rings"]):
                clipped = G.clip_rings_rect(
                    G.rings_to_numpy(rings), xmin, ymin, xmax, ymax
                )
                if not clipped:
                    continue
                area = G.rings_area(clipped)
                if area <= 0.0:
                    continue
                ids.append(pid)
                rings_out.append([[list(pt) for pt in r] for r in clipped])
                n_rings.append(len(clipped))
                areas.append(area)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "rings": pd.Series(rings_out, dtype="object"),
                    "n_rings": pd.Series(n_rings, dtype="int32"),
                    "clip_area": pd.Series(areas, dtype="float64"),
                }
            )

    return pre.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Overlay family MVP: layer Intersection / Erase against an axis-rect layer
# (OGRLayer::Intersection ogrlayer.cpp:5386, ::Erase ogrlayer.cpp:7847,
# ::Clip ogrlayer.cpp:7538). The clip geometries are axis-aligned rects
# (the Sutherland–Hodgman fast path); arbitrary-polygon overlays need full
# polygon clipping (non-goal this round, see SURVEY §7).
# ---------------------------------------------------------------------------

def layer_intersection_rect(
    a: DataFrame, b: DataFrame, zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id",
    rings_a: str = "rings",
) -> DataFrame:
    """Pairwise Intersection(A, B) where B's features are axis rects
    (columns xmin/ymin/xmax/ymax): candidate pairs via the cell-cover join,
    exact geometry via S–H clip of A's rings against B's box. Output:
    (id_a, id_b, rings, n_rings, inter_area) — empty intersections dropped.
    """
    ca = _with_cover(a, zoom, id_a, rings_a, "_a")
    cb = _with_cover(
        b.withColumn(
            "_box",
            F.array(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
            ),
        ),
        zoom, id_b, "_box", "_b",
    )
    cand = (
        ca.join(cb, on=["cell_tx", "cell_ty"], how="inner")
        .filter(
            (F.col("cell_tx") == F.greatest("_txmin_a", "_txmin_b"))
            & (F.col("cell_ty") == F.greatest("_tymin_a", "_tymin_b"))
        )
        .select("id_a", "rings_a", "id_b", F.col("rings_b").alias("_box"))
    )
    schema = (
        "id_a long, id_b long, rings array<array<array<double>>>, "
        "n_rings int, inter_area double"
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "id_a": [], "id_b": [], "rings": [],
                "n_rings": [], "inter_area": [],
            }
            for ia, ra, ib, box in zip(
                pdf["id_a"], pdf["rings_a"], pdf["id_b"], pdf["_box"]
            ):
                xmn, ymn, xmx, ymx = (float(v) for v in box)
                clipped = G.clip_rings_rect(
                    G.rings_to_numpy(ra), xmn, ymn, xmx, ymx
                )
                if not clipped:
                    continue
                area = G.rings_area(clipped)
                if area <= 0.0:
                    continue
                rows["id_a"].append(ia)
                rows["id_b"].append(ib)
                rows["rings"].append([r.tolist() for r in clipped])
                rows["n_rings"].append(len(clipped))
                rows["inter_area"].append(area)
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(rows["id_a"], dtype="int64"),
                    "id_b": pd.Series(rows["id_b"], dtype="int64"),
                    "rings": pd.Series(rows["rings"], dtype=object),
                    "n_rings": pd.Series(rows["n_rings"], dtype="int32"),
                    "inter_area": pd.Series(rows["inter_area"], dtype="float64"),
                }
            )

    return cand.mapInPandas(refine, schema)


def layer_erase_area_rect(
    a: DataFrame, b: DataFrame, zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id",
    rings_a: str = "rings",
) -> DataFrame:
    """Erase(A, B) AREA accounting for axis-rect B layers with mutually
    disjoint features (true for the probe fixture's erase subset):
    area(A \\ ∪B) = area(A) − Σ area(A ∩ B_i). Output: (id_a, area,
    erased_area, remaining_area). Geometry output of erase needs general
    polygon difference — documented MVP boundary."""
    inter = layer_intersection_rect(a, b, zoom, id_a, id_b, rings_a)
    cut = inter.groupBy("id_a").agg(
        F.sum("inter_area").alias("erased_area")
    )
    schema_src = a.select(
        F.col(id_a).alias("id_a"), F.col(rings_a).alias("_rings")
    )

    def area_of(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].astype("int64"),
                    "area": [
                        G.rings_area(G.rings_to_numpy(r))
                        for r in pdf["_rings"]
                    ],
                }
            )

    areas = schema_src.mapInPandas(area_of, "id_a long, area double")
    return (
        areas.join(cut, "id_a", "left")
        .withColumn("erased_area", F.coalesce("erased_area", F.lit(0.0)))
        .withColumn("remaining_area", F.col("area") - F.col("erased_area"))
    )


def layer_erase_parts_rect(
    a: DataFrame, b: DataFrame,
    id_a: str = "poly_id", id_b: str = "poly_id", rings_a: str = "rings",
) -> DataFrame:
    """GEOMETRIC Erase(A, B) for an axis-rect B layer with interior-disjoint
    features (OGRLayer::Erase, ogrlayer.cpp:7847): every A feature is erased
    by each envelope-intersecting rect via the 4-slab difference kernel
    (geometry.erase_rings_rect), iterating over the produced parts. B is a
    dimension (collected + broadcast); A streams through one map-only
    mapInPandas stage — no shuffle, linear in A at 100 TB. Output one row
    per surviving A feature: (id_a, remaining_area, n_parts)."""
    spark = a.sparkSession
    rects = sorted(
        (int(r[id_b]), float(r["xmin"]), float(r["ymin"]),
         float(r["xmax"]), float(r["ymax"]))
        for r in b.select(id_b, "xmin", "ymin", "xmax", "ymax").collect()
    )
    bc = spark.sparkContext.broadcast(rects)
    src = a.select(F.col(id_a).alias("id_a"), F.col(rings_a).alias("_rings"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        boxes = bc.value
        for pdf in batches:
            ids, rem, nparts = [], [], []
            for pid, rings in zip(pdf["id_a"], pdf["_rings"]):
                parts = [G.rings_to_numpy(rings)]
                for (_rid, bx0, by0, bx1, by1) in boxes:
                    nxt = []
                    for p in parts:
                        e = G.rings_envelope(p)
                        if (e[2] <= bx0 or e[0] >= bx1
                                or e[3] <= by0 or e[1] >= by1):
                            nxt.append(p)  # no interior overlap: untouched
                        else:
                            nxt.extend(
                                G.erase_rings_rect(p, bx0, by0, bx1, by1)
                            )
                    parts = nxt
                    if not parts:
                        break
                area = float(sum(G.rings_area(p) for p in parts))
                if parts and area > 0.0:
                    ids.append(pid)
                    rem.append(area)
                    nparts.append(len(parts))
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(ids, dtype="int64"),
                    "remaining_area": pd.Series(rem, dtype="float64"),
                    "n_parts": pd.Series(nparts, dtype="int32"),
                }
            )

    return src.mapInPandas(run, "id_a long, remaining_area double, n_parts int")


OVERLAY_OPS = ("union", "symdifference", "identity", "update")


def layer_overlay_rect(
    a: DataFrame, b: DataFrame, op: str, zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id", rings_a: str = "rings",
    eps: float = 1e-9,
) -> DataFrame:
    """Layer-algebra overlay family against an axis-rect method layer B with
    mutually interior-disjoint features — OGRLayer::Union (ogrlayer.cpp:
    5804), ::SymDifference (:6341), ::Identity (:6771), ::Update (:7189).
    GDAL's per-feature driver loop is re-expressed as set algebra over the
    distributed intersection join:

      union          = (A∩B_i pairs) ∪ (A − ∪B) ∪ (B − ∪A)
      symdifference  = (A − ∪B) ∪ (B − ∪A)
      identity       = (A∩B_i pairs) ∪ (A − ∪B)
      update         = (A − ∪B) ∪ B            (B features pass unchanged)

    A-side remainders come from the GEOMETRIC erase kernel (4-slab
    difference parts, layer_erase_parts_rect) — not arithmetic — so an
    interval-math oracle independently cross-checks the kernel. B-side
    remainders use area(B) − Σ area(A∩B_i), exact when A's features are
    interior-disjoint (the coverage contract, documented). Output rows:
    (cls, id_a, id_b, area) with -1 for the absent side's id (sentinel
    instead of NULL so cross-engine hashing stays dtype-stable); rows with
    area <= eps are dropped on BOTH engines (eps guards last-ulp float
    disagreement on fully-covered features, far below any real fixture
    area)."""
    if op not in OVERLAY_OPS:
        raise ValueError(f"op must be one of {OVERLAY_OPS}")
    inter = layer_intersection_rect(a, b, zoom, id_a, id_b, rings_a)
    both = inter.select(
        F.lit("both").alias("cls"), "id_a", "id_b",
        F.col("inter_area").alias("area"),
    )
    a_rem = layer_erase_parts_rect(a, b, id_a, id_b, rings_a)
    a_only = a_rem.filter(F.col("remaining_area") > eps).select(
        F.lit("a_only").alias("cls"), "id_a",
        F.lit(-1).cast("long").alias("id_b"),
        F.col("remaining_area").alias("area"),
    )
    b_areas = b.select(
        F.col(id_b).alias("id_b"),
        ((F.col("xmax") - F.col("xmin"))
         * (F.col("ymax") - F.col("ymin"))).alias("_ba"),
    )
    if op == "update":
        b_side = b_areas.select(
            F.lit("b_update").alias("cls"),
            F.lit(-1).cast("long").alias("id_a"),
            "id_b", F.col("_ba").alias("area"),
        )
    else:
        cut_b = inter.groupBy("id_b").agg(F.sum("inter_area").alias("_cb"))
        b_side = (
            b_areas.join(cut_b, "id_b", "left")
            .withColumn("_rem", F.col("_ba") - F.coalesce("_cb", F.lit(0.0)))
            .filter(F.col("_rem") > eps)
            .select(
                F.lit("b_only").alias("cls"),
                F.lit(-1).cast("long").alias("id_a"),
                "id_b", F.col("_rem").alias("area"),
            )
        )
    if op == "union":
        return both.unionByName(a_only).unionByName(b_side)
    if op == "symdifference":
        return a_only.unionByName(b_side)
    if op == "identity":
        return both.unionByName(a_only)
    return a_only.unionByName(b_side)  # update


def layer_overlay_poly(
    a: DataFrame, b: DataFrame, op: str = "intersection", zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id",
    rings_a: str = "rings", rings_b: str = "rings",
) -> DataFrame:
    """Pairwise boolean overlay against an ARBITRARY polygon method layer
    (concave, holed) — the general form of OGRLayer::Intersection / Clip
    (ogrlayer.cpp:5386, :7538; rect MVP in layer_intersection_rect).

    Same 100 TB plan shape as the rect path: cell-cover candidates via one
    equi-join (reference-cell dedup, no distinct), then the from-scratch
    noding + boundary-selection + trace kernel (spatial/overlay.py) per
    candidate pair inside an Arrow-batched mapInPandas. Output: (id_a,
    id_b, rings, n_parts, n_rings, inter_area) — empty results dropped.
    """
    from gdal_spark.spatial import overlay as OV

    ca = _with_cover(a, zoom, id_a, rings_a, "_a")
    cb = _with_cover(b, zoom, id_b, rings_b, "_b")
    cand = (
        ca.join(cb, on=["cell_tx", "cell_ty"], how="inner")
        .filter(
            (F.col("cell_tx") == F.greatest("_txmin_a", "_txmin_b"))
            & (F.col("cell_ty") == F.greatest("_tymin_a", "_tymin_b"))
        )
        .select("id_a", "rings_a", "id_b", "rings_b")
    )
    schema = (
        "id_a long, id_b long, rings array<array<array<double>>>, "
        "n_parts int, n_rings int, inter_area double"
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "id_a", "id_b", "rings", "n_parts", "n_rings", "inter_area")}
            for ia, ra, ib, rb in zip(
                pdf["id_a"], pdf["rings_a"], pdf["id_b"], pdf["rings_b"]
            ):
                parts = OV.overlay_polygons(
                    G.rings_to_numpy(ra), G.rings_to_numpy(rb), op)
                if not parts:
                    continue
                area = OV.overlay_area(parts)
                if area <= 0.0:
                    continue
                flat = OV.overlay_parts_rings(parts)
                rows["id_a"].append(ia)
                rows["id_b"].append(ib)
                rows["rings"].append([r.tolist() for r in flat])
                rows["n_parts"].append(len(parts))
                rows["n_rings"].append(len(flat))
                rows["inter_area"].append(area)
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(rows["id_a"], dtype="int64"),
                    "id_b": pd.Series(rows["id_b"], dtype="int64"),
                    "rings": pd.Series(rows["rings"], dtype=object),
                    "n_parts": pd.Series(rows["n_parts"], dtype="int32"),
                    "n_rings": pd.Series(rows["n_rings"], dtype="int32"),
                    "inter_area": pd.Series(
                        rows["inter_area"], dtype="float64"),
                }
            )

    return cand.mapInPandas(refine, schema)


def layer_erase_area_poly(
    a: DataFrame, b: DataFrame, zoom: int = 5,
    id_a: str = "poly_id", id_b: str = "poly_id",
    rings_a: str = "rings", rings_b: str = "rings",
) -> DataFrame:
    """Erase(A, B) AREA accounting against an arbitrary polygon method
    layer with mutually disjoint features: area(A \\ ∪B) = area(A) −
    Σ area(A ∩ B_i), each pairwise intersection computed by the general
    overlay kernel. Output: (id_a, area, erased_area, remaining_area)."""
    inter = layer_overlay_poly(
        a, b, "intersection", zoom, id_a, id_b, rings_a, rings_b)
    cut = inter.groupBy("id_a").agg(
        F.sum("inter_area").alias("erased_area"))
    src = a.select(F.col(id_a).alias("id_a"), F.col(rings_a).alias("_rings"))

    def area_of(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].astype("int64"),
                    "area": [
                        G.rings_area(G.rings_to_numpy(r))
                        for r in pdf["_rings"]
                    ],
                }
            )

    areas = src.mapInPandas(area_of, "id_a long, area double")
    return (
        areas.join(cut, "id_a", "left")
        .withColumn("erased_area", F.coalesce("erased_area", F.lit(0.0)))
        .withColumn("remaining_area", F.col("area") - F.col("erased_area"))
    )
