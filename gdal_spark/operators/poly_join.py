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
