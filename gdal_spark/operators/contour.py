"""Contour extraction — marching squares (alg/contour.cpp / gdal_contour
analog) as pure column math over a closed-form surface.

One iso-level: each pixel cell classifies its 4 corners against the level
(case id 0–15), crossed edges get linear-interpolated crossing points, the
standard case table yields 0–2 segments per cell; saddle cases (5, 10)
disambiguate by the cell-center mean (the same rule the reference's contour
generator applies). Everything is generated from ONE python case table into
both a Spark Column expression and the DuckDB oracle SQL, so the formulas
are identical by construction — the engine parity pattern used by the tile
math and resampling kernels.

4-connectivity convention: corner bits b0=z(x,y), b1=z(x+1,y),
b2=z(x+1,y+1), b3=z(x,y+1); edges 0=bottom, 1=right, 2=top, 3=left.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# case id -> list of (edge_a, edge_b) segments; saddles handled separately
CASE_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    1: [(3, 0)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
    6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)], 9: [(0, 2)],
    11: [(1, 2)], 12: [(3, 1)], 13: [(0, 1)], 14: [(3, 0)],
}
SADDLE_HIGH = {5: [(0, 1), (2, 3)], 10: [(3, 0), (1, 2)]}
SADDLE_LOW = {5: [(3, 0), (1, 2)], 10: [(0, 1), (2, 3)]}


def _edge_point_exprs(level: float):
    """Edge index -> (x_expr, y_expr) as SQL strings over z00..z11, x, y."""
    L = repr(float(level))

    def t(za, zb):
        return f"(({L} - {za}) / ({zb} - {za}))"

    return {
        0: (f"(x + {t('z00', 'z10')})", "(y + 0.0)"),
        1: ("(x + 1.0)", f"(y + {t('z10', 'z11')})"),
        2: (f"(x + {t('z01', 'z11')})", "(y + 1.0)"),
        3: ("(x + 0.0)", f"(y + {t('z00', 'z01')})"),
    }


def _seg_len_sql(segs: list[tuple[int, int]], level: float) -> str:
    pts = _edge_point_exprs(level)
    terms = []
    for ea, eb in segs:
        ax, ay = pts[ea]
        bx, by = pts[eb]
        terms.append(
            f"sqrt(({ax} - {bx}) * ({ax} - {bx}) + ({ay} - {by}) * ({ay} - {by}))"
        )
    return "(" + " + ".join(terms) + ")"


def sql_case_and_length(level: float) -> tuple[str, str]:
    """(case_expr, length_expr) SQL over columns x, y, z00, z10, z11, z01."""
    L = repr(float(level))
    case = (
        f"((CASE WHEN z00 >= {L} THEN 1 ELSE 0 END) + "
        f"(CASE WHEN z10 >= {L} THEN 2 ELSE 0 END) + "
        f"(CASE WHEN z11 >= {L} THEN 4 ELSE 0 END) + "
        f"(CASE WHEN z01 >= {L} THEN 8 ELSE 0 END))"
    )
    center_high = f"((z00 + z10 + z01 + z11) / 4.0 >= {L})"
    branches = []
    for cid, segs in CASE_SEGMENTS.items():
        branches.append(f"WHEN {case} = {cid} THEN {_seg_len_sql(segs, level)}")
    for cid in (5, 10):
        branches.append(
            f"WHEN {case} = {cid} AND {center_high} "
            f"THEN {_seg_len_sql(SADDLE_HIGH[cid], level)}"
        )
        branches.append(
            f"WHEN {case} = {cid} THEN {_seg_len_sql(SADDLE_LOW[cid], level)}"
        )
    length = "(CASE " + " ".join(branches) + " ELSE 0.0 END)"
    return case, length


def case_and_length_cols(level: float) -> tuple[Column, Column]:
    """Spark twins of sql_case_and_length — built by feeding the SAME SQL
    fragments through F.expr (identical formula text, identical semantics)."""
    case_sql, len_sql = sql_case_and_length(level)
    return F.expr(case_sql), F.expr(len_sql)


# ---------------------------------------------------------------------------
# Contour POLYGONS (`gdal_contour -p` / FIXED_LEVELS polygon output,
# apps/gdal_contour_bin.cpp + alg/contour/): between consecutive levels the
# band's geometry inside each pixel cell is the unit square clipped by the
# two level half-planes of the (linearly interpolated) field — the same
# linear-interpolation contract the reference's contour writer uses.  This
# implementation takes the field as an explicit plane (a·x + b·y), the
# regime where the construction is EXACT (and hence oracle-checkable); the
# general corner-value variant shares the same half-plane clip kernel.
#
# Scale: map-only over the cell DataFrame — each cell emits its band
# pieces independently; per-band dissolve (if contiguous polygons are
# wanted) is the existing dissolve/polygonize machinery downstream.
# ---------------------------------------------------------------------------

def band_polygons_linear(
    cells: DataFrame,
    a: float,
    b: float,
    levels: list[float],
    cx_col: str = "cx",
    cy_col: str = "cy",
) -> DataFrame:
    """Per (cell, band) the clipped band polygon's area in integer
    micro-units (zero-area pieces dropped): (cx, cy, band_idx, area_micro).
    band_idx = k covers levels[k] <= a·x + b·y < levels[k+1]."""
    from gdal_spark.spatial.geometry import clip_ring_halfplane, rings_area

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"cx": [], "cy": [], "band_idx": [], "area_micro": []}
            for cx, cy in zip(pdf[cx_col], pdf[cy_col]):
                x0, y0 = float(cx), float(cy)
                square = np.array([
                    [x0, y0], [x0 + 1.0, y0], [x0 + 1.0, y0 + 1.0],
                    [x0, y0 + 1.0], [x0, y0],
                ])
                for k in range(len(levels) - 1):
                    l0, l1 = levels[k], levels[k + 1]
                    piece = clip_ring_halfplane(square, a, b, l1)
                    if piece.shape[0]:
                        piece = clip_ring_halfplane(piece, -a, -b, -l0)
                    if not piece.shape[0]:
                        continue
                    am = int(np.floor(rings_area([piece]) * 1e6 + 0.5))
                    if am > 0:
                        out["cx"].append(int(cx))
                        out["cy"].append(int(cy))
                        out["band_idx"].append(k)
                        out["area_micro"].append(am)
            yield pd.DataFrame(out)

    return cells.mapInPandas(
        run, "cx long, cy long, band_idx long, area_micro long"
    )
