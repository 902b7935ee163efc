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

from pyspark.sql import Column
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
