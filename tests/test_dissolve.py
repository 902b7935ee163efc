"""True dissolve: edge-cancellation union tracer vs hand-countable shapes
(apps/gdalalg_vector_dissolve.cpp semantics — merged geometry, not
envelopes)."""

import numpy as np
import pytest

from gdal_spark.operators.dissolve import (
    _ring_signed_area,
    dissolve_union,
    union_coverage_rings,
)


def rect(x0, y0, x1, y1):
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]


def test_union_merges_adjacent_cells():
    rings = union_coverage_rings([rect(0, 0, 1, 1), rect(1, 0, 2, 1)])
    assert len(rings) == 1
    assert sum(_ring_signed_area(r) for r in rings) == pytest.approx(2.0)


def test_union_corner_touch_splits_parts():
    rings = union_coverage_rings([rect(0, 0, 1, 1), rect(1, 1, 2, 2)])
    areas = [_ring_signed_area(r) for r in rings]
    assert sorted(areas) == pytest.approx([1.0, 1.0])


def test_union_ring_of_cells_has_hole():
    cells = [rect(i, j, i + 1, j + 1)
             for i in range(3) for j in range(3) if (i, j) != (1, 1)]
    rings = union_coverage_rings(cells)
    areas = sorted(_ring_signed_area(r) for r in rings)
    assert areas == pytest.approx([-1.0, 9.0])  # CW hole + CCW outer


def test_union_polygon_with_existing_hole_passthrough():
    holey = [
        np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64),
        np.array([[1, 1], [1, 3], [3, 3], [3, 1], [1, 1]], dtype=np.float64),
    ]
    rings = union_coverage_rings([holey])
    areas = sorted(_ring_signed_area(r) for r in rings)
    assert areas == pytest.approx([-4.0, 16.0])


def test_dissolve_union_dataframe(spark):
    from gdal_spark.data.pages import polygons_df
    from pyspark.sql import functions as F

    p = polygons_df(spark).filter(F.col("poly_id") < 64)
    out = {r["eas_id"]: r for r in dissolve_union(p, key="eas_id").collect()}
    # every mosaic cell is 2.0 x 1.5 = 3.0; union area = 3 * n_src exactly
    # (cells never overlap)
    for eas, r in out.items():
        assert r["union_area"] == pytest.approx(3.0 * r["n_src"], abs=1e-9)
        assert 1 <= r["n_parts"] <= r["n_src"]
        assert r["n_rings"] >= r["n_parts"]


def test_union_diagonal_holes_stay_simple():
    """Regression (round-2 code review): two holes touching at a corner
    must yield two SIMPLE hole rings, not a self-intersecting figure-eight
    (the leftmost-turn walk is pinch-split at repeated vertices)."""
    cells = [rect(i, j, i + 1, j + 1) for i in range(4) for j in range(4)
             if (i, j) not in [(1, 1), (2, 2)]]
    rings = union_coverage_rings(cells)
    areas = sorted(round(_ring_signed_area(r), 6) for r in rings)
    assert areas == [-1.0, -1.0, 16.0]
    for r in rings:
        pts = [tuple(p) for p in r[:-1]]
        assert len(pts) == len(set(pts))  # simple: no repeated vertex


def test_node_coverage_splits_t_junction_edges():
    """A vertex of one polygon on the interior of another's edge must split
    that edge into matching sub-edges."""
    import numpy as np

    from gdal_spark.operators.dissolve import node_coverage_rings

    wide = [np.array([[0.0, 2], [4, 2], [4, 4], [0, 4], [0, 2]])]
    left = [np.array([[0.0, 0], [2, 0], [2, 2], [0, 2], [0, 0]])]
    noded = node_coverage_rings([wide, left])
    # wide's bottom edge (0,2)->(4,2) gains the vertex (2,2)
    assert [tuple(p) for p in noded[0][0]][:3] == [
        (0.0, 2.0), (2.0, 2.0), (4.0, 2.0)
    ]


def test_node_coverage_snap_rounding():
    import numpy as np

    from gdal_spark.operators.dissolve import node_coverage_rings

    a = [np.array([[0.0, 0.0], [1.0000004, 0.0], [1.0000004, 1.0],
                   [0.0, 1.0], [0.0, 0.0]])]
    b = [np.array([[0.9999996, 0.0], [2.0, 0.0], [2.0, 1.0],
                   [0.9999996, 1.0], [0.9999996, 0.0]])]
    noded = node_coverage_rings([a, b], snap=1e-6)
    # both shared-edge x coordinates snap to the same 1e-6 grid value
    xs = {round(p[0], 7) for ring in noded for arr in [ring[0]] for p in arr}
    assert 1.0 in xs and 1.0000004 not in xs and 0.9999996 not in xs


def test_dissolve_union_noded_t_fixture(spark):
    """The T-junction fixture dissolves to the hand-known topology only
    with node=True; the raw edge-cancellation output has fragmented rings
    (documented limitation of the un-noded kernel)."""
    from gdal_spark.data.pages import tjunction_df
    from gdal_spark.operators.dissolve import dissolve_union

    want = {501: (16.0, 1, 1), 502: (7.0, 1, 1), 503: (8.0, 1, 2)}
    got = {
        r["eas_id"]: (r["union_area"], r["n_parts"], r["n_rings"])
        for r in dissolve_union(tjunction_df(spark), node=True).collect()
    }
    assert got == want
    raw = {
        r["eas_id"]: r["n_rings"]
        for r in dissolve_union(tjunction_df(spark)).collect()
    }
    assert any(raw[k] != want[k][2] for k in want)
