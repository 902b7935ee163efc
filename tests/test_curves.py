"""Curve WKB codec + arc linearization (ogr_geometry.h:1496-2461,
OGRGeometryFactory::curveToLineString semantics)."""

import math

import numpy as np
import pytest

from gdal_spark.spatial import curves as CV


def test_parse_roundtrip_circularstring():
    pts = [(10, 0), (0, 10), (-10, 0)]
    tree, end = CV.parse_curve_wkb(CV.wkb_circularstring(pts))
    assert tree[0] == "circ"
    assert np.allclose(tree[1], pts)
    assert end == 5 + 4 + 16 * 3


def test_arc_passes_through_mid_and_endpoints_exact():
    pts = CV.linearize_arc3((10, 0), (0, 10), (-10, 0), step_deg=4.0)
    assert pts.shape[0] == 46
    assert (pts[0] == (10, 0)).all() and (pts[-1] == (-10, 0)).all()
    # every vertex on the circle r=10
    assert np.allclose(np.hypot(pts[:, 0], pts[:, 1]), 10.0)
    # passes through the upper half (through (0, 10)), not the lower
    assert pts[:, 1].min() >= -1e-9


def test_arc_clockwise_when_mid_is_below():
    pts = CV.linearize_arc3((10, 0), (0, -10), (-10, 0), step_deg=4.0)
    assert pts[:, 1].max() <= 1e-9  # sweeps through the LOWER half


def test_collinear_triple_degenerates_to_segment():
    pts = CV.linearize_arc3((0, 0), (1, 1), (2, 2))
    assert pts.shape == (2, 2)
    assert (pts == np.array([[0, 0], [2, 2]])).all()


def test_multi_arc_circularstring_shares_joints():
    # 5-point full circle: two half arcs, joint vertex appears once
    tree, _ = CV.parse_curve_wkb(
        CV.wkb_circularstring([(8, 0), (0, 8), (-8, 0), (0, -8), (8, 0)])
    )
    lin = CV.linearize(tree, 4.0)
    assert lin.shape[0] == 91
    assert np.allclose(np.hypot(lin[:, 0], lin[:, 1]), 8.0)
    # closed: first == last
    assert (lin[0] == lin[-1]).all()


def test_compound_curve_concatenates():
    cc = CV.wkb_compoundcurve([
        CV.wkb_linestring([(0, 0), (10, 0)]),
        CV.wkb_circularstring([(10, 0), (15, 5), (20, 0)]),
    ])
    kind, lin = CV.curve_to_line_wkb(cc)
    assert kind == "line"
    assert lin.shape[0] == 47
    assert (lin[0] == (0, 0)).all() and (lin[-1] == (20, 0)).all()
    want = 10.0 + 45 * 2 * 5 * math.sin(math.pi / 90)
    assert CV.line_length(lin) == pytest.approx(want)


def test_curvepolygon_rings():
    cp = CV.wkb_curvepolygon([
        CV.wkb_circularstring([(9, 2), (1, 10), (-7, 2), (1, -6), (9, 2)])
    ])
    kind, rings = CV.curve_to_line_wkb(cp)
    assert kind == "polygon" and len(rings) == 1
    # inscribed 90-gon area
    assert abs(
        0.5 * abs(
            np.sum(
                rings[0][:-1, 0] * rings[0][1:, 1]
                - rings[0][1:, 0] * rings[0][:-1, 1]
            )
        ) - 45.0 * 64.0 * math.sin(math.pi / 45.0)
    ) < 1e-9


def test_even_point_count_rejected():
    with pytest.raises(ValueError, match="odd point count"):
        CV.linearize(("circ", np.zeros((4, 2))), 4.0)


def test_big_endian_rejected():
    import struct

    blob = struct.pack(">BI", 0, CV.WKB_CIRCULARSTRING)
    with pytest.raises(ValueError, match="little-endian"):
        CV.parse_curve_wkb(blob)
