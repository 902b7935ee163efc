"""PIP kernel parity tests — boundary cases per FIXTURES.md §3, transcribed
from the reference's own oracle style (autotest/ogr/ogr_geom.py:2430-2475:
Contains/Within of points 1e-4 inside/outside; :4049: Contains of a point on
the boundary is FALSE)."""

import numpy as np
import pytest

from gdal_spark.spatial import geometry as G

SQUARE = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])]
# Square with a hole [4,6]^2 (hole ring CW = reversed)
HOLED = [
    SQUARE[0],
    np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0], [4.0, 4.0]]),
]
CONCAVE_L = [
    np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [5.0, 5.0], [5.0, 10.0],
         [0.0, 10.0], [0.0, 0.0]]
    )
]


def pip(x, y, rings, **kw):
    return bool(
        G.points_in_polygon(np.array([x]), np.array([y]), rings, **kw)[0]
    )


def boundary(x, y, ring):
    return bool(G.points_on_ring_boundary(np.array([x]), np.array([y]), ring)[0])


def test_point_just_inside_and_outside_edge():
    # ogr_geom.py tolerance-style cases at 1e-4
    assert pip(5.0, 0.0001, SQUARE) is True
    assert pip(5.0, -0.0001, SQUARE) is False
    assert pip(0.0001, 5.0, SQUARE) is True
    assert pip(-0.0001, 5.0, SQUARE) is False


def test_point_on_vertex_is_boundary_not_within():
    # Contains(point-on-boundary) == 0 (ogr_geom.py:4049)
    assert boundary(0.0, 0.0, SQUARE[0]) is True
    assert pip(0.0, 0.0, SQUARE) is False
    # But Intersects semantics include the boundary
    assert pip(0.0, 0.0, SQUARE, boundary_is_inside=True) is True


def test_point_on_edge_midpoint():
    assert boundary(5.0, 0.0, SQUARE[0]) is True
    assert pip(5.0, 0.0, SQUARE) is False
    assert pip(5.0, 10.0, SQUARE) is False


def test_point_inside_hole_is_outside():
    assert pip(5.0, 5.0, HOLED) is False
    assert pip(2.0, 2.0, HOLED) is True
    # on the hole boundary: part of polygon boundary → not contained
    assert pip(4.0, 5.0, HOLED) is False
    assert pip(4.0, 5.0, HOLED, boundary_is_inside=True) is True


def test_concave_polygon():
    assert pip(2.0, 8.0, CONCAVE_L) is True      # in the L's vertical arm
    assert pip(8.0, 2.0, CONCAVE_L) is True      # in the horizontal arm
    assert pip(8.0, 8.0, CONCAVE_L) is False     # in the notch
    assert pip(5.0001, 5.0001, CONCAVE_L) is False
    assert pip(4.9999, 5.0001, CONCAVE_L) is True


def test_horizontal_edge_ray_parity():
    # Polygon with a horizontal edge aligned with the test ray — the strict
    # (y1>0&&y2<=0)||(y2>0&&y1<=0) rule must not double count.
    poly = [
        np.array(
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [8.0, 4.0], [8.0, 8.0],
             [0.0, 8.0], [0.0, 0.0]]
        )
    ]
    assert pip(1.0, 4.0, poly) is True   # ray passes through horizontal edge y=4
    assert pip(-1.0, 4.0, poly) is False


def test_ring_start_vertex_probe():
    # probe == ring start/end vertex
    assert boundary(0.0, 0.0, CONCAVE_L[0]) is True
    assert pip(0.0, 0.0, CONCAVE_L) is False


def test_degenerate_ring_too_few_points():
    tri_open = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])  # 3 pts < 4
    assert not G.points_in_ring(np.array([0.3]), np.array([0.3]), tri_open)[0]


def test_great_circle_reference_formula():
    # Equator quarter-circumference: 90° of longitude at lat 0.
    d = G.great_circle_distance(
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([90.0])
    )[0]
    assert d == pytest.approx(np.pi / 2 * G.EARTH_RADIUS, rel=1e-12)
    # identical points → exactly 0 via the acos clamp
    d0 = G.great_circle_distance(
        np.array([48.85]), np.array([2.35]), np.array([48.85]), np.array([2.35])
    )[0]
    assert d0 == 0.0
    # antipodal clamp never NaNs
    dpi = G.great_circle_distance(
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([180.0])
    )[0]
    assert dpi == pytest.approx(np.pi * G.EARTH_RADIUS, rel=1e-12)


def test_wkb_roundtrip():
    kind, rings = G.parse_wkb(G.wkb_polygon(HOLED))
    assert kind == "polygon"
    assert len(rings) == 2
    np.testing.assert_array_equal(rings[0], HOLED[0])
    kind, (x, y) = G.parse_wkb(G.wkb_point(2.35, 48.85))
    assert kind == "point" and (x, y) == (2.35, 48.85)
    kind, polys = G.parse_wkb(G.wkb_multipolygon([SQUARE, CONCAVE_L]))
    assert kind == "multipolygon" and len(polys) == 2


def test_wkt_roundtrip_polygon():
    import numpy as np

    from gdal_spark.spatial import geometry as G

    rings = [
        np.array([[0.5, 1.25], [10.0, 0.0], [10.0, 10.0], [0.5, 1.25]]),
        np.array([[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 2.0]]),
    ]
    wkt = G.wkt_polygon(rings)
    kind, back = G.parse_wkt(wkt)
    assert kind == "polygon"
    assert len(back) == 2
    for a, b in zip(rings, back):
        assert (a == b).all()


def test_wkt_point_roundtrip():
    from gdal_spark.spatial import geometry as G

    wkt = G.wkt_point(-73.5, 45.25)
    kind, (x, y) = G.parse_wkt(wkt)
    assert kind == "point" and x == -73.5 and y == 45.25


def test_winding_agrees_with_crossing_on_simple_rings():
    """Property test: winding-number and crossing-number kernels agree on
    every simple fixture polygon for a dense probe grid."""
    from gdal_spark.data.pages import polygon_records

    rng = np.random.default_rng(11)
    for rec in polygon_records()[60:75]:
        rings = G.rings_to_numpy(rec["rings"])
        xmin, ymin, xmax, ymax = G.rings_envelope(rings)
        px = rng.uniform(xmin - 1, xmax + 1, 4000)
        py = rng.uniform(ymin - 1, ymax + 1, 4000)
        a = G.points_in_polygon(px, py, rings)
        b = G.points_in_polygon_winding(px, py, rings)
        assert (a == b).all()


def test_winding_handles_self_overlapping_ring():
    """A ring that traces the same square TWICE: winding number 2 inside
    (winding test: inside), crossing parity even (crossing test: outside) —
    the case the fallback exists for."""
    sq = [[0, 0], [4, 0], [4, 4], [0, 4]]
    outer = np.array(sq + sq + [sq[0]], dtype=np.float64)
    px = np.array([2.0, 10.0])
    py = np.array([2.0, 2.0])
    cross = G.points_in_ring(px, py, outer)
    wind = G.points_in_ring_winding(px, py, outer)
    assert wind[0]  # winding: inside (wn=2)
    assert not cross[0]  # even-odd parity calls it outside
    assert not wind[1] and not cross[1]  # far point: both outside


def test_make_valid_splits_bowtie():
    import numpy as np

    from gdal_spark.spatial import geometry as G

    bowtie = [np.array([[0.0, 0], [4, 4], [4, 0], [0, 4], [0, 0]])]
    parts = G.make_valid(bowtie)
    assert len(parts) == 2
    areas = sorted(G.rings_area(p) for p in parts)
    assert areas == pytest.approx([4.0, 4.0])
    # every part is a simple CCW ring
    for p in parts:
        ring = p[0]
        assert len({tuple(v) for v in ring[:-1]}) == ring.shape[0] - 1


def test_make_valid_passthrough_valid_polygon():
    import numpy as np

    from gdal_spark.spatial import geometry as G

    holed = [
        np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]),
        np.array([[3.0, 3], [3, 5], [5, 5], [5, 3], [3, 3]]),
    ]
    parts = G.make_valid(holed)
    assert len(parts) == 1 and len(parts[0]) == 2
    assert G.rings_area(parts[0]) == pytest.approx(96.0)


def test_node_ring_self_inserts_crossing():
    import numpy as np

    from gdal_spark.spatial import geometry as G

    noded = G._node_ring_self(
        np.array([[0.0, 0], [4, 4], [4, 0], [0, 4], [0, 0]])
    )
    assert [2.0, 2.0] in noded.tolist()
    # crossing inserted on BOTH segments -> appears exactly twice
    assert sum(1 for v in noded.tolist() if v == [2.0, 2.0]) == 2


def test_point_on_surface_is_strictly_interior():
    """The widest-bisector-interval midpoint must land strictly inside its
    polygon (even-odd across holes) — the PointOnSurface contract."""
    import numpy as np

    from gdal_spark.data.pages import polygon_records
    from gdal_spark.spatial import geometry as G

    for rec in polygon_records():
        ys0 = (rec["ymin"] + rec["ymax"]) / 2.0
        rings = [np.asarray(r, dtype=np.float64) for r in rec["rings"]]
        allv = np.concatenate([r[:, 1] for r in rings])
        ys = ys0 + (1e-4 * (rec["ymax"] - rec["ymin"]) if np.any(allv == ys0) else 0.0)
        xs = []
        for ring in rings:
            for i in range(1, ring.shape[0]):
                (px, py), (cx, cy) = ring[i - 1], ring[i]
                if (py > ys) != (cy > ys):
                    xs.append(px + (ys - py) * (cx - px) / (cy - py))
        xs = sorted(xs)
        assert len(xs) % 2 == 0 and xs, rec["poly_id"]
        widths = [(xs[i + 1] - xs[i], xs[i]) for i in range(0, len(xs), 2)]
        wbest, x0 = max(widths, key=lambda t: (t[0], -t[1]))
        posx = x0 + wbest / 2.0
        inside = G.points_in_ring(
            np.array([posx]), np.array([ys]), rings[0]
        )
        for hole in rings[1:]:
            inside = inside & ~G.points_in_ring(
                np.array([posx]), np.array([ys]), hole
            )
        assert bool(inside[0]), rec["poly_id"]


# ---------------------------------------------------------------------------
# DE-9IM matrix kernel (OGR_G_Relate, ogrgeometry.cpp:6494)
# ---------------------------------------------------------------------------

def _rectangle(x0, y0, x1, y1):
    return [np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )]


DE9IM_CASES = [
    ("equal", _rectangle(0, 0, 2, 2), _rectangle(0, 0, 2, 2), "2FFF1FFF2"),
    ("disjoint", _rectangle(0, 0, 1, 1), _rectangle(5, 5, 6, 6), "FF2FF1212"),
    ("within", _rectangle(1, 1, 2, 2), _rectangle(0, 0, 3, 3), "2FF1FF212"),
    ("contains", _rectangle(0, 0, 3, 3), _rectangle(1, 1, 2, 2), "212FF1FF2"),
    ("edge touch", _rectangle(0, 0, 1, 1), _rectangle(1, 0, 2, 1),
     "FF2F11212"),
    ("corner touch", _rectangle(0, 0, 1, 1), _rectangle(1, 1, 2, 2),
     "FF2F01212"),
    ("overlap", _rectangle(0, 0, 2, 2), _rectangle(1, 1, 3, 3), "212101212"),
    ("within glued", _rectangle(0, 0, 1, 1), _rectangle(0, 0, 2, 2),
     "2FF11F212"),
    ("contains glued", _rectangle(0, 0, 2, 2), _rectangle(0, 0, 1, 1),
     "212F11FF2"),
    ("overlap shared edge", _rectangle(0, 0, 2, 1), _rectangle(1, 0, 3, 1),
     "212111212"),
]


def test_de9im_canonical_rect_cases():
    for name, a, b, want in DE9IM_CASES:
        got = G.de9im_polygons(a, b)
        assert got == want, f"{name}: {got} != {want}"


def test_de9im_hole_cases():
    outer = _rectangle(0, 0, 10, 10)[0]
    hole = _rectangle(3, 3, 7, 7)[0][::-1].copy()
    donut = [outer, hole]
    # B strictly inside the hole: disjoint.
    assert G.de9im_polygons(donut, _rectangle(4, 4, 6, 6)) == "FF2FF1212"
    # B exactly fills the hole: interiors miss, boundaries share the ring.
    assert G.de9im_polygons(donut, _rectangle(3, 3, 7, 7)) == "FF2F112F2"
    # A is the filled rect, B the donut: the hole interior is int(A)∩ext(B)
    # (IE='2' via the fills-a-hole guard) and the hole ring is ∂B in int(A).
    assert G.de9im_polygons(_rectangle(0, 0, 10, 10), donut) == "212F1FFF2"
    # Mirror orientation.
    assert G.de9im_polygons(donut, _rectangle(0, 0, 10, 10)) == "2FF11F2F2"


def test_de9im_consistent_with_named_predicates():
    for _, a, b, _ in DE9IM_CASES:
        m = G.de9im_polygons(a, b)
        rel = G.relate_polygons(a, b)
        assert rel["intersects"] == (
            m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F"
        )
        assert rel["equals"] == (m == "2FFF1FFF2")
        assert rel["touches"] == (
            m[0] == "F" and (m[1] != "F" or m[3] != "F" or m[4] != "F")
        )


# ---------------------------------------------------------------------------
# Line ↔ polygon predicates + Liang–Barsky clip
# ---------------------------------------------------------------------------

def _line(*pts):
    return np.asarray(pts, dtype=np.float64)


def test_relate_line_polygon_cases():
    sq = _rectangle(0, 0, 10, 10)
    cases = [
        ("through", _line((-2, 5), (12, 5)),
         dict(intersects=True, crosses=True, touches=False, within=False)),
        ("inside", _line((2, 2), (8, 8)),
         dict(intersects=True, crosses=False, touches=False, within=True)),
        ("outside", _line((-5, -5), (-1, -2)),
         dict(intersects=False, crosses=False, touches=False, within=False)),
        ("endpoint on edge", _line((10, 5), (15, 7)),
         dict(intersects=True, crosses=False, touches=True, within=False)),
        ("along edge", _line((2, 0), (8, 0)),
         dict(intersects=True, crosses=False, touches=True, within=False)),
        ("corner graze", _line((-2, 12), (12, -2)),  # passes through (5,5)?
         dict(intersects=True, crosses=True, touches=False, within=False)),
        ("in-and-out dip", _line((-2, 5), (5, 5), (5, 12)),
         dict(intersects=True, crosses=True, touches=False, within=False)),
        ("boundary then inside", _line((0, 2), (0, 8), (4, 5)),
         dict(intersects=True, crosses=False, touches=False, within=True)),
    ]
    for name, coords, want in cases:
        got = G.relate_line_polygon(coords, sq)
        assert got == want, f"{name}: {got} != {want}"


def test_relate_line_polygon_hole():
    outer = _rectangle(0, 0, 10, 10)[0]
    hole = _rectangle(3, 3, 7, 7)[0][::-1].copy()
    donut = [outer, hole]
    # line inside the hole: disjoint from the donut
    got = G.relate_line_polygon(_line((4, 4), (6, 6)), donut)
    assert got == dict(
        intersects=False, crosses=False, touches=False, within=False
    )
    # line crossing from the ring interior through the hole: crosses
    got = G.relate_line_polygon(_line((1, 5), (5, 5)), donut)
    assert got == dict(
        intersects=True, crosses=True, touches=False, within=False
    )


def test_clip_segment_rect_degenerate_axes():
    # horizontal segment BELOW the window: the degenerate-y interval must
    # stay empty (regression: min/max re-ordering made it unbounded)
    x1 = np.array([-1.0]); y1 = np.array([40.0])
    x2 = np.array([5.0]); y2 = np.array([40.0])
    *_, keep = G.clip_segment_rect(x1, y1, x2, y2, 0.0, 43.0, 10.0, 50.0)
    assert not keep[0]
    # same segment level with the window: kept, clipped to [0, 5]
    cx1, cy1, cx2, cy2, keep = G.clip_segment_rect(
        x1, np.array([45.0]), x2, np.array([45.0]), 0.0, 43.0, 10.0, 50.0
    )
    assert keep[0] and cx1[0] == 0.0 and cx2[0] == 5.0
    # fully inside: untouched endpoints
    cx1, cy1, cx2, cy2, keep = G.clip_segment_rect(
        np.array([1.0]), np.array([44.0]), np.array([2.0]),
        np.array([45.0]), 0.0, 43.0, 10.0, 50.0
    )
    assert keep[0] and cx1[0] == 1.0 and cx2[0] == 2.0 and cy2[0] == 45.0


# ---------------------------------------------------------------------------
# Z/3D WKB (ISO +1000 block and legacy wkb25DBit) + Distance3D kernels
# ---------------------------------------------------------------------------

def test_wkb_point_z_roundtrip():
    import struct

    from gdal_spark.spatial import geometry as G

    buf = G.wkb_point_z(1.5, -2.25, 7.125)
    kind, xyz = G.parse_wkb(buf)
    assert kind == "point_z" and xyz == (1.5, -2.25, 7.125)
    # legacy 2.5D flag (wkb25DBit | wkbPoint) parses identically
    legacy = struct.pack("<BIddd", 1, 0x80000001, 1.5, -2.25, 7.125)
    kind2, xyz2 = G.parse_wkb(legacy)
    assert kind2 == "point_z" and xyz2 == xyz


def test_wkb_linestring_z_roundtrip():
    import numpy as np

    from gdal_spark.spatial import geometry as G

    coords = np.array([[0.0, 1.0, 2.0], [3.5, -1.25, 0.5], [2.0, 2.0, 2.0]])
    kind, out = G.parse_wkb(G.wkb_linestring_z(coords))
    assert kind == "linestring_z"
    assert (out == coords).all()


def test_distance3d_point_segment():
    import math

    import numpy as np

    from gdal_spark.spatial import geometry as G

    line = np.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    pts = np.array([[5.0, 3.0, 4.0], [-2.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    d = np.sqrt(G.point_line_min_d2_3d(pts, line))
    assert math.isclose(d[0], 5.0, abs_tol=1e-12)   # 3-4-5 off the middle
    assert math.isclose(d[1], 2.0, abs_tol=1e-12)   # beyond the endpoint
    assert d[2] == 0.0                               # on the segment
    assert G.distance3d_point_point((0, 0, 0), (2, 3, 6)) == 7.0
