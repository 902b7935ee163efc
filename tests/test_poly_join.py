"""Polygon↔polygon predicates + rectangle clip: kernel truth tables
(transcribed from the case families of autotest/ogr/ogr_geom.py:2430-2475
— Intersects/Touches/Overlaps/Contains/Within/Equals between polygons,
including holes and non-convex shapes) and the distributed join plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.data.pages import polygons_b_df, polygons_df
from gdal_spark.operators import poly_join as PJ
from gdal_spark.spatial import geometry as G


def rect(x0, y0, x1, y1):
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]


def tri(a, b, c):
    return [np.array([a, b, c, a], dtype=np.float64)]


HEX = [
    np.stack(
        [
            20.0 + 3.0 * np.cos(np.linspace(0, 2 * np.pi, 7)),
            20.0 + 3.0 * np.sin(np.linspace(0, 2 * np.pi, 7)),
        ],
        axis=1,
    )
]
HOLEY = [
    np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], dtype=np.float64),
    np.array([[2, 2], [2, 6], [6, 6], [6, 2], [2, 2]], dtype=np.float64),
]


CASES = [
    # (name, A, B, expected-true flags)
    ("equal", rect(0, 0, 4, 4), rect(0, 0, 4, 4),
     {"intersects", "contains", "within", "equals"}),
    ("within", rect(0, 0, 4, 4), rect(1, 1, 2, 2), {"intersects", "contains"}),
    ("contains_rev", rect(1, 1, 2, 2), rect(0, 0, 4, 4),
     {"intersects", "within"}),
    ("overlap", rect(0, 0, 4, 4), rect(2, 2, 6, 6),
     {"intersects", "overlaps"}),
    ("edge_touch", rect(0, 0, 4, 4), rect(4, 1, 6, 3),
     {"intersects", "touches"}),
    ("corner_touch", rect(0, 0, 4, 4), rect(4, 4, 6, 6),
     {"intersects", "touches"}),
    ("disjoint", rect(0, 0, 4, 4), rect(10, 10, 12, 12), set()),
    ("tri_cross", tri((0, 0), (4, 0), (2, 4)), tri((0, 3), (4, 3), (2, -1)),
     {"intersects", "overlaps"}),
    ("tri_vertex_touch", tri((0, 0), (2, 0), (1, 2)),
     tri((1, 2), (3, 2), (2, 4)), {"intersects", "touches"}),
    ("hex_overlap", HEX, rect(19, 19, 25, 25), {"intersects", "overlaps"}),
    ("hex_within", HEX, rect(16, 16, 24, 24), {"intersects", "within"}),
    ("hole_fill_touches", HOLEY, rect(2, 2, 6, 6), {"intersects", "touches"}),
    ("inside_hole_disjoint", HOLEY, rect(3, 3, 5, 5), set()),
    ("spans_hole_overlap", HOLEY, rect(1, 3, 7, 5), {"intersects", "overlaps"}),
    ("contains_despite_hole", HOLEY, rect(0.5, 6.5, 7.5, 7.5),
     {"intersects", "contains"}),
    # rect inside the hole, top edge on the hole boundary: boundary-only
    # contact — interiors are disjoint (the rect interior is in the hole)
    ("hole_edge_touch", HOLEY, rect(3, 4, 5, 6), {"intersects", "touches"}),
]


@pytest.mark.parametrize("name,a,b,true_flags", CASES, ids=[c[0] for c in CASES])
def test_relate_truth_table(name, a, b, true_flags):
    rel = G.relate_polygons(a, b)
    got = {k for k, v in rel.items() if v}
    assert got == true_flags, f"{name}: {got} != {true_flags}"
    # symmetry: swap A/B must mirror contains/within and keep the rest
    rev = G.relate_polygons(b, a)
    assert rev["intersects"] == rel["intersects"]
    assert rev["touches"] == rel["touches"]
    assert rev["overlaps"] == rel["overlaps"]
    assert rev["contains"] == rel["within"]
    assert rev["within"] == rel["contains"]
    assert rev["equals"] == rel["equals"]


def test_interior_point_always_strictly_inside():
    for rings in [rect(0, 0, 4, 4), HEX, HOLEY,
                  tri((0, 0), (4, 0), (2, 4)),
                  [np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4],
                             [0, 4], [0, 0]], dtype=np.float64)]]:
        x, y = G.interior_point(rings)
        assert G.points_in_polygon(np.array([x]), np.array([y]), rings)[0]


def test_clip_hexagon_area_matches_numeric_integration():
    """Hexagon clipped by a vertical half-plane window: Sutherland–Hodgman
    area vs dense grid integration (independent of the clip code path)."""
    clipped = G.clip_rings_rect(HEX, 20.5, 0.0, 100.0, 100.0)
    area = G.rings_area(clipped)
    xs = np.linspace(17.0, 23.0, 1201)
    ys = np.linspace(17.0, 23.0, 1201)
    gx, gy = np.meshgrid(xs, ys)
    inside = G.points_in_polygon(gx.ravel(), gy.ravel(), HEX)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    num = float((inside & (gx.ravel() >= 20.5)).sum()) * cell
    assert area == pytest.approx(num, abs=0.05)


def test_clip_preserves_holes():
    clipped = G.clip_rings_rect(HOLEY, -1.0, -1.0, 7.0, 9.0)
    assert len(clipped) == 2
    assert G.rings_area(clipped) == pytest.approx(7 * 8 - 4 * 4)


def test_clip_outside_returns_empty():
    assert G.clip_rings_rect(rect(0, 0, 1, 1), 5, 5, 6, 6) == []


def test_poly_relate_join_matches_kernel_allpairs(spark):
    """Distributed cell-cover join must find exactly the pairs the kernel
    finds on the full cross product (no candidate lost to cell logic)."""
    import itertools

    from gdal_spark.data.pages import polygon_records, polygon_records_b

    a_recs = polygon_records()
    b_recs = polygon_records_b()
    expected = {}
    for ra, rb in itertools.product(a_recs, b_recs):
        rel = G.relate_polygons(
            G.rings_to_numpy(ra["rings"]), G.rings_to_numpy(rb["rings"])
        )
        if rel["intersects"]:
            expected[(ra["poly_id"], rb["poly_id"])] = rel
    out = PJ.poly_relate_join(polygons_df(spark), polygons_b_df(spark))
    got = {
        (r["id_a"], r["id_b"]): r
        for r in out.filter(F.col("intersects")).collect()
    }
    assert set(got) == set(expected)
    for k, rel in expected.items():
        for f in PJ.FLAGS:
            assert got[k][f] == rel[f], (k, f)


def test_poly_relate_join_no_duplicate_pairs(spark):
    out = PJ.poly_relate_join(polygons_df(spark), polygons_b_df(spark))
    n = out.count()
    assert out.select("id_a", "id_b").distinct().count() == n


def test_clip_to_rect_dataframe(spark):
    out = PJ.clip_to_rect(polygons_df(spark), -1.50007, 30.50007,
                          45.00007, 47.00007)
    rows = {r["id"]: r for r in out.collect()}
    assert 65 in rows and rows[65]["n_rings"] == 1  # L-shape, bottom cut
    assert 66 in rows and rows[66]["n_rings"] == 2  # hole survives
    assert 64 not in rows  # hexagon outside window
    assert all(r["clip_area"] > 0 for r in rows.values())


def test_erase_rings_rect_partition_invariant():
    """Σ area(erase parts) + area(clip) == area(polygon) for boxes inside,
    overlapping, containing, and disjoint from the polygon (incl. a holed
    polygon) — the exactness contract of the 4-slab decomposition."""
    import numpy as np

    from gdal_spark.spatial import geometry as G

    def ring(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
        )

    holed = [ring(0, 0, 10, 10), ring(3, 3, 5, 5)[::-1].copy()]
    boxes = [
        (2, 2, 6, 6),       # overlaps the hole
        (-1, -1, 11, 11),   # contains everything -> no parts
        (20, 20, 30, 30),   # disjoint -> parts = original
        (4, -2, 7, 4),      # straddles the bottom edge
    ]
    for bx in boxes:
        parts = G.erase_rings_rect(holed, *bx)
        clip = G.clip_rings_rect(holed, *bx)
        part_area = sum(G.rings_area(p) for p in parts)
        clip_area = G.rings_area(clip) if clip else 0.0
        assert part_area + clip_area == pytest.approx(G.rings_area(holed))


def test_layer_overlay_rect_classes(spark):
    """Union must partition area: sum over union classes == area(A) part
    not covered + covered pieces + B-only — i.e. area(∪A ∪ ∪B) for
    interior-disjoint A and B layers; symdiff/identity/update are
    the documented subsets of the same classes."""
    from gdal_spark.queries import _OVERLAY_B_IDS

    a = polygons_df(spark).filter(F.col("poly_id") < 64)
    b = polygons_b_df(spark).filter(F.col("poly_id").isin(*_OVERLAY_B_IDS))
    rows = PJ.layer_overlay_rect(a, b, "union").collect()
    classes = {r["cls"] for r in rows}
    assert classes == {"both", "a_only", "b_only"}
    total = sum(r["area"] for r in rows)
    # area(∪A) = 64 mosaic cells x (2.0 x 1.5); area(B \ A) from the three
    # non-overlapping probe rects (corner/edge-touch + far-disjoint)
    area_a = 64 * 2.0 * 1.5
    b_free = sum(
        r["area"] for r in rows if r["cls"] == "b_only"
    )
    assert total == pytest.approx(area_a + b_free)
    sym = PJ.layer_overlay_rect(a, b, "symdifference").collect()
    assert {r["cls"] for r in sym} == {"a_only", "b_only"}
    upd = PJ.layer_overlay_rect(a, b, "update").collect()
    assert {r["cls"] for r in upd} == {"a_only", "b_update"}
    with pytest.raises(ValueError):
        PJ.layer_overlay_rect(a, b, "bogus")


class TestSubdivide:
    def test_area_conserved_and_limit(self, spark):
        import numpy as np
        from pyspark.sql import functions as F
        from gdal_spark.operators.subdivide import subdivide
        from gdal_spark.spatial import geometry as G

        # one concave 25-vertex star
        ang = np.arange(24) * (np.pi / 12.0)
        r = 0.5 * (1 + (np.arange(24) % 5) / 10.0)
        ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        orig_area = G.rings_area([ring])
        df = spark.createDataFrame(
            [(0, [[[float(p[0]), float(p[1])] for p in ring]])],
            "poly_id long, rings array<array<array<double>>>")
        parts = subdivide(df, max_vertices=8).toPandas()
        assert (parts["n_verts"] <= 8).all()
        assert len(parts) > 1
        total = sum(G.rings_area(G.rings_to_numpy(r))
                    for r in parts["rings"])
        assert abs(total - orig_area) < 1e-9

    def test_min_vertices_floor(self, spark):
        import pytest as _pt
        from gdal_spark.operators.subdivide import subdivide

        with _pt.raises(ValueError):
            subdivide(None, max_vertices=4)
