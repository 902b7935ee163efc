"""Delaunay (Bowyer–Watson, adaptive exact predicates) + concave hull
(ogrgeometry.cpp:7112 DelaunayTriangulation, :4562 ConcaveHull)."""

import math

import numpy as np
import pytest

from gdal_spark.operators import triangulate as TRI


def _euler_ok(pts, tris):
    h = len({v for e in TRI.boundary_edges(tris) for v in e})
    return len(tris) == 2 * len(pts) - 2 - h


def test_square_two_triangles():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    tris = TRI.delaunay(pts)
    assert len(tris) == 2
    assert TRI.tri_areas(pts, tris).sum() == pytest.approx(1.0)


def test_random_sets_satisfy_euler_and_cover_hull():
    for seed in range(5):
        rng = np.random.RandomState(seed)
        pts = rng.rand(50, 2) * 100
        tris = TRI.delaunay(pts)
        assert _euler_ok(pts, tris)
        # triangulated area equals convex hull area (independent O(n³) hull)
        n = len(pts)
        hull_edges = []
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d = (pts[j, 0] - pts[i, 0]) * (pts[:, 1] - pts[i, 1]) - (
                    pts[j, 1] - pts[i, 1]
                ) * (pts[:, 0] - pts[i, 0])
                m = np.ones(n, bool)
                m[[i, j]] = False
                if (d[m] >= 0).all():
                    hull_edges.append((i, j))
        hull_area = sum(
            pts[a, 0] * pts[b, 1] - pts[b, 0] * pts[a, 1]
            for a, b in hull_edges
        ) / 2.0
        assert TRI.tri_areas(pts, tris).sum() == pytest.approx(hull_area)


def test_near_degenerate_hull_point_not_notched():
    """A point a hair inside a hull edge must be triangulated INSIDE (no
    boundary notch) — regression for the super-triangle-too-close and
    disconnected-cavity failure modes."""
    pts = np.array(
        [[0, 0], [10, 0], [5, 1e-5], [0, 10], [10, 10], [5, 14]], dtype=float
    )
    tris = TRI.delaunay(pts)
    hull_v = {v for e in TRI.boundary_edges(tris) for v in e}
    assert 2 not in hull_v  # (5, 1e-5) is interior
    assert _euler_ok(pts, tris)


def test_empty_circumcircle_exact():
    from fractions import Fraction as Fr

    rng = np.random.RandomState(3)
    pts = rng.rand(30, 2) * 10
    tris = TRI.delaunay(pts)

    def incircle(a, b, c, q):
        ax, ay, bx, by, cx, cy, qx, qy = (
            Fr(float(v)) for v in (*a, *b, *c, *q)
        )
        ax -= qx
        ay -= qy
        bx -= qx
        by -= qy
        cx -= qx
        cy -= qy
        return (
            (ax * ax + ay * ay) * (bx * cy - cx * by)
            - (bx * bx + by * by) * (ax * cy - cx * ay)
            + (cx * cx + cy * cy) * (ax * by - bx * ay)
        )

    for t in tris:
        for q in range(len(pts)):
            if q in t:
                continue
            assert incircle(pts[t[0]], pts[t[1]], pts[t[2]], pts[q]) <= 0


def test_concave_hull_carves_notch():
    """Two clusters joined by a long bridge: the convex hull spans the gap;
    the concave hull at a small ratio removes the long border triangles,
    shrinking the area while keeping every point a vertex."""
    rng = np.random.RandomState(7)
    left = rng.rand(15, 2) * 3.0
    right = rng.rand(15, 2) * 3.0 + np.array([20.0, 0.0])
    pts = np.vstack([left, right])
    full = TRI.delaunay(pts)
    hull_area = TRI.tri_areas(pts, full).sum()
    kept, area = TRI.concave_hull(pts, ratio=0.05)
    assert area < hull_area * 0.9
    assert {v for t in kept for v in t} == set(range(len(pts)))
    # ratio=1 keeps everything (threshold = max edge)
    kept_all, area_all = TRI.concave_hull(pts, ratio=1.0)
    assert area_all == pytest.approx(hull_area)


def test_too_few_points_raise():
    with pytest.raises(ValueError):
        TRI.delaunay(np.zeros((2, 2)))
