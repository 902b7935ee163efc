"""Voronoi dual construction invariants (operators/triangulate.py
voronoi_interior_cells) — independent of the Spark/DuckDB gate."""

from __future__ import annotations

import numpy as np

from gdal_spark.operators.triangulate import (
    delaunay,
    voronoi_interior_cells,
)


def _rand_points(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 100.0, size=(n, 2))


def _pip_convex(cell: np.ndarray, q: np.ndarray) -> bool:
    nx = np.roll(cell[:, 0], -1)
    ny = np.roll(cell[:, 1], -1)
    cross = (nx - cell[:, 0]) * (q[1] - cell[:, 1]) - (
        ny - cell[:, 1]
    ) * (q[0] - cell[:, 0])
    return bool(np.all(cross >= 0.0))


def test_site_inside_own_cell():
    pts = _rand_points(80, 3)
    for v, cell in voronoi_interior_cells(pts):
        assert cell.shape[0] >= 3
        assert _pip_convex(cell, pts[v])


def test_cell_vertices_equidistant_to_site_and_no_closer_site():
    # Every bounded-cell vertex is a Delaunay circumcenter: its distance
    # to the owning site equals the circumradius, and NO site is closer
    # (empty-circumcircle property).
    pts = _rand_points(60, 9)
    for v, cell in voronoi_interior_cells(pts):
        for cx, cy in cell:
            d_site = np.hypot(pts[v, 0] - cx, pts[v, 1] - cy)
            d_all = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
            assert d_all.min() >= d_site - 1e-6 * max(1.0, d_site)


def test_probe_assignment_matches_nearest_site():
    # The geometric definition: a probe inside a bounded cell has that
    # cell's site as its unique nearest site.
    pts = _rand_points(70, 21)
    cells = voronoi_interior_cells(pts)
    rng = np.random.default_rng(5)
    probes = rng.uniform(10.0, 90.0, size=(300, 2))
    for q in probes:
        owners = [v for v, cell in cells if _pip_convex(cell, q)]
        d = np.hypot(pts[:, 0] - q[0], pts[:, 1] - q[1])
        nearest = int(np.argmin(d))
        if owners:
            assert owners == [nearest]
        else:
            # not in any bounded cell => nearest site is on the hull
            tris = delaunay(pts)
            interior = {v for v, _ in cells}
            assert nearest not in interior


def test_cell_count_is_interior_site_count():
    pts = _rand_points(50, 33)
    tris = delaunay(pts)
    from collections import defaultdict

    cnt = defaultdict(int)
    for t in tris:
        for u, w in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            cnt[(min(u, w), max(u, w))] += 1
    hull = set()
    for (u, w), k in cnt.items():
        if k == 1:
            hull.update((int(u), int(w)))
    cells = voronoi_interior_cells(pts)
    assert len(cells) == 50 - len(hull)
    assert {v for v, _ in cells}.isdisjoint(hull)
