"""Delaunay triangulation + concave hull.

Reference semantics: ``OGRGeometry::DelaunayTriangulation``
(ogr/ogrgeometry.cpp:7112, GEOS-backed) and ``ConcaveHull``
(ogr/ogrgeometry.cpp:4562 — GEOS' edge-length-ratio concave hull, itself
built on the Delaunay triangulation).

Implementation: classic Bowyer–Watson incremental insertion (public
algorithm) in numpy — a per-group kernel, not a distributed join: point
sets that need triangulating are group-sized geometries (a feature's
vertices, a cluster's members), so the Spark plan is groupBy →
applyInPandas with this kernel inside, same shape as the dissolve/polygonize
group kernels. The concave hull erodes border triangles whose border edge
exceeds ``threshold = min_edge + ratio·(max_edge − min_edge)`` (GEOS'
edge-length-ratio parameterization), never removing a triangle whose
removal would disconnect the region or orphan a vertex.
"""

from __future__ import annotations

import numpy as np


def _circum(ax, ay, bx, by, cx, cy):
    """Circumcenter + squared radius of one triangle (None if degenerate)."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def _orient_ccw(all_pts, a, b, c):
    v = all_pts[[a, b, c]]
    p1 = (v[1, 0] - v[0, 0]) * (v[2, 1] - v[0, 1])
    p2 = (v[2, 0] - v[0, 0]) * (v[1, 1] - v[0, 1])
    cross = p1 - p2
    if abs(cross) <= 1e-12 * (abs(p1) + abs(p2)):
        from fractions import Fraction as _Fr

        q = [[_Fr(float(x)) for x in row] for row in v]
        cross = (q[1][0] - q[0][0]) * (q[2][1] - q[0][1]) - (
            q[2][0] - q[0][0]
        ) * (q[1][1] - q[0][1])
    return (a, b, c) if cross >= 0 else (a, c, b)


def _incircle(all_pts, tri, p_idx) -> bool:
    """ADAPTIVE determinant in-circle test for a CCW triangle: a float
    evaluation with a forward error bound, falling back to exact rational
    arithmetic (fractions.Fraction over the binary doubles) when the float
    result is within the bound — the Shewchuk adaptive-predicate recipe in
    its simplest form. Without this, near-degenerate hull slivers make the
    Bowyer–Watson cavity non-star-shaped and the mesh grows notches."""
    a, b, c = (all_pts[v] - all_pts[p_idx] for v in tri)
    t1 = (a[0] * a[0] + a[1] * a[1]) * (b[0] * c[1] - c[0] * b[1])
    t2 = (b[0] * b[0] + b[1] * b[1]) * (a[0] * c[1] - c[0] * a[1])
    t3 = (c[0] * c[0] + c[1] * c[1]) * (a[0] * b[1] - b[0] * a[1])
    det = t1 - t2 + t3
    err = 1e-12 * (abs(t1) + abs(t2) + abs(t3))
    if abs(det) > err:
        return det > 0.0
    from fractions import Fraction as _Fr

    av = [_Fr(float(v)) for v in all_pts[tri[0]]]
    bv = [_Fr(float(v)) for v in all_pts[tri[1]]]
    cv = [_Fr(float(v)) for v in all_pts[tri[2]]]
    pv = [_Fr(float(v)) for v in all_pts[p_idx]]
    ax, ay = av[0] - pv[0], av[1] - pv[1]
    bx, by = bv[0] - pv[0], bv[1] - pv[1]
    cx, cy = cv[0] - pv[0], cv[1] - pv[1]
    d = (
        (ax * ax + ay * ay) * (bx * cy - cx * by)
        - (bx * bx + by * by) * (ax * cy - cx * ay)
        + (cx * cx + cy * cy) * (ax * by - bx * ay)
    )
    return d > 0


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer–Watson. ``points`` (n, 2) float64, n >= 3, general position.
    Returns (t, 3) int32 vertex-index triangles (CCW)."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if n < 3:
        raise ValueError("need >= 3 points")
    # Super-triangle effectively at infinity: a near hull sliver's
    # circumradius can reach scale²/margin (2e7 for this fixture's
    # 1.6e-5-margin hull point) — super vertices only 10× the scale away
    # would sit INSIDE such circumcircles, suppressing the sliver and
    # leaving a boundary notch. 1e9× the scale keeps every triangle whose
    # relative margin exceeds ~1e-9 Delaunay-valid; the adaptive exact
    # predicates absorb the magnitude without precision loss.
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    m = (max(pts[:, 0].ptp(), pts[:, 1].ptp()) + 1.0) * 1e9
    sup = np.array(
        [[cx - 2 * m, cy - m], [cx + 2 * m, cy - m], [cx, cy + 2 * m]]
    )
    all_pts = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [_orient_ccw(all_pts, s0, s1, s2)]

    def _orient_sign(a, b, c):
        pa, pb, pc = all_pts[a], all_pts[b], all_pts[c]
        p1 = (pb[0] - pa[0]) * (pc[1] - pa[1])
        p2 = (pc[0] - pa[0]) * (pb[1] - pa[1])
        cross = p1 - p2
        if abs(cross) <= 1e-12 * (abs(p1) + abs(p2)):
            from fractions import Fraction as _Fr

            ax, ay = _Fr(float(pa[0])), _Fr(float(pa[1]))
            bx, by = _Fr(float(pb[0])), _Fr(float(pb[1]))
            cx, cy = _Fr(float(pc[0])), _Fr(float(pc[1]))
            cross = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
        return int(cross > 0) - int(cross < 0)

    def _tri_contains(t, i):
        a, b, c = t
        return (
            _orient_sign(a, b, i) >= 0
            and _orient_sign(b, c, i) >= 0
            and _orient_sign(c, a, i) >= 0
        )

    for i in range(n):
        # vectorized adaptive in-circle over ALL current triangles: float
        # determinant with error bound; only near-zero dets fall back to
        # the exact per-triangle predicate (rare)
        T = np.asarray(tris, dtype=np.int64)
        P = all_pts[i]
        A = all_pts[T[:, 0]] - P
        B = all_pts[T[:, 1]] - P
        C = all_pts[T[:, 2]] - P
        t1 = (A[:, 0] * A[:, 0] + A[:, 1] * A[:, 1]) * (
            B[:, 0] * C[:, 1] - C[:, 0] * B[:, 1]
        )
        t2 = (B[:, 0] * B[:, 0] + B[:, 1] * B[:, 1]) * (
            A[:, 0] * C[:, 1] - C[:, 0] * A[:, 1]
        )
        t3 = (C[:, 0] * C[:, 0] + C[:, 1] * C[:, 1]) * (
            A[:, 0] * B[:, 1] - B[:, 0] * A[:, 1]
        )
        det = t1 - t2 + t3
        err = 1e-12 * (np.abs(t1) + np.abs(t2) + np.abs(t3))
        sure_in = det > err
        uncertain = np.nonzero(np.abs(det) <= err)[0]
        bad = [tris[k] for k in np.nonzero(sure_in)[0]]
        bad += [
            tris[k] for k in uncertain if _incircle(all_pts, tris[k], i)
        ]
        if len(bad) > 1:
            # The float in-circle filter can admit far-away sliver
            # triangles, making the cavity non-star-shaped and leaving
            # notches in the mesh. Keep only the edge-connected component
            # of bad triangles around the triangle CONTAINING the inserted
            # point (the textbook robust-cavity repair).
            seed = next((t for t in bad if _tri_contains(t, i)), bad[0])
            edge_of = {}
            for t in bad:
                a, b, c_ = t
                for e in ((a, b), (b, c_), (c_, a)):
                    edge_of.setdefault((min(e), max(e)), []).append(t)
            comp, stack = {seed}, [seed]
            while stack:
                t = stack.pop()
                a, b, c_ = t
                for e in ((a, b), (b, c_), (c_, a)):
                    for t2 in edge_of[(min(e), max(e))]:
                        if t2 not in comp:
                            comp.add(t2)
                            stack.append(t2)
            bad = [t for t in bad if t in comp]
        # boundary polygon of the cavity = edges appearing once among bad
        edge_count: dict[tuple[int, int], int] = {}
        for (a, b, c_) in bad:
            for e in ((a, b), (b, c_), (c_, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, k in edge_count.items() if k == 1]
        bad_set = set(bad)
        tris = [t for t in tris if t not in bad_set]
        for (a, b) in boundary:
            tris.append(_orient_ccw(all_pts, a, b, i))

    out = [t for t in tris if t[0] < n and t[1] < n and t[2] < n]
    return np.array(out, dtype=np.int32)


def tri_areas(points: np.ndarray, tris: np.ndarray) -> np.ndarray:
    p = np.asarray(points, dtype=np.float64)
    a, b, c = p[tris[:, 0]], p[tris[:, 1]], p[tris[:, 2]]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1])
    )


def boundary_edges(tris: np.ndarray) -> list[tuple[int, int]]:
    """Edges used by exactly one triangle (the hull of the triangulated
    region)."""
    count: dict[tuple[int, int], int] = {}
    for a, b, c in tris:
        for e in ((a, b), (b, c), (c, a)):
            key = (min(e), max(e))
            count[key] = count.get(key, 0) + 1
    return [e for e, k in count.items() if k == 1]


def concave_hull(
    points: np.ndarray, ratio: float = 0.3,
) -> tuple[np.ndarray, float]:
    """GEOS-style edge-length-ratio concave hull: starting from the
    Delaunay triangulation (whose union is the convex hull), repeatedly
    remove the border triangle with the longest border edge while that edge
    exceeds ``threshold = min_e + ratio·(max_e − min_e)`` (edge stats over
    the triangulation) and removal keeps every vertex used. Returns
    (kept_triangles, hull_area)."""
    pts = np.asarray(points, dtype=np.float64)
    tris = delaunay(pts)

    def elen(e):
        return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

    all_edges = set()
    for a, b, c in tris:
        for e in ((a, b), (b, c), (c, a)):
            all_edges.add((min(e), max(e)))
    lens = [elen(e) for e in all_edges]
    threshold = min(lens) + ratio * (max(lens) - min(lens))

    kept = {tuple(t) for t in map(tuple, tris)}
    while True:
        cnt: dict[tuple[int, int], list] = {}
        for t in kept:
            a, b, c = t
            for e in ((a, b), (b, c), (c, a)):
                cnt.setdefault((min(e), max(e)), []).append(t)
        border = [(elen(e), e, ts[0]) for e, ts in cnt.items() if len(ts) == 1]
        border.sort(reverse=True)
        removed = False
        for length, e, t in border:
            if length <= threshold:
                break
            trial = kept - {t}
            used = {v for tt in trial for v in tt}
            if len(trial) >= 1 and used == set(range(pts.shape[0])):
                kept = trial
                removed = True
                break
        if not removed:
            break
    kept_arr = np.array(sorted(kept), dtype=np.int32)
    return kept_arr, float(tri_areas(pts, kept_arr).sum())


def voronoi_interior_cells(
    points: np.ndarray,
) -> list[tuple[int, np.ndarray]]:
    """Bounded Voronoi cells — the dual of the Delaunay triangulation
    (GEOSVoronoiDiagram / the Spatialite ST_VoronojDiagram GDAL's SQLite
    dialect exposes; built here from our own ``delaunay``, not GEOS).

    A site strictly inside the convex hull has a BOUNDED cell whose
    vertices are exactly the circumcenters of its incident triangles,
    ordered by angle around the site (CCW).  Hull sites have unbounded
    cells and are skipped (clipping rays to a frame is the gate's
    documented non-goal).  Returns [(site_index, cell_vertices CCW)].
    """
    from collections import defaultdict

    tris = delaunay(points)
    cnt: dict[tuple[int, int], int] = defaultdict(int)
    for t in tris:
        for u, w in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            cnt[(min(u, w), max(u, w))] += 1
    hull: set[int] = set()
    for (u, w), k in cnt.items():
        if k == 1:
            hull.add(int(u))
            hull.add(int(w))
    centers: list[tuple[float, float] | None] = []
    for t in tris:
        c = _circum(
            points[t[0], 0], points[t[0], 1],
            points[t[1], 0], points[t[1], 1],
            points[t[2], 0], points[t[2], 1],
        )
        centers.append(None if c is None else (c[0], c[1]))
    incident: dict[int, list[int]] = defaultdict(list)
    for ti, t in enumerate(tris):
        for vv in t:
            incident[int(vv)].append(ti)
    cells: list[tuple[int, np.ndarray]] = []
    for v, tl in incident.items():
        if v in hull:
            continue
        cs = [centers[ti] for ti in tl]
        if any(c is None for c in cs):
            continue
        arr = np.asarray(cs, dtype=np.float64)
        ang = np.arctan2(arr[:, 1] - points[v, 1], arr[:, 0] - points[v, 0])
        cells.append((v, arr[np.argsort(ang, kind="stable")]))
    return cells
