"""General polygon boolean overlay: intersection / difference / union of
two VALID simple polygons (outer ring CCW, holes CW), both possibly
concave and holed.

Reference semantics: OGRLayer::Intersection / Clip / Erase against an
arbitrary polygon method layer (/root/reference/ogr/ogrsf_frmts/generic/
ogrlayer.cpp:5386 Intersection, :7538 Clip, :7847 Erase — GEOS
OverlayNG-backed in the reference).  This kernel is a from-scratch
noding + boundary-selection + leftmost-turn trace — NOT a port:

1. CROSS-NODE: every proper A×B edge crossing is computed ONCE and
   spliced into both rings bit-identically (the make_valid noding
   discipline, spatial/geometry.py:_node_ring_self); then the coverage
   noder (operators/dissolve.py:node_coverage_rings) splits every edge at
   any other vertex, so T-junctions and collinear overlaps reduce to
   sub-edges that are either IDENTICAL (shared boundary) or have disjoint
   interiors.
2. SELECT: each directed sub-edge is classified by its midpoint against
   the OTHER polygon — after noding a midpoint is strictly inside,
   strictly outside, or (only for fully-shared sub-edges) on the
   boundary; shared edges resolve via an interior-side probe (is B's
   interior on the same side as A's?).  Result boundaries, with the
   result interior kept on the LEFT of every selected edge:

     intersection:  {∂A in B} ∪ {∂B in A} ∪ {shared, same side: A copy}
     difference:    {∂A out B} ∪ {rev ∂B in A} ∪ {shared, opposite side}
     union:         {∂A out B} ∪ {∂B out A} ∪ {shared, same side: A copy}

3. TRACE: the selected edges are walked into simple rings by the
   dissolve tracer (trace_directed_edges) — CCW outers / CW holes come
   out by construction because interiors stayed on the left.
4. ASSEMBLE: each CW ring (hole) attaches to the smallest-|area|
   containing CCW ring (outer), giving MultiPolygon parts.

Contract / documented bounds: inputs are valid simple polygons
(make_valid repairs invalid input upstream); shared-edge side probes use
a 1e-7-scaled normal offset, so features narrower than ~1e-6 of the
coordinate scale on a shared boundary are beneath the kernel's
resolution (fixture coordinates are O(1-50) with features >= 0.05).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.spatial import geometry as G

__all__ = ["overlay_polygons", "overlay_area", "overlay_parts_rings"]

_OPS = ("intersection", "difference", "union")


def _proper_cross_node(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Splice every proper A-edge × B-edge crossing point into BOTH rings
    (computed once → bit-identical vertex on both sides)."""
    a_ins: list[dict[int, list]] = [dict() for _ in rings_a]
    b_ins: list[dict[int, list]] = [dict() for _ in rings_b]
    for ai, ra in enumerate(rings_a):
        pa = np.asarray(ra, dtype=np.float64)
        for i in range(pa.shape[0] - 1):
            p = pa[i]
            r = pa[i + 1] - p
            if r[0] == 0.0 and r[1] == 0.0:
                continue
            for bi, rb in enumerate(rings_b):
                pb = np.asarray(rb, dtype=np.float64)
                for j in range(pb.shape[0] - 1):
                    q = pb[j]
                    s = pb[j + 1] - q
                    denom = r[0] * s[1] - r[1] * s[0]
                    if denom == 0.0:
                        continue
                    t = ((q[0] - p[0]) * s[1] - (q[1] - p[1]) * s[0]) / denom
                    u = ((q[0] - p[0]) * r[1] - (q[1] - p[1]) * r[0]) / denom
                    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
                        x = (p[0] + t * r[0], p[1] + t * r[1])
                        a_ins[ai].setdefault(i, []).append((t, x))
                        b_ins[bi].setdefault(j, []).append((u, x))

    def splice(rings, inserts):
        out = []
        for ring, ins in zip(rings, inserts):
            pts = np.asarray(ring, dtype=np.float64)
            if not ins:
                out.append(pts.copy())
                continue
            acc: list[tuple] = []
            for i in range(pts.shape[0] - 1):
                acc.append((float(pts[i, 0]), float(pts[i, 1])))
                for _t, x in sorted(ins.get(i, []), key=lambda e: e[0]):
                    acc.append(x)
            acc.append(acc[0])
            out.append(np.array(acc, dtype=np.float64))
        return out

    return splice(rings_a, a_ins), splice(rings_b, b_ins)


def _directed_edges(rings: list[np.ndarray]) -> list[tuple[tuple, tuple]]:
    edges = []
    for ring in rings:
        arr = np.asarray(ring, dtype=np.float64)
        for i in range(arr.shape[0] - 1):
            p = (float(arr[i, 0]), float(arr[i, 1]))
            q = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
            if p != q:
                edges.append((p, q))
    return edges


def _locate_mids(
    edges: list[tuple[tuple, tuple]], other: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """(strictly_inside, on_boundary) of each edge midpoint vs `other`
    — vectorized over all edges at once."""
    if not edges:
        z = np.zeros(0, dtype=bool)
        return z, z
    mx = np.array([(p[0] + q[0]) / 2.0 for p, q in edges])
    my = np.array([(p[1] + q[1]) / 2.0 for p, q in edges])
    inside = G.points_in_polygon(mx, my, other, boundary_is_inside=False)
    on_b = np.zeros(mx.shape[0], dtype=bool)
    for ring in other:
        on_b |= G.points_on_ring_boundary(mx, my, ring)
    return inside & ~on_b, on_b


def _same_side(
    edges: list[tuple[tuple, tuple]], idx: np.ndarray,
    other: list[np.ndarray],
) -> np.ndarray:
    """For shared (on-boundary) edges: is `other`'s interior on the LEFT of
    the edge (the same side as this polygon's interior)?  Probes the
    midpoint offset by a 1e-7-scaled left normal."""
    res = np.zeros(len(edges), dtype=bool)
    if not idx.any():
        return res
    sel = np.nonzero(idx)[0]
    px, py, qx, qy = [], [], [], []
    for k in sel:
        p, q = edges[k]
        px.append(p[0]); py.append(p[1]); qx.append(q[0]); qy.append(q[1])
    px, py = np.array(px), np.array(py)
    qx, qy = np.array(qx), np.array(qy)
    dx, dy = qx - px, qy - py
    ln = np.hypot(dx, dy)
    mx, my = (px + qx) / 2.0, (py + qy) / 2.0
    eps = 1e-7 * np.maximum(1.0, np.maximum(np.abs(mx), np.abs(my)))
    ox = mx - dy / ln * eps  # left normal = (-dy, dx)
    oy = my + dx / ln * eps
    res[sel] = G.points_in_polygon(ox, oy, other, boundary_is_inside=False)
    return res


def overlay_polygons(
    rings_a: list[np.ndarray],
    rings_b: list[np.ndarray],
    op: str = "intersection",
) -> list[list[np.ndarray]]:
    """Boolean overlay of two polygons → MultiPolygon parts (each a ring
    list: CCW outer first, CW holes after)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    from gdal_spark.operators.dissolve import (
        node_coverage_rings, trace_directed_edges,
    )

    ra = [np.asarray(r, dtype=np.float64) for r in rings_a]
    rb = [np.asarray(r, dtype=np.float64) for r in rings_b]
    # envelope fast paths: disjoint boxes decide without noding
    (axn, ayn, axx, ayx) = G.rings_envelope(ra)
    (bxn, byn, bxx, byx) = G.rings_envelope(rb)
    if axx < bxn or bxx < axn or ayx < byn or byx < ayn:
        if op == "intersection":
            return []
        if op == "difference":
            return [ra]
        return [ra, rb]  # union of disjoint = both parts

    na, nb = _proper_cross_node(ra, rb)
    noded = node_coverage_rings([na, nb])
    na, nb = noded[0], noded[1]

    ea = _directed_edges(na)
    eb = _directed_edges(nb)
    a_in, a_on = _locate_mids(ea, nb)
    b_in, b_on = _locate_mids(eb, na)
    a_out = ~a_in & ~a_on

    kept: dict[tuple, int] = {}

    def add(p, q):
        rev = (q, p)
        if kept.get(rev, 0) > 0:  # opposite copies cancel (slivers)
            kept[rev] -= 1
            if kept[rev] == 0:
                del kept[rev]
        else:
            kept[(p, q)] = kept.get((p, q), 0) + 1

    if op == "intersection":
        shared_same = _same_side(ea, a_on, nb)
        for k, (p, q) in enumerate(ea):
            if a_in[k] or shared_same[k]:
                add(p, q)
        for k, (p, q) in enumerate(eb):
            if b_in[k]:
                add(p, q)
    elif op == "difference":
        shared_same = _same_side(ea, a_on, nb)
        for k, (p, q) in enumerate(ea):
            if a_out[k] or (a_on[k] and not shared_same[k]):
                add(p, q)
        for k, (p, q) in enumerate(eb):
            if b_in[k]:
                add(q, p)  # reversed: difference interior on the left
    else:  # union
        shared_same = _same_side(ea, a_on, nb)
        b_out = ~b_in & ~b_on
        for k, (p, q) in enumerate(ea):
            if a_out[k] or shared_same[k]:
                add(p, q)
        for k, (p, q) in enumerate(eb):
            if b_out[k]:
                add(p, q)

    simple = trace_directed_edges(kept)
    return _assemble_parts(simple)


def _assemble_parts(simple: list[np.ndarray]) -> list[list[np.ndarray]]:
    """CCW rings become part outers; each CW ring attaches to the
    smallest-|area| outer containing a point strictly inside the hole."""
    outers: list[tuple[float, np.ndarray]] = []
    holes: list[np.ndarray] = []
    for r in simple:
        a = 0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
        if a > 0.0:
            outers.append((a, r))
        elif a < 0.0:
            holes.append(r)
    parts = [[r] for _a, r in outers]
    for h in holes:
        hx, hy = G.interior_point([h[::-1].copy()])
        px, py = np.array([hx]), np.array([hy])
        best, best_area = -1, np.inf
        for k, (a, r) in enumerate(outers):
            if a < best_area and bool(G.points_in_ring(px, py, r)[0]):
                best, best_area = k, a
        if best >= 0:
            parts[best].append(h)
    return parts


def overlay_parts_rings(parts: list[list[np.ndarray]]) -> list[np.ndarray]:
    return [r for part in parts for r in part]


def overlay_area(parts: list[list[np.ndarray]]) -> float:
    """Signed-shoelace area over all rings (holes negative by CW
    orientation) = exact area of the overlay result."""
    total = 0.0
    for part in parts:
        for r in part:
            total += 0.5 * float(
                np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
            )
    return total
