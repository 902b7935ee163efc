"""Vectorized geometry kernels over Arrow-packed ring arrays.

Semantics transcribed (not ported — re-derived as numpy batch kernels) from
the reference:

  * point-in-ring crossing count  — ogr/ogrlinearring.cpp:452-521
    (``isPointInRing``): for each segment (p[i-1], p[i]) with coordinates
    translated so the test point is the origin, count crossings of the
    positive-x ray; odd → inside. Strict interior: a boundary point's
    membership is NOT guaranteed — callers combine with the boundary test.
  * point-on-ring-boundary        — ogr/ogrlinearring.cpp:533-605
    (``isPointOnRingBoundary``): exact collinearity (cross product == 0.0)
    plus projection-parameter containment in [0, |seg|^2].
  * polygon contains              — ogr/ogrcurvepolygon.cpp:810-867
    (``ContainsPoint``/``Contains``): exterior ring interior minus holes;
    GEOS ``Contains`` of a boundary point is false
    (autotest/ogr/ogr_geom.py:4049), so we subtract ring boundaries too.
  * great-circle distance         — ogr/ogr_geo_utils.cpp:25-46
    (``OGR_GreatCircle_Distance``): spherical law of cosines with the
    clamped-acos guard, R = 6378137 by default.

Representation: a polygon is ``rings: list[np.ndarray(n_i, 2)]`` where ring 0
is the closed exterior and rings 1+ are closed holes — the Arrow layout is
``array<array<array<double>>>`` (ring → vertex → [x, y]).

All kernels are vectorized over a BATCH of points (M,) against one ring (N,2)
— an (M, N) broadcast; polygons in our workloads have small N so this is the
cache-friendly shape. No per-row Python anywhere.
"""

from __future__ import annotations

import math
import struct

import numpy as np

EARTH_RADIUS = 6378137.0


# ---------------------------------------------------------------------------
# Point-in-ring (crossing number) — parity with ogrlinearring.cpp:452-521
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-number test of M points against one closed ring.

    Returns a boolean (M,) array: True = strictly-odd crossing count
    (GDAL's "inside"; boundary points undefined, handle separately).
    """
    if ring.shape[0] < 4:  # GDAL: nPoints < 4 → false
        return np.zeros(px.shape[0], dtype=bool)
    rx = ring[:, 0]
    ry = ring[:, 1]
    # Translate so each test point is the origin: shape (M, N)
    x_rel = rx[None, :] - px[:, None]
    y_rel = ry[None, :] - py[:, None]
    # Segment endpoints: prev = index i-1 ("2" in the reference), cur = i ("1")
    x1, y1 = x_rel[:, 1:], y_rel[:, 1:]
    x2, y2 = x_rel[:, :-1], y_rel[:, :-1]
    straddles = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    denom = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        intersection = (x1 * y2 - x2 * y1) / denom
    crossings = straddles & (intersection > 0.0)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_on_ring_boundary(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Exact on-boundary test, parity with ogrlinearring.cpp:533-605.

    Collinearity is an EXACT float equality (dx1*dy2 - dx2*dy1 == 0.0) in the
    reference; we keep that verbatim for parity.
    """
    if ring.shape[0] < 4:
        return np.zeros(px.shape[0], dtype=bool)
    rx = ring[:, 0]
    ry = ring[:, 1]
    dx = px[:, None] - rx[None, :]  # (M, N)
    dy = py[:, None] - ry[None, :]
    dx1, dy1 = dx[:, 1:], dy[:, 1:]      # point - cur vertex
    dx2, dy2 = dx[:, :-1], dy[:, :-1]    # point - prev vertex
    collinear = (dx1 * dy2 - dx2 * dy1) == 0.0
    degenerate = (dx1 == dx2) & (dy1 == dy2)  # zero-length segment: skip
    seg_x = rx[1:] - rx[:-1]
    seg_y = ry[1:] - ry[:-1]
    crossproduct = dx2 * seg_x[None, :] + dy2 * seg_y[None, :]
    seg_len2 = seg_x * seg_x + seg_y * seg_y
    on_seg = (
        collinear
        & ~degenerate
        & (crossproduct >= 0.0)
        & (crossproduct <= seg_len2[None, :])
    )
    return on_seg.any(axis=1)


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[np.ndarray],
    boundary_is_inside: bool = False,
) -> np.ndarray:
    """GEOS-``Contains``-parity polygon test (ogrcurvepolygon.cpp:810-867).

    inside = interior(exterior) ∧ ¬closure(any hole); polygon-boundary points
    (exterior ring or hole rings) are NOT contained unless
    ``boundary_is_inside`` (which gives ``Intersects`` semantics instead).
    """
    exterior = rings[0]
    inside = points_in_ring(px, py, exterior)
    on_ext = points_on_ring_boundary(px, py, exterior)
    if boundary_is_inside:
        inside = inside | on_ext
    else:
        inside = inside & ~on_ext
    for hole in rings[1:]:
        in_hole = points_in_ring(px, py, hole)
        on_hole = points_on_ring_boundary(px, py, hole)
        if boundary_is_inside:
            inside = inside & ~(in_hole & ~on_hole)
        else:
            inside = inside & ~in_hole & ~on_hole
    return inside


# ---------------------------------------------------------------------------
# Great-circle distance — parity with ogr_geo_utils.cpp:25-46
# ---------------------------------------------------------------------------

def great_circle_distance(
    lat_a: np.ndarray,
    lon_a: np.ndarray,
    lat_b: np.ndarray,
    lon_b: np.ndarray,
    radius: float = EARTH_RADIUS,
) -> np.ndarray:
    """Spherical law of cosines, exact formula of OGR_GreatCircle_Distance
    (including the acos clamp of OGR_Safe_acos)."""
    deg2rad = math.pi / 180.0
    cos_p = np.cos((lon_b - lon_a) * deg2rad)
    lat_a_r = lat_a * deg2rad
    lat_b_r = lat_b * deg2rad
    cos_angle = (
        np.sin(lat_a_r) * np.sin(lat_b_r)
        + np.cos(lat_a_r) * np.cos(lat_b_r) * cos_p
    )
    return np.arccos(np.clip(cos_angle, -1.0, 1.0)) * radius


def sql_great_circle_m(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """The same formula as an ANSI-SQL fragment (DuckDB oracle parity)."""
    d2r = "(pi() / 180.0)"
    return (
        f"(acos(least(1.0, greatest(-1.0, "
        f"sin(({lat_a}) * {d2r}) * sin(({lat_b}) * {d2r}) + "
        f"cos(({lat_a}) * {d2r}) * cos(({lat_b}) * {d2r}) * "
        f"cos((({lon_b}) - ({lon_a})) * {d2r})))) * {EARTH_RADIUS!r})"
    )


# ---------------------------------------------------------------------------
# Envelope helpers (OGREnvelope prefilter — ogrlayer.cpp:4005-4032)
# ---------------------------------------------------------------------------

def rings_to_numpy(rings_obj) -> list[np.ndarray]:
    """Convert an Arrow/pandas ring payload (list/object-array of rings, each
    a list/object-array of [x, y]) into contiguous (n, 2) float64 arrays."""
    out = []
    for ring in rings_obj:
        arr = np.asarray(ring)
        if arr.dtype == object:  # ragged object array from Arrow → stack
            arr = np.stack([np.asarray(p, dtype=np.float64) for p in ring])
        out.append(np.ascontiguousarray(arr, dtype=np.float64).reshape(-1, 2))
    return out


def rings_envelope(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    ext = rings[0]
    return (
        float(ext[:, 0].min()),
        float(ext[:, 1].min()),
        float(ext[:, 0].max()),
        float(ext[:, 1].max()),
    )


# ---------------------------------------------------------------------------
# Minimal WKB codec (ISO WKB, little-endian) — the `ogc.wkb` Arrow convention
# of ogrlayerarrow.cpp:720-768. Point / Polygon / MultiPolygon only (engine
# scope); used at table boundaries, never in hot kernels.
# ---------------------------------------------------------------------------

_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        out.append(struct.pack("<I", ring.shape[0]))
        out.append(np.ascontiguousarray(ring, dtype="<f8").tobytes())
    return b"".join(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


_WKB_LINESTRING = 2
_WKB25D_BIT = 0x80000000  # legacy 2.5D flag (ogr_core.h wkb25DBit)


def wkb_point_z(x: float, y: float, z: float) -> bytes:
    """ISO WKB Point Z (type 1001, ogr_core.h:426-494 wkbPointZ)."""
    return struct.pack("<BIddd", 1, 1000 + _WKB_POINT, x, y, z)


def wkb_linestring_z(coords: np.ndarray) -> bytes:
    """ISO WKB LineString Z (type 1002); coords (n, 3)."""
    return (struct.pack("<BII", 1, 1000 + _WKB_LINESTRING, coords.shape[0])
            + np.ascontiguousarray(coords, dtype="<f8").tobytes())


def parse_wkb(buf: bytes):
    """Parse Point/LineString/Polygon/MultiPolygon WKB → ('point', (x, y)) |
    ('polygon', [rings]) | ('multipolygon', [[rings], ...]); Z geometries
    (ISO +1000 block or the legacy wkb25DBit flag, ogr_core.h:426-494)
    return ('point_z', (x, y, z)) / ('linestring_z', (n, 3) array)."""
    kind, rings, offset = _parse_wkb_at(buf, 0)
    return kind, rings


def _wkb_has_z(geom_type: int) -> bool:
    # legacy 2.5D bit OR the ISO Z (1000) / ZM (3000) blocks
    if geom_type & _WKB25D_BIT:
        return True
    block = (geom_type & 0x7FFFFFFF) // 1000
    return block in (1, 3)


def _parse_wkb_at(buf: bytes, off: int):
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (geom_type,) = struct.unpack_from(endian + "I", buf, off + 1)
    off += 5
    has_z = _wkb_has_z(geom_type)
    base_type = (geom_type & 0x7FFFFFFF) % 1000  # strip Z/M/ZM blocks
    if base_type == _WKB_POINT and has_z:
        x, y, z = struct.unpack_from(endian + "ddd", buf, off)
        return "point_z", (x, y, z), off + 24
    if base_type == _WKB_POINT:
        x, y = struct.unpack_from(endian + "dd", buf, off)
        return "point", (x, y), off + 16
    if base_type == _WKB_LINESTRING:
        dim = 3 if has_z else 2
        (n_pts,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        pts = np.frombuffer(
            buf, dtype=endian + "f8", count=n_pts * dim, offset=off
        ).reshape(n_pts, dim).copy()
        off += n_pts * dim * 8
        return ("linestring_z" if has_z else "linestring"), pts, off
    if base_type == _WKB_POLYGON:
        (n_rings,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(n_rings):
            (n_pts,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            pts = np.frombuffer(buf, dtype=endian + "f8", count=n_pts * 2, offset=off)
            rings.append(pts.reshape(n_pts, 2).copy())
            off += n_pts * 16
        return "polygon", rings, off
    if base_type == _WKB_MULTIPOLYGON:
        (n_polys,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        polys = []
        for _ in range(n_polys):
            _, rings, off = _parse_wkb_at(buf, off)
            polys.append(rings)
        return "multipolygon", polys, off
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


# ---------------------------------------------------------------------------
# 3D (2.5D) distance — OGR_G_Distance3D / OGRGeometry::Distance3D semantics
# (ogrgeometry.cpp:3941: euclidean 3D distance via SFCGAL; both inputs must
# be 3D or the reference returns -1).  Point↔point and point↔linestring-Z
# kernels, squared-distance cascade with one final sqrt.
# ---------------------------------------------------------------------------

def point_line_min_d2_3d(pts: np.ndarray, line: np.ndarray) -> np.ndarray:
    """min over segments of 3D point→segment squared distance; pts (n,3),
    line (m,3).  Mirrors the SQL oracle expression order exactly."""
    ax, ay, az = line[:-1, 0], line[:-1, 1], line[:-1, 2]
    dx = line[1:, 0] - line[:-1, 0]
    dy = line[1:, 1] - line[:-1, 1]
    dz = line[1:, 2] - line[:-1, 2]
    len2 = dx * dx + dy * dy + dz * dz
    px, py, pz = pts[:, None, 0], pts[:, None, 1], pts[:, None, 2]
    num = (px - ax) * dx + (py - ay) * dy + (pz - az) * dz
    with np.errstate(divide="ignore", invalid="ignore"):
        t = num / len2
    t = np.where(len2 > 0, np.clip(t, 0.0, 1.0), 0.0)
    ex = px - (ax + t * dx)
    ey = py - (ay + t * dy)
    ez = pz - (az + t * dz)
    return (ex * ex + ey * ey + ez * ez).min(axis=1)


def distance3d_point_point(a, b) -> float:
    dx, dy, dz = a[0] - b[0], a[1] - b[1], a[2] - b[2]
    return float(np.sqrt(dx * dx + dy * dy + dz * dz))


# ---------------------------------------------------------------------------
# WKT writer/parser (OGR_GEOM_WKT special field, ogr/ogr_p.h:169; exportToWkt
# semantics for Point/Polygon). Coordinates use repr() shortest round-trip
# formatting — deterministic and exact.
# ---------------------------------------------------------------------------

def _fmt(v: float) -> str:
    r = repr(float(v))
    return r[:-2] if r.endswith(".0") else r


def wkt_point(x: float, y: float) -> str:
    return f"POINT ({_fmt(x)} {_fmt(y)})"


def wkt_polygon(rings: list[np.ndarray]) -> str:
    parts = []
    for ring in rings:
        pts = ", ".join(f"{_fmt(p[0])} {_fmt(p[1])}" for p in ring)
        parts.append(f"({pts})")
    return "POLYGON (" + ", ".join(parts) + ")"


def parse_wkt(text: str):
    """Parse POINT/POLYGON WKT back to ('point', (x, y)) | ('polygon', rings)."""
    s = text.strip()
    if s.upper().startswith("POINT"):
        body = s[s.index("(") + 1:s.rindex(")")]
        x, y = body.split()
        return "point", (float(x), float(y))
    if s.upper().startswith("POLYGON"):
        body = s[s.index("(") + 1:s.rindex(")")]
        rings = []
        depth = 0
        cur = ""
        for ch in body:
            if ch == "(":
                depth += 1
                cur = ""
            elif ch == ")":
                depth -= 1
                pts = [
                    [float(v) for v in p.split()]
                    for p in cur.split(",") if p.strip()
                ]
                rings.append(np.asarray(pts, dtype=np.float64))
            elif depth == 1:
                cur += ch
        return "polygon", rings
    raise ValueError(f"unsupported WKT: {s[:30]}")


# ---------------------------------------------------------------------------
# Polygon↔polygon relate (Intersects/Touches/Overlaps/Contains/Within/Equals)
# — semantics of OGRGeometry::Intersects/Touches/... (ogr/ogrgeometry.cpp:
# 571,6002-6402, GEOS-backed in the reference); implemented here as exact
# float64 orientation tests + crossing-number containment, no GEOS.
# ---------------------------------------------------------------------------

def polygon_edges(rings: list[np.ndarray]) -> np.ndarray:
    """All boundary edges of a polygon (exterior + holes) as (E, 2, 2)."""
    segs = []
    for ring in rings:
        if ring.shape[0] < 2:
            continue
        a = ring[:-1]
        b = ring[1:]
        keep = ~((a[:, 0] == b[:, 0]) & (a[:, 1] == b[:, 1]))
        if keep.any():
            segs.append(np.stack([a[keep], b[keep]], axis=1))
    if not segs:
        return np.zeros((0, 2, 2))
    return np.concatenate(segs, axis=0)


def segments_relate(ea: np.ndarray, eb: np.ndarray) -> tuple[bool, bool]:
    """(any_intersection, any_proper_crossing) between two edge sets.

    Exact classical orientation test with full degenerate handling:
    proper = strict transversal crossing (interior of both segments);
    intersection additionally covers endpoint touches and collinear
    overlaps (closed-segment semantics).
    """
    if ea.shape[0] == 0 or eb.shape[0] == 0:
        return False, False
    a1 = ea[:, None, 0, :]  # (Ea, 1, 2)
    a2 = ea[:, None, 1, :]
    b1 = eb[None, :, 0, :]  # (1, Eb, 2)
    b2 = eb[None, :, 1, :]

    def cross(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    o1 = cross(b2 - b1, a1 - b1)
    o2 = cross(b2 - b1, a2 - b1)
    o3 = cross(a2 - a1, b1 - a1)
    o4 = cross(a2 - a1, b2 - a1)
    proper = ((o1 > 0) & (o2 < 0) | (o1 < 0) & (o2 > 0)) & (
        (o3 > 0) & (o4 < 0) | (o3 < 0) & (o4 > 0)
    )

    def on_seg(p, q, r):
        """q (known collinear with p-r) lies within closed segment p-r."""
        return (
            (q[..., 0] >= np.minimum(p[..., 0], r[..., 0]))
            & (q[..., 0] <= np.maximum(p[..., 0], r[..., 0]))
            & (q[..., 1] >= np.minimum(p[..., 1], r[..., 1]))
            & (q[..., 1] <= np.maximum(p[..., 1], r[..., 1]))
        )

    touch = (
        ((o1 == 0) & on_seg(b1, a1, b2))
        | ((o2 == 0) & on_seg(b1, a2, b2))
        | ((o3 == 0) & on_seg(a1, b1, a2))
        | ((o4 == 0) & on_seg(a1, b2, a2))
    )
    inter = proper | touch
    return bool(inter.any()), bool(proper.any())


def interior_point(rings: list[np.ndarray]) -> tuple[float, float]:
    """A point strictly inside the polygon (holes respected) — the classic
    point-on-surface scanline: pick a horizontal y* that avoids every vertex
    y (widest gap of the sorted unique ys), intersect all edges with it, and
    take the midpoint of the first crossing interval (even-odd ⇒ interior)."""
    ys = np.unique(np.concatenate([r[:, 1] for r in rings]))
    if ys.shape[0] < 2:
        r0 = rings[0]
        return float(r0[0, 0]), float(r0[0, 1])
    gaps = np.diff(ys)
    g = int(np.argmax(gaps))
    y_star = float((ys[g] + ys[g + 1]) / 2.0)
    xs = []
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        straddle = ((y1 < y_star) & (y2 > y_star)) | ((y2 < y_star) & (y1 > y_star))
        if straddle.any():
            t = (y_star - y1[straddle]) / (y2[straddle] - y1[straddle])
            xs.append(x1[straddle] + t * (x2[straddle] - x1[straddle]))
    if not xs:
        r0 = rings[0]
        return float(r0[:, 0].mean()), float(r0[:, 1].mean())
    xs = np.sort(np.concatenate(xs))
    return float((xs[0] + xs[1]) / 2.0), y_star


def _closure_contains(rings: list[np.ndarray], px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """closure(polygon) membership: strict interior OR on any ring boundary."""
    inside = points_in_polygon(px, py, rings, boundary_is_inside=False)
    on_b = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        on_b |= points_on_ring_boundary(px, py, ring)
    return inside | on_b


def _poly_in_poly(inner: list[np.ndarray], outer: list[np.ndarray],
                  edges_inner: np.ndarray, proper: bool) -> bool:
    """closure(inner) ⊆ closure(outer): every inner vertex AND edge midpoint
    in closure(outer), no proper boundary crossing, and inner's interior
    representative inside closure(outer) (guards the fills-a-hole case)."""
    if proper:
        return False
    vx = np.concatenate([r[:, 0] for r in inner])
    vy = np.concatenate([r[:, 1] for r in inner])
    if not _closure_contains(outer, vx, vy).all():
        return False
    mid = edges_inner.mean(axis=1)  # (E, 2) midpoints
    if mid.shape[0] and not _closure_contains(outer, mid[:, 0], mid[:, 1]).all():
        return False
    ipx, ipy = interior_point(inner)
    return bool(
        _closure_contains(outer, np.array([ipx]), np.array([ipy]))[0]
    )


def relate_polygons(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> dict:
    """Full predicate set between two polygons (holes supported).

    Returns dict(intersects, touches, overlaps, contains, within, equals)
    with OGC semantics: contains = A ⊇ B, within = A ⊆ B; touches = boundary
    contact without interior overlap; overlaps = interiors intersect with
    neither containment."""
    ea = polygon_edges(rings_a)
    eb = polygon_edges(rings_b)
    bb, proper = segments_relate(ea, eb)

    avx = np.concatenate([r[:, 0] for r in rings_a])
    avy = np.concatenate([r[:, 1] for r in rings_a])
    bvx = np.concatenate([r[:, 0] for r in rings_b])
    bvy = np.concatenate([r[:, 1] for r in rings_b])
    a_v_in_b = points_in_polygon(avx, avy, rings_b).any()
    b_v_in_a = points_in_polygon(bvx, bvy, rings_a).any()
    ii = proper or bool(a_v_in_b) or bool(b_v_in_a)
    if not ii:
        # edge MIDPOINTS: an edge can pass through the other's interior
        # with both endpoints on its boundary (e.g. two offset rects whose
        # vertical edges end on each other's horizontal edges) — no proper
        # crossing, no strict-inside vertex
        mid_a = ea.mean(axis=1)
        mid_b = eb.mean(axis=1)
        ii = bool(
            points_in_polygon(mid_a[:, 0], mid_a[:, 1], rings_b).any()
        ) or bool(
            points_in_polygon(mid_b[:, 0], mid_b[:, 1], rings_a).any()
        )
    if not ii:
        ipa = interior_point(rings_a)
        ipb = interior_point(rings_b)
        ii = bool(
            points_in_polygon(
                np.array([ipa[0]]), np.array([ipa[1]]), rings_b
            )[0]
        ) or bool(
            points_in_polygon(
                np.array([ipb[0]]), np.array([ipb[1]]), rings_a
            )[0]
        )
    contains = ii and _poly_in_poly(rings_b, rings_a, eb, proper)
    within = ii and _poly_in_poly(rings_a, rings_b, ea, proper)
    return {
        "intersects": bb or ii,
        "touches": bb and not ii,
        "overlaps": ii and not contains and not within,
        "contains": contains,
        "within": within,
        "equals": contains and within,
    }


# ---------------------------------------------------------------------------
# Full DE-9IM matrix (OGR_G_Relate / OGRGeometry::Relate,
# ogr/ogrgeometry.cpp:6494 → GEOSRelate) for areal×areal inputs.
# ---------------------------------------------------------------------------

def _noded_probes(
    edges_src: np.ndarray, edges_other: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Probe points covering the whole src boundary after noding: every src
    edge is split at each intersection with the other edge set; returned
    points are all split vertices plus every sub-edge midpoint.  A boundary
    ⊆ S statement checked on these probes is exact for straight-edge
    geometries: between consecutive nodes the edge cannot cross ∂S, so the
    midpoint's classification holds for the whole sub-edge."""
    pts = []
    for k in range(edges_src.shape[0]):
        p = edges_src[k, 0]
        r = edges_src[k, 1]
        d = r - p
        ts = [0.0, 1.0]
        if edges_other.shape[0]:
            q = edges_other[:, 0, :]
            s = edges_other[:, 1, :]
            e = s - q
            w = q - p
            denom = d[0] * e[:, 1] - d[1] * e[:, 0]
            wxd = w[:, 0] * d[1] - w[:, 1] * d[0]
            nonpar = denom != 0.0
            if nonpar.any():
                t = (
                    w[nonpar, 0] * e[nonpar, 1] - w[nonpar, 1] * e[nonpar, 0]
                ) / denom[nonpar]
                u = wxd[nonpar] / denom[nonpar]
                ok = (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
                ts.extend(t[ok].tolist())
            coll = (~nonpar) & (wxd == 0.0)
            dd = float(d @ d)
            if coll.any() and dd > 0.0:
                tq = ((q[coll] - p) @ d) / dd
                tsx = ((s[coll] - p) @ d) / dd
                lo = np.maximum(np.minimum(tq, tsx), 0.0)
                hi = np.minimum(np.maximum(tq, tsx), 1.0)
                keep = lo <= hi
                ts.extend(lo[keep].tolist())
                ts.extend(hi[keep].tolist())
        tv = np.unique(np.clip(np.asarray(ts, dtype=np.float64), 0.0, 1.0))
        allt = np.concatenate([tv, (tv[:-1] + tv[1:]) / 2.0])
        pts.append(p[None, :] + allt[:, None] * d[None, :])
    if not pts:
        return np.zeros(0), np.zeros(0)
    out = np.concatenate(pts, axis=0)
    return out[:, 0], out[:, 1]


def _collinear_overlap(ea: np.ndarray, eb: np.ndarray) -> bool:
    """True iff the two edge sets share a positive-length collinear piece
    (dim-1 boundary∩boundary)."""
    if ea.shape[0] == 0 or eb.shape[0] == 0:
        return False
    a1 = ea[:, None, 0, :]
    a2 = ea[:, None, 1, :]
    b1 = eb[None, :, 0, :]
    b2 = eb[None, :, 1, :]
    da = a2 - a1
    db = b2 - b1
    crs = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    w = b1 - a1
    wxd = w[..., 0] * da[..., 1] - w[..., 1] * da[..., 0]
    dd = (da * da).sum(axis=-1)
    coll = (crs == 0.0) & (wxd == 0.0) & (dd > 0.0)
    if not coll.any():
        return False
    t1 = ((b1 - a1) * da).sum(axis=-1) / np.where(dd == 0.0, 1.0, dd)
    t2 = ((b2 - a1) * da).sum(axis=-1) / np.where(dd == 0.0, 1.0, dd)
    lo = np.maximum(np.minimum(t1, t2), 0.0)
    hi = np.minimum(np.maximum(t1, t2), 1.0)
    return bool(((hi - lo > 0.0) & coll).any())


def _hole_rep_strictly_inside(
    holes: list[np.ndarray], target: list[np.ndarray]
) -> bool:
    """Any hole's interior representative strictly inside ``target`` — the
    fills-a-hole violation of int(A) ⊆ closure(B)."""
    for h in holes:
        hx, hy = interior_point([h])
        if bool(points_in_polygon(
            np.array([hx]), np.array([hy]), target
        )[0]):
            return True
    return False


def de9im_polygons(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> str:
    """The 9-char DE-9IM pattern of two valid polygons (holes supported),
    OGC cell order II IB IE / BI BB BE / EI EB EE.

    Dimension shortcuts that hold for valid areal geometry: interiors are
    open sets, so interior∩interior and interior∩exterior are 2 or F; a
    boundary curve meets an open set in open arcs, so boundary∩interior and
    boundary∩exterior are 1 or F; only boundary∩boundary ranges over
    {F, 0, 1} (isolated touch points vs shared collinear stretches)."""
    ea = polygon_edges(rings_a)
    eb = polygon_edges(rings_b)
    rel = relate_polygons(rings_a, rings_b)
    ii = rel["intersects"] and not rel["touches"]

    pax, pay = _noded_probes(ea, eb)   # ∂A probes noded against ∂B
    pbx, pby = _noded_probes(eb, ea)
    bndB_in_intA = bool(points_in_polygon(pbx, pby, rings_a).any())
    bndA_in_intB = bool(points_in_polygon(pax, pay, rings_b).any())
    bndA_in_clB = bool(_closure_contains(rings_b, pax, pay).all())
    bndB_in_clA = bool(_closure_contains(rings_a, pbx, pby).all())
    bb_touch, _ = segments_relate(ea, eb)
    bb_dim1 = _collinear_overlap(ea, eb)

    within_ab = rel["within"] and not _hole_rep_strictly_inside(
        rings_b[1:], rings_a
    )
    within_ba = rel["contains"] and not _hole_rep_strictly_inside(
        rings_a[1:], rings_b
    )
    ii = ii or bndB_in_intA or bndA_in_intB

    return "".join([
        "2" if ii else "F",
        "1" if bndB_in_intA else "F",
        "F" if within_ab else "2",
        "1" if bndA_in_intB else "F",
        "1" if bb_dim1 else ("0" if bb_touch else "F"),
        "F" if bndA_in_clB else "1",
        "F" if within_ba else "2",
        "F" if bndB_in_clA else "1",
        "2",
    ])


# ---------------------------------------------------------------------------
# LineString ↔ Polygon predicates (OGRGeometry::Intersects/Crosses/Touches/
# Within for line/area pairs, ogr/ogrgeometry.cpp:571+ → GEOS) via the same
# noded-probe machinery as the DE-9IM kernel.
# ---------------------------------------------------------------------------

def line_edges(coords: np.ndarray) -> np.ndarray:
    """Polyline vertices (N, 2) → edge set (N-1, 2, 2), zero-length edges
    dropped."""
    a = coords[:-1]
    b = coords[1:]
    keep = ~((a[:, 0] == b[:, 0]) & (a[:, 1] == b[:, 1]))
    if not keep.any():
        return np.zeros((0, 2, 2))
    return np.stack([a[keep], b[keep]], axis=1)


def relate_line_polygon(
    coords: np.ndarray, rings: list[np.ndarray]
) -> dict:
    """Line/area predicate set with OGC dimension semantics: ``crosses`` =
    the line has positive length in the interior AND in the exterior;
    ``within`` = positive interior length, none exterior; ``touches`` =
    boundary-only contact.  Probes are the noded sub-edge midpoints plus
    vertices, so every sub-segment's side of ∂polygon is sampled exactly
    once — exact for straight-edge inputs."""
    le = line_edges(coords)
    pe = polygon_edges(rings)
    px, py = _noded_probes(le, pe)
    strict_in = points_in_polygon(px, py, rings)
    on_b = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        on_b |= points_on_ring_boundary(px, py, ring)
    outside = ~(strict_in | on_b)
    interior_any = bool(strict_in.any())
    contact = interior_any or bool(on_b.any())
    return {
        "intersects": contact,
        "crosses": interior_any and bool(outside.any()),
        "within": interior_any and not bool(outside.any()),
        "touches": contact and not interior_any,
    }


def clip_segment_rect(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray,
    xmin: float, ymin: float, xmax: float, ymax: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized Liang–Barsky: per segment the clipped endpoints + a keep
    mask (closed-rect contact with positive or zero length).  Segments
    entirely outside get keep=False."""
    dx = x2 - x1
    dy = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        tx1 = (xmin - x1) / dx
        tx2 = (xmax - x1) / dx
        ty1 = (ymin - y1) / dy
        ty2 = (ymax - y1) / dy
    in_x = (x1 >= xmin) & (x1 <= xmax)
    in_y = (y1 >= ymin) & (y1 <= ymax)
    # degenerate axis: inside → unbounded interval, outside → EMPTY
    # (lo=+inf > hi=-inf) — never re-order the empty pair
    lox = np.where(dx != 0.0, np.minimum(tx1, tx2),
                   np.where(in_x, -np.inf, np.inf))
    hix = np.where(dx != 0.0, np.maximum(tx1, tx2),
                   np.where(in_x, np.inf, -np.inf))
    loy = np.where(dy != 0.0, np.minimum(ty1, ty2),
                   np.where(in_y, -np.inf, np.inf))
    hiy = np.where(dy != 0.0, np.maximum(ty1, ty2),
                   np.where(in_y, np.inf, -np.inf))
    t_enter = np.maximum.reduce([lox, loy, np.zeros_like(x1)])
    t_exit = np.minimum.reduce([hix, hiy, np.ones_like(x1)])
    keep = t_enter <= t_exit
    with np.errstate(invalid="ignore"):  # dropped rows: inf·0 → nan, masked
        cx1 = x1 + t_enter * dx
        cy1 = y1 + t_enter * dy
        cx2 = x1 + t_exit * dx
        cy2 = y1 + t_exit * dy
    return cx1, cy1, cx2, cy2, keep


# ---------------------------------------------------------------------------
# Axis-aligned rectangle clip (Sutherland–Hodgman) — the clip MVP of
# OGRLayer::Clip (ogr/ogrlayer.cpp:7538) / `gdal vector clip`
# (apps/gdalalg_vector_clip.cpp) for rectangular clip geometries.
# ---------------------------------------------------------------------------

def clip_ring_rect(ring: np.ndarray, xmin: float, ymin: float,
                   xmax: float, ymax: float) -> np.ndarray:
    """Sutherland–Hodgman clip of one closed ring against an axis box.
    Returns a closed ring (first == last) or an empty (0, 2) array."""
    pts = ring[:-1] if ring.shape[0] > 1 and (ring[0] == ring[-1]).all() else ring
    for side in range(4):
        if pts.shape[0] == 0:
            break
        x, y = pts[:, 0], pts[:, 1]
        if side == 0:
            inside = x >= xmin
        elif side == 1:
            inside = x <= xmax
        elif side == 2:
            inside = y >= ymin
        else:
            inside = y <= ymax
        nxt = np.roll(pts, -1, axis=0)
        nxt_inside = np.roll(inside, -1)
        out = []
        for i in range(pts.shape[0]):
            p, q = pts[i], nxt[i]
            pi, qi = inside[i], nxt_inside[i]
            if pi:
                out.append(p)
            if pi != qi:  # edge crosses the clip line → add intersection
                if side < 2:
                    edge = xmin if side == 0 else xmax
                    t = (edge - p[0]) / (q[0] - p[0])
                    out.append(np.array([edge, p[1] + t * (q[1] - p[1])]))
                else:
                    edge = ymin if side == 2 else ymax
                    t = (edge - p[1]) / (q[1] - p[1])
                    out.append(np.array([p[0] + t * (q[0] - p[0]), edge]))
        pts = np.array(out) if out else np.zeros((0, 2))
    if pts.shape[0] < 3:
        return np.zeros((0, 2))
    return np.vstack([pts, pts[:1]])


def clip_rings_rect(rings: list[np.ndarray], xmin: float, ymin: float,
                    xmax: float, ymax: float) -> list[np.ndarray]:
    """Clip every ring (exterior + holes) against the box; empty rings are
    dropped. If the exterior vanishes the whole polygon is empty."""
    out = []
    for i, ring in enumerate(rings):
        c = clip_ring_rect(ring, xmin, ymin, xmax, ymax)
        if i == 0 and c.shape[0] == 0:
            return []
        if c.shape[0] > 0:
            out.append(c)
    return out


def erase_rings_rect(rings: list[np.ndarray], xmin: float, ymin: float,
                     xmax: float, ymax: float) -> list[list[np.ndarray]]:
    """Difference polygon − axis box as a list of INTERIOR-DISJOINT polygon
    parts, by clipping against the 4-slab decomposition of the box
    complement (west/east slabs full-height of the polygon envelope,
    south/north strips within the box's x-span). The slabs partition the
    envelope outside the box, so Σ area(parts) + area(polygon ∩ box) =
    area(polygon) exactly. Reference semantics: OGRGeometry::Difference
    (ogr/ogrgeometry.cpp:5748) restricted to rectangular subtrahends — the
    GEOS representation would be a holed/multi polygon; the slab partition
    covers the same point set, which is what area/PIP consumers observe."""
    exmin, eymin, exmax, eymax = rings_envelope(rings)
    slabs = []
    if exmin < xmin:
        slabs.append((exmin, eymin, xmin, eymax))
    if exmax > xmax:
        slabs.append((xmax, eymin, exmax, eymax))
    sx0, sx1 = max(exmin, xmin), min(exmax, xmax)
    if sx0 < sx1:
        if eymin < ymin:
            slabs.append((sx0, eymin, sx1, ymin))
        if eymax > ymax:
            slabs.append((sx0, ymax, sx1, eymax))
    parts = []
    for (x0, y0, x1, y1) in slabs:
        c = clip_rings_rect(rings, x0, y0, x1, y1)
        if c and rings_area(c) > 0.0:
            parts.append(c)
    return parts


def rings_area(rings: list[np.ndarray]) -> float:
    """|shoelace(exterior)| − Σ|shoelace(holes)| (planar area)."""
    total = 0.0
    for k, ring in enumerate(rings):
        if ring.shape[0] < 4:
            continue
        x, y = ring[:, 0], ring[:, 1]
        a = 0.5 * abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))
        total += a if k == 0 else -a
    return total


def points_in_ring_winding(px: np.ndarray, py: np.ndarray,
                           ring: np.ndarray) -> np.ndarray:
    """Winding-number point-in-ring test (the north rule's fallback for
    geometries where even-odd parity misleads, e.g. self-overlapping rings):
    wn != 0 ⇒ inside. Vectorized (M, N) orientation form of the classic
    Sunday algorithm; agrees with the crossing-number kernel on simple
    rings (property-tested)."""
    if ring.shape[0] < 4:
        return np.zeros(px.shape[0], dtype=bool)
    x1, y1 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x2, y2 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    pxc, pyc = px[:, None], py[:, None]
    is_left = (x2 - x1) * (pyc - y1) - (pxc - x1) * (y2 - y1)
    up = (y1 <= pyc) & (y2 > pyc) & (is_left > 0)
    dn = (y1 > pyc) & (y2 <= pyc) & (is_left < 0)
    wn = up.sum(axis=1).astype(np.int64) - dn.sum(axis=1)
    return wn != 0


def points_in_polygon_winding(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Polygon membership by winding number: exterior wn != 0 and not
    strictly inside any hole (boundary handled as in points_in_polygon)."""
    inside = points_in_ring_winding(px, py, rings[0])
    on_ext = points_on_ring_boundary(px, py, rings[0])
    inside = inside & ~on_ext
    for hole in rings[1:]:
        in_hole = points_in_ring_winding(px, py, hole)
        on_hole = points_on_ring_boundary(px, py, hole)
        inside = inside & ~in_hole & ~on_hole
    return inside


def geojson_polygon(rings: list[np.ndarray]) -> str:
    """GeoJSON Polygon geometry string (RFC 7946; the ogr GeoJSON writer
    surface, ogrgeojsonwriter.cpp) — repr-float formatting, no whitespace."""
    ring_strs = []
    for ring in rings:
        pts = ",".join(f"[{_fmt(p[0])},{_fmt(p[1])}]" for p in ring)
        ring_strs.append(f"[{pts}]")
    return '{"type":"Polygon","coordinates":[' + ",".join(ring_strs) + "]}"


# ---------------------------------------------------------------------------
# MakeValid — self-intersection repair (OGRGeometry::MakeValid,
# ogr/ogrgeometry.cpp:4176; GEOS MakeValid "linework" semantics for the
# bowtie/figure-eight class: node the self-crossings, re-trace SIMPLE
# rings, re-orient lobes, regroup holes)
# ---------------------------------------------------------------------------

def _node_ring_self(ring: np.ndarray) -> np.ndarray:
    """Insert proper self-intersection points as vertices (each crossing
    point is computed ONCE and spliced into both segments bit-identically,
    so the downstream tracer sees one shared vertex)."""
    pts = np.asarray(ring, dtype=np.float64)
    n = pts.shape[0] - 1  # closed ring: last == first
    inserts: dict[int, list] = {}
    for i in range(n):
        p, r = pts[i], pts[i + 1] - pts[i]
        for j in range(i + 1, n):
            if j == i or (i == 0 and j == n - 1) or j == i + 1:
                continue  # adjacent segments share an endpoint, skip
            q, s = pts[j], pts[j + 1] - pts[j]
            denom = r[0] * s[1] - r[1] * s[0]
            if denom == 0.0:
                continue
            t = ((q[0] - p[0]) * s[1] - (q[1] - p[1]) * s[0]) / denom
            u = ((q[0] - p[0]) * r[1] - (q[1] - p[1]) * r[0]) / denom
            if 0.0 < t < 1.0 and 0.0 < u < 1.0:
                x = (p[0] + t * r[0], p[1] + t * r[1])
                inserts.setdefault(i, []).append((t, x))
                inserts.setdefault(j, []).append((u, x))
    if not inserts:
        return pts
    out = []
    for i in range(n):
        out.append((float(pts[i, 0]), float(pts[i, 1])))
        for _t, x in sorted(inserts.get(i, []), key=lambda e: e[0]):
            out.append(x)
    out.append(out[0])
    return np.array(out, dtype=np.float64)


def _ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cr = x * y2 - x2 * y
    a = cr.sum() / 2.0
    if a == 0.0:
        return float(x.mean()), float(y.mean())
    cx = ((x + x2) * cr).sum() / (6.0 * a)
    cy = ((y + y2) * cr).sum() / (6.0 * a)
    return float(cx), float(cy)


def make_valid(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Repair a polygon whose rings self-intersect (bowtie class): node the
    crossings, trace SIMPLE rings (the coverage tracer's pinch-split walk),
    then classify by containment depth of each ring's centroid — even depth
    ⇒ an outer lobe (re-oriented CCW), odd ⇒ a hole of its immediate
    parent (oriented CW). Returns a list of polygon parts (each a ring
    list), i.e. the MultiPolygon GEOS MakeValid produces for a figure
    eight. Valid input passes through with the same decomposition.
    Centroid-in-ring depth classification assumes lobes contain their own
    centroid (true for the bowtie/pinch class; not for pathological
    spirals — documented MVP bound)."""
    from gdal_spark.operators.dissolve import union_coverage_rings

    noded = [_node_ring_self(r) for r in rings]
    simple = union_coverage_rings([noded])
    if not simple:
        return []
    cents = [_ring_centroid(r) for r in simple]
    areas = [
        0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
        for r in simple
    ]
    px = np.array([c[0] for c in cents])
    py = np.array([c[1] for c in cents])
    depth = np.zeros(len(simple), dtype=np.int64)
    parent = [-1] * len(simple)
    for k, r in enumerate(simple):
        mask = np.ones(len(simple), dtype=bool)
        mask[k] = False
        inside = points_in_ring(px, py, r) & mask
        for m in np.nonzero(inside)[0]:
            depth[m] += 1
            # immediate parent = smallest containing ring by |area|
            if parent[m] < 0 or abs(areas[k]) < abs(areas[parent[m]]):
                parent[m] = k
    parts: dict[int, list] = {}
    order = []
    for k in range(len(simple)):
        if depth[k] % 2 == 0:
            ring = simple[k] if areas[k] > 0 else simple[k][::-1].copy()
            parts[k] = [ring]
            order.append(k)
    for k in range(len(simple)):
        if depth[k] % 2 == 1 and parent[k] in parts:
            hole = simple[k] if areas[k] < 0 else simple[k][::-1].copy()
            parts[parent[k]].append(hole)
    return [parts[k] for k in order]


def clip_ring_halfplane(
    ring: np.ndarray, a: float, b: float, c: float
) -> np.ndarray:
    """Sutherland–Hodgman step against an arbitrary half-plane
    a·x + b·y ≤ c.  Input/output closed rings; returns an empty (0, 2)
    array when nothing survives."""
    if ring.shape[0] < 4:
        return np.zeros((0, 2))
    pts = ring[:-1]
    f = a * pts[:, 0] + b * pts[:, 1] - c
    out = []
    n = pts.shape[0]
    for i in range(n):
        p, fp = pts[i], f[i]
        q, fq = pts[(i + 1) % n], f[(i + 1) % n]
        if fp <= 0.0:
            out.append(p)
        if (fp < 0.0 < fq) or (fq < 0.0 < fp):
            t = fp / (fp - fq)
            out.append(p + t * (q - p))
    if len(out) < 3:
        return np.zeros((0, 2))
    arr = np.asarray(out)
    return np.vstack([arr, arr[:1]])


# ---------------------------------------------------------------------------
# Geometry transforms — OGRGeometry::swapXY (ogrpoint.cpp / ogrcurve.cpp
# swapXY), OGR_G_FlattenTo2D (flattenTo2D: drop Z, clear the 3D flag) and
# ogrgeometryfactory.cpp forceToMultiPoint / forceToMultiLineString /
# forceToMultiPolygon (wrap a single geometry in its multi container;
# already-multi input is returned unchanged).  All operate WKB→WKB so they
# compose with every codec path.
# ---------------------------------------------------------------------------

_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5


def _encode_wkb(kind: str, data) -> bytes:
    if kind == "point":
        return wkb_point(*data)
    if kind == "point_z":
        return wkb_point_z(*data)
    if kind == "linestring":
        pts = np.asarray(data, dtype="<f8")
        return (struct.pack("<BII", 1, _WKB_LINESTRING, pts.shape[0])
                + np.ascontiguousarray(pts).tobytes())
    if kind == "linestring_z":
        return wkb_linestring_z(np.asarray(data))
    if kind == "polygon":
        return wkb_polygon(data)
    if kind == "multipolygon":
        return wkb_multipolygon(data)
    if kind == "multipoint":
        pts = np.asarray(data, dtype=np.float64)
        return (struct.pack("<BII", 1, _WKB_MULTIPOINT, pts.shape[0])
                + b"".join(wkb_point(x, y) for x, y in pts))
    if kind == "multilinestring":
        return (struct.pack("<BII", 1, _WKB_MULTILINESTRING, len(data))
                + b"".join(_encode_wkb("linestring", ls) for ls in data))
    raise ValueError(f"cannot encode {kind}")


def wkb_swap_xy(buf: bytes) -> bytes:
    """OGRGeometry::swapXY at the WKB level (Z rides along unchanged)."""
    kind, data = parse_wkb(buf)
    if kind == "point":
        return _encode_wkb(kind, (data[1], data[0]))
    if kind == "point_z":
        return _encode_wkb(kind, (data[1], data[0], data[2]))
    if kind in ("linestring", "linestring_z"):
        pts = np.asarray(data).copy()
        pts[:, [0, 1]] = pts[:, [1, 0]]
        return _encode_wkb(kind, pts)
    if kind == "polygon":
        return _encode_wkb(kind, [r[:, [1, 0]] for r in data])
    if kind == "multipolygon":
        return _encode_wkb(
            kind, [[r[:, [1, 0]] for r in rings] for rings in data])
    raise ValueError(f"swapXY unsupported for {kind}")


def wkb_flatten_2d(buf: bytes) -> bytes:
    """OGR_G_FlattenTo2D: drop Z ordinates and the 3D type flag."""
    kind, data = parse_wkb(buf)
    if kind == "point_z":
        return wkb_point(data[0], data[1])
    if kind == "linestring_z":
        return _encode_wkb("linestring", np.asarray(data)[:, :2])
    return buf


def wkb_force_multi(buf: bytes) -> bytes:
    """forceToMulti*: wrap a single geometry in its multi container
    (2D path; ogrgeometryfactory.cpp).  Multi input passes through."""
    kind, data = parse_wkb(buf)
    if kind == "point":
        return _encode_wkb("multipoint", [data])
    if kind == "linestring":
        return _encode_wkb("multilinestring", [np.asarray(data)])
    if kind == "polygon":
        return wkb_multipolygon([data])
    return buf


def wkb_geom_type(buf: bytes) -> int:
    """The raw WKB geometry-type word (OGR_G_GetGeometryType)."""
    endian = "<" if buf[0] == 1 else ">"
    return struct.unpack_from(endian + "I", buf, 1)[0]


def check_ring_validity(ring: np.ndarray) -> str:
    """OGC simple-features ring validity check (the compute behind
    ``gdal vector check-geometry``, apps/gdalalg_vector_check_geometry.cpp
    / GEOS IsValidOp): returns 'valid' or the FIRST failing rule in the
    documented check order — unclosed, too_few_points,
    duplicate_points, self_intersection, orientation (exterior must be
    CCW under the engine's convention).  Segment-pair crossing test is
    exact on the proper-intersection predicate (shared endpoints of
    adjacent segments excluded)."""
    r = np.asarray(ring, dtype=np.float64)
    if r.shape[0] < 2 or (r[0] != r[-1]).any():
        return "unclosed"
    if r.shape[0] < 4:
        return "too_few_points"
    if any((r[i] == r[i + 1]).all() for i in range(r.shape[0] - 1)):
        return "duplicate_points"
    n = r.shape[0] - 1
    for i in range(n):
        a, b = r[i], r[i + 1]
        for j in range(i + 1, n):
            if j == i or (i == 0 and j == n - 1) or j == i + 1:
                continue
            c, d = r[j], r[j + 1]
            d1 = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            d2 = (b[0] - a[0]) * (d[1] - a[1]) - (b[1] - a[1]) * (d[0] - a[0])
            d3 = (d[0] - c[0]) * (a[1] - c[1]) - (d[1] - c[1]) * (a[0] - c[0])
            d4 = (d[0] - c[0]) * (b[1] - c[1]) - (d[1] - c[1]) * (b[0] - c[0])
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                return "self_intersection"
    area = 0.5 * float(
        np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
    if area <= 0:
        return "orientation"
    return "valid"
