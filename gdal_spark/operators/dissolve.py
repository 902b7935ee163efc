"""True dissolve: per-key geometry UNION of an edge-matched polygon coverage.

Reference semantics: `gdal vector dissolve` (apps/gdalalg_vector_dissolve.cpp)
— GROUP BY an attribute, geometric union of the group's geometries
(ogrgeometry.cpp:5430 Union, GEOS-backed in the reference).

Spark-first design: the union itself is per-group work — a single shuffle on
the dissolve key (applyInPandas), identical in shape to any keyed aggregate;
1000 executors dissolve 1000 groups concurrently, and group payloads are ring
arrays, not full feature blobs.

Union algorithm (exact, no GEOS): **boundary edge cancellation** — valid for
*edge-matched coverages* (every shared boundary is a full, identical edge in
both polygons — true for tile mosaics, admin coverages after noding, and the
fixture's 8×8 rect mosaic):

1. every ring contributes its directed edges (outers CCW, holes CW);
2. an edge appearing with both orientations is interior → cancelled;
3. remaining edges are traced into closed rings with the leftmost-turn rule
   (so corner-touching cells split into separate parts, matching GEOS'
   MultiPolygon result for point-touching unions);
4. signed shoelace classifies outers (CCW, +) vs holes (CW, −);
   union area = Σ signed areas.

Coverages with T-junctions (partially shared edges) need noding first —
documented limitation of the MVP, as in reference coverage tooling.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.spatial import geometry as G


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def node_coverage_rings(
    rings_list: list[list[np.ndarray]], snap: float = 0.0,
) -> list[list[np.ndarray]]:
    """Coverage NODING — the clean-coverage analog
    (apps/gdalalg_vector_clean_coverage.cpp): make a coverage with
    T-junctions edge-matched by (a) optional snap-rounding of every vertex
    to a ``snap`` grid (stable floor(x/snap + 0.5) rule, 0 = off) and
    (b) splitting every edge at any OTHER vertex lying on its interior.
    After noding, a partially-shared boundary becomes pairs of identical
    sub-edges, so ``union_coverage_rings``' cancellation applies. Crossing
    edges (a non-coverage input) are NOT handled — same contract as the
    reference's coverage tooling.

    Cost: per-edge candidate vertices are pruned by the edge bbox; the
    collinearity test is exact (cross == 0 on snapped coordinates), so no
    tolerance leaks into the cancellation stage."""
    arrs: list[list[np.ndarray]] = []
    verts = set()
    for rings in rings_list:
        pr = []
        for ring in rings:
            a = np.asarray(ring, dtype=np.float64).copy()
            if snap > 0.0:
                a = np.floor(a / snap + 0.5) * snap
            pr.append(a)
            for i in range(a.shape[0] - 1):
                verts.add((float(a[i, 0]), float(a[i, 1])))
        arrs.append(pr)
    V = np.array(sorted(verts), dtype=np.float64)
    out: list[list[np.ndarray]] = []
    for rings in arrs:
        new_rings = []
        for a in rings:
            pts: list[tuple] = []
            for i in range(a.shape[0] - 1):
                p, q = a[i], a[i + 1]
                pts.append((float(p[0]), float(p[1])))
                if (p == q).all():
                    continue
                xmn, xmx = min(p[0], q[0]), max(p[0], q[0])
                ymn, ymx = min(p[1], q[1]), max(p[1], q[1])
                m = (
                    (V[:, 0] >= xmn) & (V[:, 0] <= xmx)
                    & (V[:, 1] >= ymn) & (V[:, 1] <= ymx)
                )
                cand = V[m]
                if cand.shape[0] == 0:
                    continue
                dx, dy = q[0] - p[0], q[1] - p[1]
                cross = dx * (cand[:, 1] - p[1]) - dy * (cand[:, 0] - p[0])
                t = (
                    (cand[:, 0] - p[0]) * dx + (cand[:, 1] - p[1]) * dy
                ) / (dx * dx + dy * dy)
                keep = (cross == 0.0) & (t > 0.0) & (t < 1.0)
                order = np.argsort(t[keep], kind="stable")
                for vx, vy in cand[keep][order]:
                    pts.append((float(vx), float(vy)))
            pts.append((float(a[-1, 0]), float(a[-1, 1])))
            new_rings.append(np.array(pts, dtype=np.float64))
        out.append(new_rings)
    return out


def union_coverage_rings(rings_list: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Union of an edge-matched coverage: list of polygons (each a ring
    list) → union boundary rings (CCW outers, CW holes)."""
    # 1+2: directed-edge multiset with reverse cancellation
    edges: dict[tuple, int] = {}
    for rings in rings_list:
        for ring in rings:
            arr = np.asarray(ring, dtype=np.float64)
            for i in range(arr.shape[0] - 1):
                p = (float(arr[i, 0]), float(arr[i, 1]))
                q = (float(arr[i + 1, 0]), float(arr[i + 1, 1]))
                if p == q:
                    continue
                rev = (q, p)
                if edges.get(rev, 0) > 0:
                    edges[rev] -= 1
                    if edges[rev] == 0:
                        del edges[rev]
                else:
                    edges[(p, q)] = edges.get((p, q), 0) + 1
    return trace_directed_edges(edges)


def trace_directed_edges(edges: dict[tuple, int]) -> list[np.ndarray]:
    """Walk a directed-edge multiset (result interior on the LEFT of every
    edge) into SIMPLE closed rings with the leftmost-turn rule; pinched
    walks split off sub-loops.  Shared by the coverage union and the
    general boolean-overlay boundary selection (spatial/overlay.py)."""
    # adjacency: start point → outgoing edges
    out_map: dict[tuple, list[tuple]] = {}
    for (p, q), cnt in edges.items():
        for _ in range(cnt):
            out_map.setdefault(p, []).append(q)

    def take_leftmost(p: tuple, q: tuple) -> tuple:
        """Consume and return the leftmost-turn successor of edge p→q."""
        cands = out_map[q]
        dx, dy = q[0] - p[0], q[1] - p[1]

        def turn_key(r):
            ex, ey = r[0] - q[0], r[1] - q[1]
            cross = dx * ey - dy * ex
            dot = dx * ex + dy * ey
            # priority: left turn, straight, right turn, U-turn;
            # within a class, sharper left first
            if cross > 0:
                return (0, -np.arctan2(cross, dot))
            if cross == 0 and dot > 0:
                return (1, 0.0)
            if cross < 0:
                return (2, -np.arctan2(cross, dot))
            return (3, 0.0)

        best = min(range(len(cands)), key=lambda i: turn_key(cands[i]))
        return cands.pop(best)

    # 3: trace rings; a walk that revisits a vertex is PINCHED (e.g. two
    # holes or two parts touching at a point) — split the closed loop off
    # as its own SIMPLE ring, exactly the decomposition GEOS produces for
    # point-touching boundaries (OGC validity: rings must be simple).
    rings_out: list[np.ndarray] = []
    while out_map:
        p0 = next(iter(out_map))
        q0 = out_map[p0].pop()
        if not out_map[p0]:
            del out_map[p0]
        ring = [p0, q0]
        seen_at = {p0: 0, q0: 1}
        p, q = p0, q0
        while q != p0:
            r = take_leftmost(p, q)
            if not out_map[q]:
                del out_map[q]
            if r in seen_at and r != p0:
                # close the sub-loop r → ... → q → r as a simple ring
                cut = seen_at[r]
                sub = ring[cut:] + [r]
                rings_out.append(np.array(sub, dtype=np.float64))
                for v in ring[cut + 1:]:
                    seen_at.pop(v, None)
                ring = ring[:cut + 1]
                p, q = q, r
                continue
            ring.append(r)
            seen_at[r] = len(ring) - 1
            p, q = q, r
        ring.append(p0) if ring[-1] != p0 else None
        if len(ring) >= 4:
            rings_out.append(np.array(ring, dtype=np.float64))
    return rings_out


def dissolve_union(
    df: DataFrame, key: str = "eas_id", rings_col: str = "rings",
    node: bool = False, snap: float = 0.0,
) -> DataFrame:
    """Per-key coverage union. Output: (key, n_src, union_area, n_parts,
    n_rings) — n_parts = CCW outer rings, n_rings includes holes.
    ``node=True`` runs T-junction noding (node_coverage_rings) per group
    first, accepting coverages whose shared boundaries are only partially
    matched; ``snap`` additionally snap-rounds vertices to a grid."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rings_list = [G.rings_to_numpy(r) for r in pdf[rings_col]]
        if node:
            rings_list = node_coverage_rings(rings_list, snap=snap)
        merged = union_coverage_rings(rings_list)
        areas = [_ring_signed_area(r) for r in merged]
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_src": [len(rings_list)],
                "union_area": [float(sum(areas))],
                "n_parts": [sum(1 for a in areas if a > 0)],
                "n_rings": [len(merged)],
            }
        )

    schema = (
        f"{key} long, n_src long, union_area double, "
        "n_parts int, n_rings int"
    )
    return df.select(key, rings_col).groupBy(key).applyInPandas(run, schema)
