"""Coverage simplification — ``gdal vector simplify-coverage``.

Reference semantics: apps/gdalalg_vector_simplify_coverage.cpp (GEOS
CoverageSimplifier, Visvalingam–Whyatt area tolerance): simplify the
polygons of an edge-matched coverage WITHOUT introducing gaps or
overlaps, by simplifying every shared boundary chain ONCE and splicing
the identical result into both owning polygons.

Spark-first decomposition (all stages are joins / keyed aggregates —
no driver geometry, no all-pairs):

1. ring → directed edge rows (one shuffle-free explode);
2. neighbor detection: self-join on the CANONICAL undirected edge key
   (the same bucket-join shape as the engine's PIP cell join);
3. junction degree: vertex → distinct-polygon count aggregate;
4. chain decomposition: per-polygon walk (one ``applyInPandas`` group)
   breaking chains where the neighbor changes or a ≥3-degree junction
   vertex occurs, rotated so the walk starts at a break;
5. per-chain VW simplification of each DISTINCT canonical chain
   (endpoints pinned, effective-area threshold — vertices removed
   smallest-area-first with deterministic (area, index) tie-breaks);
6. reassembly: simplified chains join back to their (polygon, slot)
   positions and concatenate per polygon.

Because a shared chain is simplified once (canonical direction), both
polygons receive bit-identical boundaries — the no-gap/no-overlap
coverage invariant is preserved by construction, exactly the GEOS
CoverageSimplifier contract.  Holes are out of scope (outer rings
only), as is crossing (non-coverage) input — same contract as the
reference tool.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vw_simplify(pts: np.ndarray, tol: float) -> np.ndarray:
    """Visvalingam–Whyatt open-chain simplification: repeatedly remove
    the interior vertex with the smallest effective triangle area while
    that area < ``tol``; endpoints are pinned.  Removal order is
    deterministic: (area, index) lexicographic."""
    pts = np.asarray(pts, dtype=np.float64)
    n = pts.shape[0]
    if n <= 2:
        return pts
    alive = list(range(n))

    def area(i_prev: int, i: int, i_next: int) -> float:
        a, b, c = pts[i_prev], pts[i], pts[i_next]
        return 0.5 * abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        )

    while len(alive) > 2:
        best_j, best_area = -1, None
        for j in range(1, len(alive) - 1):
            ar = area(alive[j - 1], alive[j], alive[j + 1])
            if best_area is None or ar < best_area:
                best_j, best_area = j, ar
        if best_area is None or best_area >= tol:
            break
        del alive[best_j]
    return pts[alive]


def _canon_chain(verts: list[list[float]]) -> tuple[str, bool]:
    """Canonical key + direction flag for a chain shared by two walks in
    opposite directions: canonical = the direction whose vertex tuple is
    lexicographically smaller, so both owners derive the SAME key and
    simplify the SAME point sequence."""
    fwd = tuple(map(tuple, verts))
    rev = tuple(reversed(fwd))
    if fwd <= rev:
        return repr(fwd), True
    return repr(rev), False


_CHAIN_SCHEMA = (
    "poly_id long, slot int, chain_key string, forward boolean, "
    "verts array<array<double>>"
)


def _walk_chains(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decompose ONE polygon's ring walk into chains (runs of edges with
    the same neighbor, broken at ≥3-degree junction vertices)."""
    pdf = pdf.sort_values("seq").reset_index(drop=True)
    n = len(pdf)
    nb = pdf["neighbor"].to_numpy()
    jdeg = pdf["a_junction"].to_numpy()  # junction flag of edge START vertex

    # break BEFORE edge i?
    brk = [
        bool(jdeg[i]) or nb[i] != nb[(i - 1) % n]
        for i in range(n)
    ]
    if not any(brk):
        # isolated ring: pin the walk's lexicographically smallest vertex
        pts = list(zip(pdf["ax"], pdf["ay"]))
        brk[int(np.lexsort((pdf["ay"], pdf["ax"]))[0])] = True
        del pts
    start = brk.index(True)
    order = [(start + i) % n for i in range(n)]

    rows = []
    slot = -1
    cur: list[int] = []
    for idx in order:
        if brk[idx] and cur:
            rows.append((slot, cur))
            cur = []
        if brk[idx]:
            slot += 1
        if not cur:
            pass
        cur.append(idx)
    rows.append((slot, cur))

    out = []
    poly = int(pdf["poly_id"].iloc[0])
    for slot_id, idxs in rows:
        verts = [[float(pdf["ax"].iloc[i]), float(pdf["ay"].iloc[i])]
                 for i in idxs]
        last = idxs[-1]
        verts.append([float(pdf["bx"].iloc[last]), float(pdf["by"].iloc[last])])
        key, forward = _canon_chain(verts)
        out.append(
            {
                "poly_id": poly,
                "slot": int(slot_id),
                "chain_key": key,
                "forward": forward,
                # stored in CANONICAL direction so dedup keeps one
                # well-defined vertex sequence per key — both owners
                # then splice the identical simplified chain
                "verts": verts if forward else verts[::-1],
            }
        )
    return pd.DataFrame(out)


_RING_SCHEMA = "poly_id long, n_vertices int, area double"


def _reassemble(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("slot")
    ring: list[list[float]] = []
    for _, row in pdf.iterrows():
        verts = [list(map(float, v)) for v in row["simp"]]
        if not row["forward"]:
            verts = verts[::-1]
        if ring:
            verts = verts[1:]  # drop shared joint
        ring.extend(verts)
    a = np.asarray(ring, dtype=np.float64)
    # shoelace (closed: last == first by construction)
    x, y = a[:, 0], a[:, 1]
    area = 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    return pd.DataFrame(
        {
            "poly_id": [int(pdf["poly_id"].iloc[0])],
            "n_vertices": [int(a.shape[0])],
            "area": [abs(area)],
        }
    )


def simplify_coverage(polys: DataFrame, tol: float) -> DataFrame:
    """``polys``: (poly_id long, ring array<array<double>>) with ring
    closed (last vertex == first).  Returns (poly_id, n_vertices, area)
    of the simplified coverage.  See module docstring for the stage
    decomposition; shuffles: edge-key self-join, vertex-degree agg,
    per-poly walk, per-chain distinct, reassembly — all keyed, none
    all-pairs."""
    e = (
        polys.select(
            "poly_id",
            F.posexplode(F.expr(
                "transform(slice(ring, 1, size(ring) - 1), "
                "(v, i) -> struct(v[0] as ax, v[1] as ay, "
                "ring[i + 1][0] as bx, ring[i + 1][1] as by))"
            )).alias("seq", "edge"),
        )
        .select("poly_id", "seq", "edge.ax", "edge.ay", "edge.bx", "edge.by")
    )
    pa = F.concat_ws(",", F.col("ax").cast("string"), F.col("ay").cast("string"))
    pb = F.concat_ws(",", F.col("bx").cast("string"), F.col("by").cast("string"))
    e = e.withColumn(
        "ekey",
        F.when(pa <= pb, F.concat_ws("|", pa, pb))
        .otherwise(F.concat_ws("|", pb, pa)),
    )
    other = e.select(
        F.col("ekey").alias("nb_ekey"),
        F.col("poly_id").alias("nb_poly"),
    )
    nbr = (
        e.join(
            other,
            (F.col("ekey") == F.col("nb_ekey"))
            & (F.col("nb_poly") != F.col("poly_id")),
            "left",
        )
        .groupBy("poly_id", "seq", "ax", "ay", "bx", "by")
        .agg(F.min(F.coalesce("nb_poly", F.lit(-1))).alias("neighbor"))
    )
    # vertex junction degree: distinct polygons touching each vertex
    vtx = (
        e.select("poly_id", pa.alias("vkey"))
        .unionAll(e.select("poly_id", pb.alias("vkey")))
        .distinct()
        .groupBy("vkey")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= 3)
    )
    nbr = (
        nbr.withColumn(
            "vkey",
            F.concat_ws(
                ",", F.col("ax").cast("string"), F.col("ay").cast("string")),
        )
        .join(F.broadcast(vtx), "vkey", "left")
        .withColumn("a_junction", F.col("deg").isNotNull())
        .drop("vkey", "deg")
    )
    chains = nbr.groupBy("poly_id").applyInPandas(
        _walk_chains, schema=_CHAIN_SCHEMA)

    def _simp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            simp = [
                [list(map(float, p)) for p in vw_simplify(
                    np.array([[float(q[0]), float(q[1])] for q in v]), tol)]
                for v in pdf["verts"]
            ]
            yield pd.DataFrame(
                {"chain_key": pdf["chain_key"], "simp": simp})

    uniq = chains.select("chain_key", "verts").dropDuplicates(["chain_key"])
    simped = uniq.mapInPandas(
        _simp, schema="chain_key string, simp array<array<double>>")
    joined = chains.drop("verts").join(simped, "chain_key")
    return joined.groupBy("poly_id").applyInPandas(
        _reassemble, schema=_RING_SCHEMA)


def demo_coverage_rings(cols: int = 2, rows: int = 2) -> list[tuple]:
    """Deterministic edge-matched coverage fixture: a cols×rows grid of
    2×1 cells whose INTERIOR vertical boundaries are zigzagged (teeth
    area 0.01) and whose straight edges carry collinear midpoints — so
    simplification at tol 0.1 must collapse every cell to its plain
    rectangle (5 ring vertices, area exactly 2.0) while keeping the
    coverage gap/overlap-free.  Shared zigzags are generated from one
    ascending expression so both owners' vertices are bit-identical,
    as a real coverage's shared boundaries are by construction."""

    def zig(x, y0, y1):
        lo = min(y0, y1)
        ys = [lo + 0.2 * k for k in range(6)]
        xs = [x + (0.05 if k in (1, 3) else 0.0) for k in range(6)]
        pts = list(map(list, zip(xs, ys)))
        return pts if y1 > y0 else pts[::-1]

    polys = []
    for j in range(rows):
        for i in range(cols):
            x0, x1 = float(2 * i), float(2 * i + 2)
            y0, y1 = float(j), float(j + 1)
            ring = [[x0, y0], [x0 + 1.0, y0], [x1, y0]]
            if i == cols - 1:
                ring += [[x1, y0 + 0.5], [x1, y1]]
            else:
                ring += zig(x1, y0, y1)[1:]
            ring += [[x0 + 1.0, y1], [x0, y1]]
            if i == 0:
                ring += [[x0, y1 - 0.5], [x0, y0]]
            else:
                ring += zig(x0, y1, y0)[1:]
            polys.append((j * cols + i, ring))
    return polys
