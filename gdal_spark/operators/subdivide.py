"""ST_Subdivide — PostGIS dialect reach (the reference exposes PostGIS
through ``ogr/ogrsf_frmts/pg/``; semantics re-derived from the public
PostGIS ``lwgeom_subdivide`` docs): recursively split a polygon along the
midpoint of its LONGER envelope axis until every part carries at most
``max_vertices`` vertices.

Spark-first shape: the recursion depth is O(log(verts / max_vertices)) —
data-size independent — so it runs as a DRIVER-PACED round loop (same
contract as the dedup connected-components loop): each round is ONE
distributed ``mapInPandas`` pass that passes compliant parts through and
splits oversized ones into their two half-envelope Sutherland–Hodgman
clips.  No shuffle inside a round; per-round persist + unpersist truncates
lineage.  Area is conserved exactly by the clip identity
(part ∩ west-half) + (part ∩ east-half) = part.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.spatial import geometry as G

_SCHEMA = "id long, rings array<array<array<double>>>, n_verts int"


def _nverts(rings: list[np.ndarray]) -> int:
    return int(sum(r.shape[0] for r in rings))


def _split_once(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """One bbox-halving split (the lwgeom_subdivide step): clip against
    the west/east (or south/north) half-envelopes at the midpoint of the
    longer axis."""
    xmin, ymin, xmax, ymax = G.rings_envelope(rings)
    big = 1e30
    if xmax - xmin >= ymax - ymin:
        mid = (xmin + xmax) / 2.0
        boxes = [(-big, -big, mid, big), (mid, -big, big, big)]
    else:
        mid = (ymin + ymax) / 2.0
        boxes = [(-big, -big, big, mid), (-big, mid, big, big)]
    out = []
    for bx in boxes:
        c = G.clip_rings_rect(rings, *bx)
        if c and G.rings_area(c) > 0.0:
            out.append(c)
    return out


def subdivide(
    parts: DataFrame, max_vertices: int = 8,
    id_col: str = "poly_id", rings_col: str = "rings",
    max_rounds: int = 12,
) -> DataFrame:
    """→ (id, rings, n_verts) with every part at ``max_vertices`` or
    fewer.  ``max_vertices`` must allow a closed ring (>= 5, the PostGIS
    floor)."""
    if max_vertices < 5:
        raise ValueError("max_vertices must be >= 5")

    def one_round(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rings_out, nv = [], [], []
            for pid, rings in zip(pdf["id"], pdf["rings"]):
                np_rings = G.rings_to_numpy(rings)
                n = _nverts(np_rings)
                pieces = [np_rings] if n <= max_vertices else \
                    _split_once(np_rings)
                for p in pieces:
                    ids.append(pid)
                    rings_out.append([[list(pt) for pt in r] for r in p])
                    nv.append(_nverts(p))
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "rings": pd.Series(rings_out, dtype="object"),
                "n_verts": pd.Series(nv, dtype="int32"),
            })

    cur = parts.select(
        F.col(id_col).alias("id"), F.col(rings_col).alias("rings"),
        F.lit(0).alias("n_verts"),
    )
    prev_cached = None
    for _ in range(max_rounds):
        nxt = cur.mapInPandas(one_round, _SCHEMA).persist()
        n_over = nxt.filter(F.col("n_verts") > max_vertices).count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = nxt
        cur = nxt
        if n_over == 0:
            return cur
    raise RuntimeError(
        f"subdivide did not converge in {max_rounds} rounds "
        f"({n_over} parts still over {max_vertices} vertices)")
