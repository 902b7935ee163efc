"""Hierarchical hexagonal cell index (the north rule's "H3-style" geotag
encoding; reference analog: the H3 library's cell addressing, re-derived
from the PUBLIC axial/cube hex-grid construction — Patel's hex-grid
reference — NOT a port of H3's icosahedral aperture-7 system; this is the
planar pointy-top axial grid the engine's hex k-ring kNN
(operators/knn.py:_hex_axial_cells) buckets with, made CROSS-ENGINE EXACT).

Exactness design (the repo's micro-quantization pattern): fractional axial
coordinates are stable-rounded to integer MICRO-cells first
(``floor(x*1e6 + 0.5)``), and the cube-rounding tie chain then runs on
integers only — every comparison is exact on both engines, so the same
expression emitted as a Spark Column and as DuckDB SQL produces identical
cells bit-for-bit.  (The kNN path keeps its float binning: there the cells
are candidate generation only and exactness comes from the refine.)

Hierarchy: aperture-4 — resolution ``res`` has circumradius
``base_size / 2**res``; a point's parent cell is its encoding at the
coarser resolution (like H3's point-level parent rollup; hex apertures do
not nest geometrically, so parent = re-encode, the only exact semantics
for point data).

Cell id packing: ``(res << 50) | ((q + 2^24) << 25) | (r + 2^24)`` —
single BIGINT, unique across resolutions, pure integer math both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_SQRT3_3 = 0.5773502691896258  # sqrt(3)/3, same double literal both engines
_OFF = 1 << 24
_MICRO = 1_000_000


def hex_cells_quantized(
    lon: Column, lat: Column, size: float
) -> tuple[Column, Column]:
    """Micro-quantized axial hex cell (q, r) of a pointy-top grid with
    circumradius ``size`` degrees — integer cube rounding, cross-engine
    exact."""
    qf = (lon * F.lit(_SQRT3_3) - lat / F.lit(3.0)) / F.lit(size)
    rf = (lat * F.lit(2.0 / 3.0)) / F.lit(size)
    qm = F.floor(qf * F.lit(1e6) + F.lit(0.5)).cast("long")
    rm = F.floor(rf * F.lit(1e6) + F.lit(0.5)).cast("long")
    ym = -qm - rm
    rq = F.floor((qm + F.lit(500000)) / F.lit(1e6)).cast("long")
    ry = F.floor((ym + F.lit(500000)) / F.lit(1e6)).cast("long")
    rz = F.floor((rm + F.lit(500000)) / F.lit(1e6)).cast("long")
    dx = F.abs(rq * _MICRO - qm)
    dy = F.abs(ry * _MICRO - ym)
    dz = F.abs(rz * _MICRO - rm)
    cq = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rq)
    cr = F.when((dx > dy) & (dx > dz), rz).when(dy > dz, rz).otherwise(
        -rq - ry)
    return cq.cast("long"), cr.cast("long")


def sql_hex_cells(lon: str, lat: str, size: float) -> tuple[str, str]:
    """DuckDB mirror of ``hex_cells_quantized`` — same literals, same
    operation order, integer tie chain."""
    qf = f"((({lon}) * {_SQRT3_3!r} - ({lat}) / 3.0) / {size!r})"
    rf = f"((({lat}) * {2.0 / 3.0!r}) / {size!r})"
    qm = f"CAST(floor({qf} * 1000000.0 + 0.5) AS BIGINT)"
    rm = f"CAST(floor({rf} * 1000000.0 + 0.5) AS BIGINT)"
    ym = f"(-({qm}) - ({rm}))"
    rq = f"CAST(floor((({qm}) + 500000) / 1000000.0) AS BIGINT)"
    ry = f"CAST(floor((({ym}) + 500000) / 1000000.0) AS BIGINT)"
    rz = f"CAST(floor((({rm}) + 500000) / 1000000.0) AS BIGINT)"
    dx = f"abs(({rq}) * 1000000 - ({qm}))"
    dy = f"abs(({ry}) * 1000000 - ({ym}))"
    dz = f"abs(({rz}) * 1000000 - ({rm}))"
    big = f"(({dx}) > ({dy}) AND ({dx}) > ({dz}))"
    cq = f"(CASE WHEN {big} THEN -({ry}) - ({rz}) ELSE ({rq}) END)"
    cr = (f"(CASE WHEN {big} THEN ({rz}) "
          f"WHEN ({dy}) > ({dz}) THEN ({rz}) ELSE -({rq}) - ({ry}) END)")
    return cq, cr


def res_size(base_size: float, res: int) -> float:
    """Aperture-4 resolution ladder: circumradius halves per level."""
    return base_size / float(1 << res)


def hex_cell_id(q: Column, r: Column, res: int) -> Column:
    """Pack (res, q, r) into one BIGINT, unique across resolutions."""
    return (
        F.lit(res).cast("long") * F.lit(1 << 50)
        + (q + F.lit(_OFF)) * F.lit(1 << 25)
        + (r + F.lit(_OFF))
    ).cast("long")


def sql_hex_cell_id(q: str, r: str, res: int) -> str:
    return (f"(CAST({res} AS BIGINT) * {1 << 50} "
            f"+ (({q}) + {_OFF}) * {1 << 25} + (({r}) + {_OFF}))")
