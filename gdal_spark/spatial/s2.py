"""S2 cell index — cube-face Hilbert-curve geocells (the north rule's
"H3/S2-encoded geotags", literal S2 flavor).

Implements the public S2 geometry cell model (s2geometry.io docs /
`s2coords.h` + `s2cell_id.h` semantics, re-derived from the published
algorithm — no code consulted):

1. lon/lat -> unit sphere vector (x, y, z);
2. face = largest-|component| axis (strict `>` ladder), +3 when the
   component is negative — six cube faces;
3. gnomonic (u, v) on the face via the per-face ratio table;
4. the QUADRATIC uv->st transform  s = u>=0 ? sqrt(1+3u)/2 : 1-sqrt(1-3u)/2
   (S2_QUADRATIC_PROJECTION, the library default);
5. st -> (i, j) leaf coordinates at `level` (floor + clamp);
6. (i, j) -> position on the face's Hilbert curve with S2's orientation
   automaton: initial orientation = face & 1 (kSwapMask), per-quadrant
   IJ->pos lookup and orientation XOR (kIJtoPos / kPosToOrientation).

The combined key is `face * 4^level + pos` (face-major, < 6*4^level, fits
bigint for level <= 29).  The canonical 64-bit cell id
`face<<61 | pos<<(2*(30-level)+1) | 1<<(2*(30-level))` is emitted as a
16-char lowercase hex string, built from hi/lo 32-bit halves so no signed
64-bit overflow occurs on either engine (face>=4 sets bit 63).

Cross-engine exactness: steps 1-2 use cos/sin/radians (same libm on this
box for numpy and DuckDB); steps 3-6 are IEEE-exact (divide, sqrt, integer
bit ops).  A 1-ulp trig divergence only flips a cell when st lands within
~1e-16 of a 2^-level boundary — probability ~1e-11 per row at level 12 on
the 1e-4-quantized fixture geotags (FIXTURES.md §1), i.e. never observed.

At 100 TB scale: the encode is a map-only Arrow-batched kernel (one pandas
UDF pass, O(level) vectorized int ops per batch) — no shuffle, no driver
state; parent/rollup is `pos >> 2*(level-parent_level)` pure column math.
Reference parity target: GDAL has no S2, but the north rule names it; the
cell model matches the published S2 spec so ids agree with any standard
S2 implementation (validated against the face-center leaf anchor
0x1000000000000001 for (0E, 0N) in tests/test_s2.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# kIJtoPos flattened [orientation*4 + ij] with ij = 2*i_bit + j_bit.
_IJ_TO_POS = np.array(
    [0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0], dtype=np.int64
)
# kPosToOrientation: orientation ^= this[pos_k].
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)


def _s2_key_numpy(
    lon: np.ndarray, lat: np.ndarray, level: int
) -> np.ndarray:
    """Vectorized lon/lat -> face*4^level + hilbert_pos (int64)."""
    lam = np.radians(lon.astype(np.float64))
    phi = np.radians(lat.astype(np.float64))
    cp = np.cos(phi)
    x = cp * np.cos(lam)
    y = cp * np.sin(lam)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    fa = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(fa, [x, y, z])
    f = (fa + np.where(comp < 0.0, 3, 0)).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [f == 0, f == 1, f == 2, f == 3, f == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [f == 0, f == 1, f == 2, f == 3, f == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
        # np.where evaluates both branches; the untaken sqrt may see a
        # negative radicand (|u| > 1/3) — NaNs there are discarded.
        s = np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )
        t = np.where(
            v >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * v),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * v),
        )
    n = 1 << level
    i = np.clip(np.floor(s * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(t * n), 0, n - 1).astype(np.int64)
    o = f & 1
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        pk = _IJ_TO_POS[o * 4 + ij]
        pos = pos * 4 + pk
        o = o ^ _POS_TO_ORIENT[pk]
    return f * (4**level) + pos


def s2_key(lon: Column, lat: Column, level: int) -> Column:
    """Column form: one Arrow-batched pandas-UDF pass (map-only at scale).

    The trig/face/uv stage stays in numpy (libm) rather than JVM column
    math so the oracle (DuckDB, same libm) is bit-identical; the Hilbert
    stage is integer-exact anywhere.
    """

    @F.pandas_udf("long")
    def _kernel(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        return pd.Series(
            _s2_key_numpy(
                lon_s.to_numpy(dtype=np.float64),
                lat_s.to_numpy(dtype=np.float64),
                level,
            )
        )

    return _kernel(lon.cast("double"), lat.cast("double"))


def py_s2_key(lon: float, lat: float, level: int) -> int:
    """Pure-Python scalar reference (arbitrary level, python ints)."""
    lam, phi = math.radians(lon), math.radians(lat)
    cp = math.cos(phi)
    x, y, z = cp * math.cos(lam), cp * math.sin(lam), math.sin(phi)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        fa = 0 if ax > az else 2
    else:
        fa = 1 if ay > az else 2
    comp = (x, y, z)[fa]
    f = fa + (3 if comp < 0.0 else 0)
    u = (
        y / x if f == 0
        else -x / y if f == 1
        else -x / z if f == 2
        else z / x if f == 3
        else z / y if f == 4
        else -y / z
    )
    v = (
        z / x if f == 0
        else z / y if f == 1
        else -y / z if f == 2
        else y / x if f == 3
        else -x / y if f == 4
        else -x / z
    )
    s = 0.5 * math.sqrt(1.0 + 3.0 * u) if u >= 0.0 else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)
    t = 0.5 * math.sqrt(1.0 + 3.0 * v) if v >= 0.0 else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * v)
    n = 1 << level
    i = min(max(int(math.floor(s * n)), 0), n - 1)
    j = min(max(int(math.floor(t * n)), 0), n - 1)
    o, pos = f & 1, 0
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        pk = int(_IJ_TO_POS[o * 4 + ij])
        pos = pos * 4 + pk
        o ^= int(_POS_TO_ORIENT[pk])
    return f * (4**level) + pos


def py_s2_cell_id(lon: float, lat: float, level: int) -> int:
    """Canonical unsigned-64 S2 cell id (python int, no overflow)."""
    key = py_s2_key(lon, lat, level)
    f, pos = key >> (2 * level), key & ((1 << (2 * level)) - 1)
    shift = 2 * (30 - level)
    return (f << 61) | (pos << (shift + 1)) | (1 << shift)


def sql_s2_key(lon_expr: str, lat_expr: str, level: int) -> str:
    """DuckDB mirror: one correlated scalar subquery, the same ops in the
    same order (nested SELECT chain like tilemath.sql_hilbert_d)."""
    inner = (
        "SELECT x, y, z, abs(x) AS ax, abs(y) AS ay, abs(z) AS az FROM ("
        f"SELECT cos(radians({lat_expr})) * cos(radians({lon_expr})) AS x, "
        f"cos(radians({lat_expr})) * sin(radians({lon_expr})) AS y, "
        f"sin(radians({lat_expr})) AS z)"
    )
    fa = (
        "(CASE WHEN ax > ay THEN (CASE WHEN ax > az THEN 0 ELSE 2 END) "
        "ELSE (CASE WHEN ay > az THEN 1 ELSE 2 END) END)"
    )
    comp = f"(CASE {fa} WHEN 0 THEN x WHEN 1 THEN y ELSE z END)"
    inner = (
        f"SELECT x, y, z, {fa} + (CASE WHEN {comp} < 0.0 THEN 3 ELSE 0 END)"
        f" AS f FROM ({inner})"
    )
    u = (
        "(CASE f WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z "
        "WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END)"
    )
    v = (
        "(CASE f WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z "
        "WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END)"
    )
    inner = f"SELECT f, {u} AS u, {v} AS v FROM ({inner})"
    st = (
        "(CASE WHEN {c} >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * {c}) "
        "ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {c}) END)"
    )
    n = 1 << level
    ij_q = (
        "CAST(least(greatest(floor({st} * {n}.0), 0.0), {top}.0) AS BIGINT)"
    )
    inner = (
        f"SELECT f, "
        f"{ij_q.format(st=st.format(c='u'), n=n, top=n - 1)} AS i, "
        f"{ij_q.format(st=st.format(c='v'), n=n, top=n - 1)} AS j "
        f"FROM ({inner})"
    )
    inner = (
        f"SELECT f, i, j, 0::BIGINT AS p, (f & 1) AS o FROM ({inner})"
    )
    pos_tab = [0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0]
    pk_case = "CASE o * 4 + ij " + " ".join(
        f"WHEN {idx} THEN {pk}" for idx, pk in enumerate(pos_tab[:-1])
    ) + f" ELSE {pos_tab[-1]} END"
    for k in range(level - 1, -1, -1):
        inner = (
            f"SELECT f, i, j, p, o, "
            f"((i >> {k}) & 1) * 2 + ((j >> {k}) & 1) AS ij FROM ({inner})"
        )
        inner = f"SELECT f, i, j, p, o, {pk_case} AS pk FROM ({inner})"
        inner = (
            "SELECT f, i, j, p * 4 + pk AS p, "
            "xor(o, CASE pk WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END) AS o "
            f"FROM ({inner})"
        )
    return f"(SELECT f * {4 ** level}::BIGINT + p FROM ({inner}))"


def s2_cell_hex(face: Column, pos: Column, level: int) -> Column:
    """Canonical 16-char lowercase-hex cell id as pure column math.

    pos*2^(2*(30-level)+1) + 2^(2*(30-level)) < 2^62 always fits bigint;
    only face<<61 would overflow, so the hi 32 bits are assembled as
    face*2^29 + (rest >> 32) — no signed-64 overflow on either engine.
    """
    shift = 2 * (30 - level)
    rest = pos.cast("long") * F.lit(1 << (shift + 1)) + F.lit(1 << shift)
    hi = face.cast("long") * F.lit(1 << 29) + F.shiftright(rest, 32)
    lo = rest.bitwiseAND(F.lit(0xFFFFFFFF))
    return F.lower(
        F.concat(
            F.lpad(F.hex(hi), 8, "0"), F.lpad(F.hex(lo), 8, "0")
        )
    )


def sql_s2_cell_hex(face_expr: str, pos_expr: str, level: int) -> str:
    shift = 2 * (30 - level)
    rest = f"(({pos_expr})::BIGINT * {1 << (shift + 1)} + {1 << shift})"
    hi = f"(({face_expr})::BIGINT * {1 << 29} + ({rest} >> 32))"
    lo = f"({rest} & 4294967295)"
    return f"printf('%08x%08x', {hi}, {lo})"
