"""Thin-plate-spline transformer (GDALCreateTPSTransformer parity).

Reference semantics: ``alg/gdal_tps.cpp`` → ``alg/thinplatespline.cpp``
(VizGeorefSpline2D): radial basis U(p, q) = d²·log(d²) with d² the squared
euclidean distance (``VizGeorefSpline2DBase_func``,
thinplatespline.cpp:175-182 — note the kernel takes the SQUARED distance,
i.e. the classic r²·ln r² = 2·r²·ln r), plus an affine part [1, x, y];
coefficients solve the standard (n+3)×(n+3) interpolation system

    | K   P | |w|   |v|
    | Pᵀ  0 | |a| = |0|     K_ij = U(p_i, p_j),  P_i = [1, x_i, y_i]

so the surface interpolates every control point exactly.  The solve is
driver-side over the BOUNDED control-point set (like the reference);
apply is an unrolled per-control-point Column expression — map-only, no
Python in the per-row path.  Solver: the same partial-pivot Gauss-Jordan
as the GCP transformer (singular systems — duplicated control points —
raise, matching the reference's unsolvable status).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from gdal_spark.spatial.gcp import _solve_gauss_jordan


@dataclass(frozen=True)
class TPSFit:
    xs: tuple[float, ...]          # control point sources
    ys: tuple[float, ...]
    # per output dimension: (a0, a1, a2, w_0..w_{n-1})
    coef: tuple[tuple[float, ...], ...]


def _u(d2):
    return d2 * np.log(d2) if d2 > 0.0 else 0.0


def fit_tps(
    points: list[tuple[float, float]], targets: list[tuple[float, ...]]
) -> TPSFit:
    """Fit one TPS per target dimension through the control points."""
    n = len(points)
    if n < 3:
        raise ValueError("TPS needs >= 3 control points")
    dim = len(targets[0])
    a = np.zeros((n + 3, n + 3))
    for i, (xi, yi) in enumerate(points):
        for j, (xj, yj) in enumerate(points):
            if i != j:
                d2 = (xj - xi) * (xj - xi) + (yj - yi) * (yj - yi)
                a[i, j] = _u(d2)
        a[i, n] = 1.0
        a[i, n + 1] = xi
        a[i, n + 2] = yi
        a[n, i] = 1.0
        a[n + 1, i] = xi
        a[n + 2, i] = yi
    rhs = np.zeros((n + 3, dim))
    for i, t in enumerate(targets):
        rhs[i] = t
    sol = _solve_gauss_jordan(a, rhs)
    coef = tuple(
        tuple([float(sol[n, d]), float(sol[n + 1, d]), float(sol[n + 2, d])]
              + [float(sol[i, d]) for i in range(n)])
        for d in range(dim)
    )
    return TPSFit(
        tuple(p[0] for p in points), tuple(p[1] for p in points), coef
    )


def tps_apply_cols(fit: TPSFit, x: Column, y: Column) -> list[Column]:
    """f_d(x, y) = a0 + a1·x + a2·y + Σ w_i·U(d²_i) as Column math."""
    outs = []
    for coefs in fit.coef:
        acc = F.lit(coefs[0]) + F.lit(coefs[1]) * x + F.lit(coefs[2]) * y
        for w, cx, cy in zip(coefs[3:], fit.xs, fit.ys):
            dx = x - F.lit(cx)
            dy = y - F.lit(cy)
            d2 = dx * dx + dy * dy
            u = F.when(d2 > F.lit(0.0), d2 * F.log(d2)).otherwise(F.lit(0.0))
            acc = acc + F.lit(w) * u
        outs.append(acc)
    return outs


def sql_tps_apply(fit: TPSFit, x: str, y: str) -> list[str]:
    """DuckDB mirror of tps_apply_cols — identical expression order
    (ln() in DuckDB is the same libm log the numpy/Column path hits)."""
    outs = []
    for coefs in fit.coef:
        parts = [f"{coefs[0]!r} + {coefs[1]!r} * ({x}) + {coefs[2]!r} * ({y})"]
        for w, cx, cy in zip(coefs[3:], fit.xs, fit.ys):
            d2 = (f"((({x}) - {cx!r}) * (({x}) - {cx!r})"
                  f" + (({y}) - {cy!r}) * (({y}) - {cy!r}))")
            u = f"(CASE WHEN {d2} > 0.0 THEN {d2} * ln({d2}) ELSE 0.0 END)"
            parts.append(f"{w!r} * {u}")
        outs.append("(" + " + ".join(parts) + ")")
    return outs


def tps_fixture() -> tuple[list[tuple[float, float]], list[tuple[float, float]]]:
    """12 dyadic control points on a jittered grid; targets = affine map
    plus a per-point dyadic displacement (a genuinely non-polynomial warp,
    so the radial terms carry real weight)."""
    pts, tgt = [], []
    k = 0
    for gy in range(3):
        for gx in range(4):
            x = gx * 16.0 + ((k * 5) % 4)
            y = gy * 16.0 + ((k * 3) % 4)
            wob = ((k * 37) % 7 - 3) / 8.0
            tgt_x = 100.0 + 0.5 * x - 0.25 * y + wob
            tgt_y = -40.0 + 0.125 * x + 0.75 * y - wob
            pts.append((x, y))
            tgt.append((tgt_x, tgt_y))
            k += 1
    return pts, tgt
