"""GCP-based polynomial transformer (GDALCreateGCPTransformer parity).

Semantics follow the reference transformer in ``alg/gdal_crs.cpp``:

- source coordinates are MEAN-CENTERED before fitting and before every
  apply (``GDALGCPTransform`` calls ``CRS_georef(x - x1_mean, ...)``,
  gdal_crs.cpp:451-460; means are plain averages, gdal_crs.cpp:286-289);
- the polynomial basis is GDAL's ``term()`` ladder
  (gdal_crs.cpp:896-921): order 1 -> [1, e, n], order 2 ->
  [1, e, n, e^2, e*n, n^2], order 3 adds the cubic terms;
- with exactly ``(order+1)(order+2)/2`` active GCPs the system is solved
  directly (``exactdet``), otherwise by least-squares normal equations
  (``calcls``, gdal_crs.cpp:832-884);
- both directions (pixel->geo and geo->pixel) are fitted, matching
  ``CRS_compute_georef_equations``'s array swap.

The solver here is NOT a port: order 1 uses the closed-form Cramer rule on
the 3x3 normal matrix (the identical arithmetic expression is emitted by
the SQL oracle, so the fit itself is verified cross-engine), and order >= 2
uses a numpy Gauss-Jordan elimination with partial pivoting (same pivoting
semantics as the reference's ``solvemat`` so near-collinear GCP sets fail
identically).

Apply is pure Spark Column math (CRS_georef's Horner-free layout) — no
Python in the per-row path, so the transform distributes as a map-only
stage at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def n_terms(order: int) -> int:
    return (order + 1) * (order + 2) // 2


def _terms_py(e: float, n: float, order: int) -> list[float]:
    t = [1.0, e, n]
    if order >= 2:
        t += [e * e, e * n, n * n]
    if order >= 3:
        t += [e * e * e, e * e * n, e * n * n, n * n * n]
    return t[: n_terms(order)]


@dataclass(frozen=True)
class GCPFit:
    """One direction of a fitted polynomial: geo = poly(src - mean)."""

    order: int
    e_mean: float
    n_mean: float
    coef_e: tuple[float, ...]  # easting coefficients  (E[] in the reference)
    coef_n: tuple[float, ...]  # northing coefficients (N[] in the reference)


def _solve_gauss_jordan(m: np.ndarray, rhs: np.ndarray) -> np.ndarray:
    """Gauss-Jordan with partial pivoting; raises on a zero pivot (the
    reference returns MUNSOLVABLE for collinear GCPs)."""
    a = np.hstack([m.astype(np.float64), rhs.astype(np.float64)])
    k = m.shape[0]
    for i in range(k):
        p = i + int(np.argmax(np.abs(a[i:, i])))
        if a[p, i] == 0.0:
            raise ValueError("GCPs are collinear: normal matrix is singular")
        if p != i:
            a[[i, p]] = a[[p, i]]
        for r in range(k):
            if r != i:
                a[r, i:] -= (a[r, i] / a[i, i]) * a[i, i:]
    return a[:, k:] / a[:, :k].diagonal()[:, None]


def _cramer3(m11, m12, m13, m22, m23, m33, a1, a2, a3):
    """Closed-form 3x3 symmetric solve — expression order mirrors the SQL
    oracle verbatim for cross-engine FP parity."""
    det = (m11 * (m22 * m33 - m23 * m23)
           - m12 * (m12 * m33 - m23 * m13)
           + m13 * (m12 * m23 - m22 * m13))
    c0 = (a1 * (m22 * m33 - m23 * m23)
          - m12 * (a2 * m33 - m23 * a3)
          + m13 * (a2 * m23 - m22 * a3)) / det
    c1 = (m11 * (a2 * m33 - a3 * m23)
          - a1 * (m12 * m33 - m23 * m13)
          + m13 * (m12 * a3 - a2 * m13)) / det
    c2 = (m11 * (m22 * a3 - m23 * a2)
          - m12 * (m12 * a3 - a2 * m13)
          + a1 * (m12 * m23 - m22 * m13)) / det
    return c0, c1, c2


def fit_gcp_poly(
    gcps: list[tuple[float, float, float, float]], order: int = 1,
    means: tuple[float, float] | None = None,
) -> GCPFit:
    """Fit geo = poly(pixel) from GCP tuples ``(e1, n1, e2, n2)`` =
    (src easting, src northing, dst easting, dst northing).  Swap the
    tuple halves to fit the reverse direction (the reference's array
    swap in CRS_compute_georef_equations).  ``means`` overrides the
    centering means — the refinement loop passes the ORIGINAL full-set
    means, which the reference keeps fixed across refits
    (gdal_crs.cpp:1142 sets them once before the removal loop)."""
    k = n_terms(order)
    if len(gcps) < k:
        raise ValueError(f"order {order} needs >= {k} GCPs, got {len(gcps)}")
    cnt = float(len(gcps))
    if means is not None:
        e_mean, n_mean = means
    else:
        e_mean = sum(g[0] for g in gcps) / cnt
        n_mean = sum(g[1] for g in gcps) / cnt

    rows = [_terms_py(g[0] - e_mean, g[1] - n_mean, order) for g in gcps]
    if order == 1:
        # normal-equation sums in plain Python accumulation order (the SQL
        # oracle's sum() agrees exactly on the dyadic fixture design)
        m11 = cnt
        m12 = sum(r[1] for r in rows)
        m13 = sum(r[2] for r in rows)
        m22 = sum(r[1] * r[1] for r in rows)
        m23 = sum(r[1] * r[2] for r in rows)
        m33 = sum(r[2] * r[2] for r in rows)
        ae = [sum(g[2] * r[i] for g, r in zip(gcps, rows)) for i in range(3)]
        an = [sum(g[3] * r[i] for g, r in zip(gcps, rows)) for i in range(3)]
        ce = _cramer3(m11, m12, m13, m22, m23, m33, *ae)
        cn = _cramer3(m11, m12, m13, m22, m23, m33, *an)
        return GCPFit(order, e_mean, n_mean, tuple(ce), tuple(cn))

    t = np.asarray(rows, dtype=np.float64)
    dst = np.asarray([[g[2], g[3]] for g in gcps], dtype=np.float64)
    if len(gcps) == k:
        sol = _solve_gauss_jordan(t, dst)  # exactdet path
    else:
        sol = _solve_gauss_jordan(t.T @ t, t.T @ dst)  # calcls path
    return GCPFit(order, e_mean, n_mean,
                  tuple(sol[:, 0].tolist()), tuple(sol[:, 1].tolist()))


def gcp_poly_cols(
    fit: GCPFit, e_col: Column, n_col: Column
) -> tuple[Column, Column]:
    """CRS_georef as Spark Column math: (gx, gy) from mean-centered source
    columns.  Whole-stage-codegen arithmetic only — the fit is a bounded
    driver-side constant, the apply is map-only at any scale."""
    e1 = e_col - F.lit(fit.e_mean)
    n1 = n_col - F.lit(fit.n_mean)
    terms: list[Column] = [F.lit(1.0), e1, n1]
    if fit.order >= 2:
        terms += [e1 * e1, e1 * n1, n1 * n1]
    if fit.order >= 3:
        terms += [e1 * e1 * e1, e1 * e1 * n1, e1 * n1 * n1, n1 * n1 * n1]
    gx = F.lit(fit.coef_e[0])
    gy = F.lit(fit.coef_n[0])
    for c_e, c_n, t in zip(fit.coef_e[1:], fit.coef_n[1:], terms[1:]):
        gx = gx + F.lit(c_e) * t
        gy = gy + F.lit(c_n) * t
    return gx, gy


# ---------------------------------------------------------------------------
# Fixture GCPs — dyadic-exact design so every normal-equation sum, Cramer
# determinant, and mean is EXACT in float64 regardless of summation order
# (pixel coords are small integers, geo coords are multiples of 2^-9, the
# per-point perturbation keeps the order-1 system genuinely overdetermined).
# ---------------------------------------------------------------------------

def gcp_fixture(order: int) -> list[tuple[float, float, float, float]]:
    n = 8 if order == 1 else 16
    out = []
    for i in range(n):
        e1 = float((i * 61) % 512 // 8 * 8)   # integers, multiples of 8
        n1 = float((i * 113 + 37) % 512 // 8 * 8)
        pert = ((i * 37) % 7 - 3) / 64.0
        e2 = 10.0 + e1 / 64.0 + n1 / 128.0 + pert
        n2 = -5.0 + e1 / 256.0 - n1 / 64.0 - pert
        if order >= 2:  # add an exactly-quadratic component
            e2 += (e1 * n1) / 131072.0 + (e1 * e1) / 262144.0
            n2 += (n1 * n1) / 262144.0
        out.append((e1, n1, e2, n2))
    return out


# ---------------------------------------------------------------------------
# GCP refinement (gdal_translate -refine_gcps; reference remove_outliers /
# worst_outlier in alg/gdal_crs.cpp:1039-1210): iteratively drop the single
# worst GCP whose fit residual is >= tolerance, refit, and stop when no
# outlier remains or the minimum count is reached.  Two reference quirks
# preserved exactly:
#   * centering means come from the ORIGINAL full set and stay FIXED
#     across refits (x1_mean set once at gdal_crs.cpp:1142);
#   * residuals below FLT_EPSILON are treated as zero, and the worst
#     outlier is the max residual >= tolerance (ties keep the first).
# ---------------------------------------------------------------------------

_FLT_EPSILON = 1.19209290e-07


def refine_gcps(
    gcps: list[tuple[float, float, float, float]],
    order: int = 1,
    tolerance: float = 1.0,
    minimum: int | None = None,
) -> tuple[GCPFit, list[int]]:
    """→ (final fit, kept original indices).  Driver-side over the
    bounded GCP list (GCP sets are small by definition); the returned
    fit applies as map-only Column math like any GCPFit."""
    if minimum is None:
        minimum = n_terms(order) + 1
    e_mean = sum(g[0] for g in gcps) / float(len(gcps))
    n_mean = sum(g[1] for g in gcps) / float(len(gcps))
    kept = list(range(len(gcps)))
    cur = list(gcps)
    fit = fit_gcp_poly(cur, order=order, means=(e_mean, n_mean))
    while len(cur) > minimum:
        worst_i, worst_r = -1, -1.0
        for i, (e1, n1, e2, n2) in enumerate(cur):
            te = _terms_py(e1 - e_mean, n1 - n_mean, order)
            gx = sum(c * t for c, t in zip(fit.coef_e, te))
            gy = sum(c * t for c, t in zip(fit.coef_n, te))
            r = ((gx - e2) ** 2 + (gy - n2) ** 2) ** 0.5
            if r < _FLT_EPSILON:
                r = 0.0
            if r > worst_r and r >= tolerance:
                worst_i, worst_r = i, r
        if worst_i < 0:
            break
        del cur[worst_i]
        del kept[worst_i]
        fit = fit_gcp_poly(cur, order=order, means=(e_mean, n_mean))
    return fit, kept
