"""GCP polynomial transformer (alg/gdal_crs.cpp GDALCreateGCPTransformer
semantics: mean-centered term ladder, exactdet vs least-squares paths,
partial-pivot solve that rejects collinear GCPs)."""

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.spatial.gcp import (
    GCPFit, fit_gcp_poly, gcp_fixture, gcp_poly_cols, n_terms,
)


def _affine_gcps(n=8):
    # exactly affine: e2 = 4 + 0.5*e1 - 0.25*n1 ; n2 = -2 + 0.125*e1 + n1
    out = []
    for i in range(n):
        e1, n1 = float((i * 61) % 97), float((i * 113) % 89)
        out.append((e1, n1, 4 + 0.5 * e1 - 0.25 * n1,
                    -2 + 0.125 * e1 + n1))
    return out


def test_order1_recovers_affine_generator():
    fit = fit_gcp_poly(_affine_gcps(), order=1)
    # apply at arbitrary points reproduces the generator
    for e, n in [(0.0, 0.0), (10.0, 3.0), (-7.5, 100.0)]:
        gx = (fit.coef_e[0] + fit.coef_e[1] * (e - fit.e_mean)
              + fit.coef_e[2] * (n - fit.n_mean))
        gy = (fit.coef_n[0] + fit.coef_n[1] * (e - fit.e_mean)
              + fit.coef_n[2] * (n - fit.n_mean))
        assert math.isclose(gx, 4 + 0.5 * e - 0.25 * n, abs_tol=1e-9)
        assert math.isclose(gy, -2 + 0.125 * e + n, abs_tol=1e-9)


def test_order2_exactdet_path_recovers_quadratic():
    # exactly 6 GCPs -> the reference's exactdet direct solve
    gen = lambda e, n: (1 + 0.01 * e * e - 0.02 * e * n,
                        2 + 0.5 * n + 0.005 * n * n)
    pts = [(0, 0), (10, 0), (0, 10), (10, 10), (5, 2), (2, 7)]
    gcps = [(float(e), float(n), *gen(e, n)) for e, n in pts]
    assert len(gcps) == n_terms(2)
    fit = fit_gcp_poly(gcps, order=2)
    for e, n in [(3.0, 4.0), (8.0, 1.0)]:
        ec, nc = e - fit.e_mean, n - fit.n_mean
        terms = [1.0, ec, nc, ec * ec, ec * nc, nc * nc]
        gx = sum(c * t for c, t in zip(fit.coef_e, terms))
        gy = sum(c * t for c, t in zip(fit.coef_n, terms))
        ex, ey = gen(e, n)
        assert math.isclose(gx, ex, abs_tol=1e-8)
        assert math.isclose(gy, ey, abs_tol=1e-8)


def test_collinear_gcps_raise():
    gcps = [(float(i), float(2 * i), float(i), float(i)) for i in range(8)]
    with pytest.raises(ValueError, match="collinear|singular"):
        fit_gcp_poly(gcps, order=2)


def test_inverse_roundtrip():
    # fit both directions like CRS_compute_georef_equations' array swap
    gcps = gcp_fixture(1)
    fwd = fit_gcp_poly(gcps, order=1)
    rev = fit_gcp_poly([(e2, n2, e1, n1) for e1, n1, e2, n2 in gcps], order=1)

    def apply(fit: GCPFit, e, n):
        ec, nc = e - fit.e_mean, n - fit.n_mean
        return (fit.coef_e[0] + fit.coef_e[1] * ec + fit.coef_e[2] * nc,
                fit.coef_n[0] + fit.coef_n[1] * ec + fit.coef_n[2] * nc)

    # the fixture has a deliberate residual, so roundtrip is close, not exact
    for e, n in [(16.0, 48.0), (200.0, 100.0)]:
        gx, gy = apply(fwd, e, n)
        eb, nb = apply(rev, gx, gy)
        assert abs(eb - e) < 1.5 and abs(nb - n) < 1.5


def test_too_few_gcps_raise():
    with pytest.raises(ValueError, match="needs >="):
        fit_gcp_poly(_affine_gcps(4), order=2)


def test_column_apply_matches_python(spark):
    fit = fit_gcp_poly(gcp_fixture(2), order=2)
    df = spark.createDataFrame(
        [(12.0, 40.0), (100.0, 256.0)], "e double, n double"
    )
    gx, gy = gcp_poly_cols(fit, F.col("e"), F.col("n"))
    rows = df.select(gx.alias("gx"), gy.alias("gy")).collect()
    for (e, n), r in zip([(12.0, 40.0), (100.0, 256.0)], rows):
        ec, nc = e - fit.e_mean, n - fit.n_mean
        terms = [1.0, ec, nc, ec * ec, ec * nc, nc * nc]
        assert math.isclose(
            r["gx"], sum(c * t for c, t in zip(fit.coef_e, terms)),
            rel_tol=1e-12)
        assert math.isclose(
            r["gy"], sum(c * t for c, t in zip(fit.coef_n, terms)),
            rel_tol=1e-12)


class TestRefineGcps:
    def _fixture(self):
        out = []
        for i in range(16):
            e1 = float((i * 61) % 512 // 8 * 8)
            n1 = float((i * 113 + 37) % 512 // 8 * 8)
            pert = ((i * 37) % 7 - 3) / 64.0
            e2 = 10.0 + e1 / 64.0 + n1 / 128.0 + pert
            n2 = -5.0 + e1 / 256.0 - n1 / 64.0 - pert
            if i in (5, 11):
                e2 += 8.0
                n2 -= 8.0
            out.append((e1, n1, e2, n2))
        return out

    def test_drops_exactly_the_planted_outliers(self):
        from gdal_spark.spatial.gcp import refine_gcps

        fit, kept = refine_gcps(self._fixture(), order=1, tolerance=0.5)
        assert [i for i in range(16) if i not in kept] == [5, 11]

    def test_means_stay_fixed_at_full_set_values(self):
        """The reference sets x1_mean once before the removal loop
        (gdal_crs.cpp:1142) — the refined fit must carry the POLLUTED
        full-set means, not the clean subset's."""
        from gdal_spark.spatial.gcp import refine_gcps

        gcps = self._fixture()
        fit, _ = refine_gcps(gcps, order=1, tolerance=0.5)
        assert fit.e_mean == sum(g[0] for g in gcps) / 16.0
        assert fit.n_mean == sum(g[1] for g in gcps) / 16.0

    def test_no_outliers_is_a_noop(self):
        from gdal_spark.spatial.gcp import fit_gcp_poly, gcp_fixture, \
            refine_gcps

        gcps = gcp_fixture(1)
        fit, kept = refine_gcps(gcps, order=1, tolerance=0.5)
        assert kept == list(range(len(gcps)))
        assert fit == fit_gcp_poly(gcps, order=1)

    def test_minimum_floor_respected(self):
        from gdal_spark.spatial.gcp import refine_gcps

        # absurdly tight tolerance: everything is an "outlier", but the
        # loop must stop at the minimum count (n_terms + 1 = 4)
        fit, kept = refine_gcps(self._fixture(), order=1, tolerance=1e-12)
        assert len(kept) == 4
