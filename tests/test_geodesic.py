"""Exact geodesics (spatial/geodesic.py): published anchors, an INDEPENDENT
RK4 integration of the geodesic ODEs (dφ/ds = cosα/M, dλ/ds = sinα/(N cosφ),
dα/ds = sinα·tanφ/N — a different formulation entirely, so agreement
certifies the auxiliary-sphere solver), area anchors from the authalic
identity, and the documented bounds of the closed-form approximations the
engine's cross-engine gates use."""

import math

import numpy as np
import pytest

from gdal_spark.spatial import geodesic as GD
from gdal_spark.spatial.ellipsoid import (
    WGS84_A as A,
    WGS84_E2 as E2,
    andoyer_distance_np,
)


def _rk4_direct(lat1, lon1, azi1, s12, steps=4000):
    """Integrate the geodesic ODEs from (lat1, lon1, azi1) for s12 metres.
    Curvature radii M = a(1−e²)/w³, N = a/w, w = √(1−e²sin²φ)."""
    phi = math.radians(lat1)
    lam = math.radians(lon1)
    alp = math.radians(azi1)
    h = s12 / steps

    def deriv(state):
        phi, lam, alp = state
        w = math.sqrt(1.0 - E2 * math.sin(phi) ** 2)
        m_rad = A * (1.0 - E2) / w ** 3
        n_rad = A / w
        return (
            math.cos(alp) / m_rad,
            math.sin(alp) / (n_rad * math.cos(phi)),
            math.sin(alp) * math.tan(phi) / n_rad,
        )

    state = (phi, lam, alp)
    for _ in range(steps):
        k1 = deriv(state)
        k2 = deriv(tuple(s + 0.5 * h * d for s, d in zip(state, k1)))
        k3 = deriv(tuple(s + 0.5 * h * d for s, d in zip(state, k2)))
        k4 = deriv(tuple(s + h * d for s, d in zip(state, k3)))
        state = tuple(
            s + (h / 6.0) * (a + 2 * b + 2 * c + d)
            for s, a, b, c, d in zip(state, k1, k2, k3, k4)
        )
    return math.degrees(state[0]), math.degrees(state[1])


# --- published / closed-form anchors -----------------------------------------

def test_quarter_meridian():
    # WGS84 quarter meridian: 10001965.7293 m (public figure)
    r = GD.inverse([0.0], [0.0], [90.0], [0.0])
    assert abs(r["s12"][0] - 10001965.7293) < 1e-3


def test_equator_is_geodesic():
    r = GD.inverse([0.0], [10.0], [0.0], [100.0])
    assert r["s12"][0] == pytest.approx(A * math.pi / 2.0, abs=1e-6)
    assert r["area12"][0] == 0.0


def test_octant_area_is_eighth_of_ellipsoid():
    a = GD.polygon_area_m2(
        np.array([0.0, 0.0, 90.0]), np.array([0.0, 90.0, 0.0])
    )
    assert a == pytest.approx(GD.TOTAL_AREA / 8.0, rel=1e-10)


def test_lune_area():
    # quarter lune: meridians 0 and 60 from equator to pole and back:
    # (0,0) -> (0,60) -> (90, anything): 60/360 of the hemisphere
    a = GD.polygon_area_m2(
        np.array([0.0, 0.0, 90.0]), np.array([0.0, 60.0, 0.0])
    )
    assert a == pytest.approx(GD.TOTAL_AREA / 2.0 * (60.0 / 360.0),
                              rel=1e-10)


def test_area_sign_orientation():
    ccw = GD.polygon_area_m2(np.array([10.0, 10.0, 20.0]),
                             np.array([10.0, 20.0, 15.0]))
    cw = GD.polygon_area_m2(np.array([10.0, 20.0, 10.0]),
                            np.array([10.0, 15.0, 20.0]))
    assert ccw > 0.0
    assert cw == pytest.approx(-ccw, rel=1e-12)


# --- independence: RK4 of the geodesic ODEs ---------------------------------

@pytest.mark.parametrize("seed", [1, 2, 3])
def test_inverse_matches_ode_integration(seed):
    """Solve the inverse problem, then shoot the reported (azi1, s12) with
    the RK4 integrator and require arrival at the target to ≲ 1 mm."""
    rng = np.random.default_rng(seed)
    lat1 = rng.uniform(-70, 70, 6)
    lon1 = rng.uniform(-180, 180, 6)
    lat2 = rng.uniform(-70, 70, 6)
    # keep |λ12| ≤ 120° (exact-path regime, far from the antipodal window)
    lon2 = lon1 + rng.uniform(-120, 120, 6)
    r = GD.inverse(lat1, lon1, lat2, lon2)
    assert r["exact"].all()
    for i in range(6):
        la, lo = _rk4_direct(lat1[i], lon1[i],
                             r["azi1"][i], r["s12"][i])
        dlat = abs(la - lat2[i])
        dlon = abs((lo - lon2[i] + 180.0) % 360.0 - 180.0)
        # 1e-8 deg ≈ 1.1 mm
        assert dlat < 2e-8, (i, lat1[i], lon1[i], lat2[i], lon2[i])
        assert dlon * math.cos(math.radians(lat2[i])) < 2e-8


# --- documented bounds of the engine's closed-form gates --------------------

def test_andoyer_within_documented_bound():
    rng = np.random.default_rng(42)
    lat1 = rng.uniform(-80, 80, 200)
    lon1 = rng.uniform(-180, 180, 200)
    lat2 = rng.uniform(-80, 80, 200)
    lon2 = lon1 + rng.uniform(-170, 170, 200)
    exact = GD.inverse(lat1, lon1, lat2, lon2)
    assert exact["exact"].all()
    approx = andoyer_distance_np(lat1, lon1, lat2, lon2)
    err = np.abs(exact["s12"] - approx)
    # measured against the exact solver: ≤ 25 m below 10,000 km, growing
    # to ~160 m at near-antipodal scale (O(f²·a) with a distance-dependent
    # constant — ellipsoid.py documents these figures)
    mid = exact["s12"] < 10_000_000.0
    assert err[mid].max() < 25.0
    assert err.max() < 180.0
    # explicit short lines (< 100 km)
    sl1 = rng.uniform(-70, 70, 50)
    sn1 = rng.uniform(-170, 170, 50)
    sl2 = sl1 + rng.uniform(-0.5, 0.5, 50)
    sn2 = sn1 + rng.uniform(-0.5, 0.5, 50)
    e2 = GD.inverse(sl1, sn1, sl2, sn2)
    a2 = andoyer_distance_np(sl1, sn1, sl2, sn2)
    # measured: Andoyer is centimetre-grade at this scale (max ~9 cm at
    # 67 km in this sample; the ODE cross-check attributes the residual
    # to Andoyer, not the solver)
    assert np.abs(e2["s12"] - a2).max() < 0.15


def test_authalic_area_within_documented_bound():
    """The cross-engine area gate maps to the authalic sphere; its residual
    vs exact S12 is O(f²) relative for few-degree edges (ellipsoid.py
    docstring) — assert it on a fixture-scale polygon."""
    from gdal_spark.spatial.ellipsoid import (
        AUTHALIC_RADIUS, authalic_lat_np,
    )
    lats = np.array([40.0, 40.0, 43.0, 43.0])
    lons = np.array([5.0, 9.0, 9.0, 5.0])
    exact = GD.polygon_area_m2(lats, lons)
    # authalic: spherical shoelace (L'Huilier-free CD sum) on authalic lats
    xi = authalic_lat_np(np.radians(np.append(lats, lats[0])))
    lam = np.radians(np.append(lons, lons[0]))
    s = 0.0
    for i in range(4):
        s += (lam[i + 1] - lam[i]) * (
            2.0 + np.sin(xi[i]) + np.sin(xi[i + 1])
        )
    approx = -(AUTHALIC_RADIUS ** 2) * s / 2.0
    # measured residual on this 4°×3° rectangle: 1.3e-4 relative — edge
    # shape (trapezoid-in-(λ,sinξ) vs true geodesic), not ellipsoidal
    assert abs(approx) == pytest.approx(abs(exact), rel=5e-4)


# --- symmetries / degeneracies -----------------------------------------------

def test_symmetry_and_degenerate():
    r_ab = GD.inverse([10.0], [20.0], [-35.0], [80.0])
    r_ba = GD.inverse([-35.0], [80.0], [10.0], [20.0])
    assert r_ab["s12"][0] == pytest.approx(r_ba["s12"][0], abs=1e-6)
    assert r_ab["area12"][0] == pytest.approx(-r_ba["area12"][0], abs=1e-3)
    same = GD.inverse([10.0], [20.0], [10.0], [20.0])
    assert same["s12"][0] == 0.0 and same["area12"][0] == 0.0


def test_antipodal_fallback_flagged():
    r = GD.inverse([10.0], [0.0], [-10.5], [179.9])
    assert not r["exact"][0]
    # fallback is Andoyer — within its bound of the true antipodal-scale d
    assert 1.9e7 < r["s12"][0] < 2.1e7


def test_meridional_and_pole():
    # exact meridian arcs from the (independently validated) Krüger series
    from gdal_spark.spatial.projections import WGS84, meridian_arc

    r = GD.inverse([-45.0], [7.0], [60.0], [7.0])
    want = meridian_arc(60.0, WGS84) + meridian_arc(45.0, WGS84)
    assert r["s12"][0] == pytest.approx(want, abs=1e-3)
    r = GD.inverse([20.0], [30.0], [90.0], [30.0])
    # meridian_arc(90) hits atanh(1); use the public quarter-meridian value
    want = 10001965.7293 - meridian_arc(20.0, WGS84)
    assert r["s12"][0] == pytest.approx(want, abs=1e-3)
