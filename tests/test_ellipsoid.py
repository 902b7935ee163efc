"""Ellipsoidal measures: Andoyer–Lambert vs an independent Vincenty
implementation (iterative, test-local) and authalic-sphere area checks."""

import math

import numpy as np

from gdal_spark.spatial import ellipsoid as EL


def _vincenty(lat1, lon1, lat2, lon2):
    """Test-local Vincenty inverse (converges for the non-antipodal cases
    used here); returns metres on WGS84."""
    a, f = EL.WGS84_A, EL.WGS84_F
    b = a * (1 - f)
    L = math.radians(lon2 - lon1)
    u1 = math.atan((1 - f) * math.tan(math.radians(lat1)))
    u2 = math.atan((1 - f) * math.tan(math.radians(lat2)))
    su1, cu1, su2, cu2 = math.sin(u1), math.cos(u1), math.sin(u2), math.cos(u2)
    lam = L
    for _ in range(200):
        sl, cl = math.sin(lam), math.cos(lam)
        ss = math.sqrt((cu2 * sl) ** 2 + (cu1 * su2 - su1 * cu2 * cl) ** 2)
        if ss == 0:
            return 0.0
        cs = su1 * su2 + cu1 * cu2 * cl
        sig = math.atan2(ss, cs)
        sa = cu1 * cu2 * sl / ss
        c2a = 1 - sa * sa
        c2m = cs - 2 * su1 * su2 / c2a if c2a != 0 else 0.0
        C = f / 16 * c2a * (4 + f * (4 - 3 * c2a))
        lam_new = L + (1 - C) * f * sa * (
            sig + C * ss * (c2m + C * cs * (-1 + 2 * c2m * c2m))
        )
        if abs(lam_new - lam) < 1e-13:
            lam = lam_new
            break
        lam = lam_new
    uu2 = c2a * (a * a - b * b) / (b * b)
    A = 1 + uu2 / 16384 * (4096 + uu2 * (-768 + uu2 * (320 - 175 * uu2)))
    B = uu2 / 1024 * (256 + uu2 * (-128 + uu2 * (74 - 47 * uu2)))
    dsig = B * ss * (c2m + B / 4 * (
        cs * (-1 + 2 * c2m * c2m)
        - B / 6 * c2m * (-3 + 4 * ss * ss) * (-3 + 4 * c2m * c2m)))
    return b * A * (sig - dsig)


def test_andoyer_close_to_vincenty():
    cases = [
        (48.8566, 2.3522, 40.7128, -74.0060),   # Paris - New York
        (35.0, 139.0, -33.9, 151.2),            # Tokyo - Sydney
        (0.0, 0.0, 0.5, 0.5),                   # short equatorial
        (60.0, 10.0, 60.0, 10.001),             # ~55 m east-west
    ]
    for lat1, lon1, lat2, lon2 in cases:
        v = _vincenty(lat1, lon1, lat2, lon2)
        d = float(EL.andoyer_distance_np(
            np.array([lat1]), np.array([lon1]),
            np.array([lat2]), np.array([lon2]))[0])
        # Andoyer is O(f^2 a): metre-level on intercontinental lines,
        # sub-millimetre at < 100 km
        assert abs(d - v) < max(1.0, 1e-6 * v), (lat1, lon1, lat2, lon2, d, v)


def test_andoyer_zero_and_symmetry():
    d0 = EL.andoyer_distance_np(
        np.array([10.0]), np.array([20.0]), np.array([10.0]), np.array([20.0])
    )
    assert d0[0] == 0.0
    ab = EL.andoyer_distance_np(
        np.array([10.0]), np.array([20.0]), np.array([-5.0]), np.array([47.0]))
    ba = EL.andoyer_distance_np(
        np.array([-5.0]), np.array([47.0]), np.array([10.0]), np.array([20.0]))
    assert math.isclose(ab[0], ba[0], rel_tol=1e-12)


def test_authalic_radius_value():
    # published WGS84 authalic radius
    assert abs(EL.AUTHALIC_RADIUS - 6371007.1810) < 0.01


def test_authalic_band_area_exact():
    """The authalic mapping preserves zonal band areas exactly: the strip
    lat in [0, 30] over all longitudes has ellipsoidal area equal to the
    authalic-sphere band area; compare the series mapping against the
    closed-form q ratio (Snyder eq. 3-12)."""
    e2, e = EL.WGS84_E2, math.sqrt(EL.WGS84_E2)

    def q(phi):
        s = math.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))

    qp = q(math.pi / 2)
    for deg in (15.0, 30.0, 60.0, 85.0):
        phi = math.radians(deg)
        xi_exact = math.asin(q(phi) / qp)
        xi_series = float(EL.authalic_lat_np(np.array([phi]))[0])
        assert abs(xi_series - xi_exact) < 5e-9, deg
