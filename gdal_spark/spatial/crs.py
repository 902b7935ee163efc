"""UTM (transverse Mercator) projection — CRS support beyond the closed-form
WebMercator pair.

Reference semantics: ``OGRCreateCoordinateTransformation`` (ogr/ogrct.cpp:
1002) delegating to PROJ's ``tmerc`` (Krüger series). This module
re-derives the projection from the PUBLIC Karney 2011 / Krüger n-series
formulation (the same series PROJ's etmerc uses, truncated at n³ — error
< 0.1 mm inside a zone) as three parallel implementations with IDENTICAL
arithmetic structure:

* Spark Column expressions (whole-stage codegen, map-only),
* a DuckDB SQL fragment (the independent oracle engine),
* a numpy mirror (unit tests / round-trip).

atanh is expanded as 0.5·ln((1+x)/(1-x)) everywhere so both engines run the
same floating-point expression tree rather than different libm entry
points.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# WGS84 (the reference's default datum; ellps constants are public)
A_WGS84 = 6378137.0
F_INV = 298.257223563
_f = 1.0 / F_INV
N_ = _f / (2.0 - _f)                       # third flattening n
K0 = 0.9996
E0 = 500000.0                              # false easting
N0_SOUTH = 10000000.0                      # false northing, southern rows

# rectifying radius and the Krüger alpha series (truncated at n^3)
A_CAP = A_WGS84 / (1.0 + N_) * (1.0 + N_ ** 2 / 4.0 + N_ ** 4 / 64.0)
ALPHA = (
    N_ / 2.0 - 2.0 * N_ ** 2 / 3.0 + 5.0 * N_ ** 3 / 16.0,
    13.0 * N_ ** 2 / 48.0 - 3.0 * N_ ** 3 / 5.0,
    61.0 * N_ ** 3 / 240.0,
)
BETA = (
    N_ / 2.0 - 2.0 * N_ ** 2 / 3.0 - 37.0 * N_ ** 3 / 96.0,
    N_ ** 2 / 48.0 + N_ ** 3 / 15.0,
    17.0 * N_ ** 3 / 480.0,
)
_TWO_SQRTN = 2.0 * np.sqrt(N_) / (1.0 + N_)


def utm_zone(lon: Column) -> Column:
    """UTM zone number from longitude (1..60)."""
    return (F.floor((lon + 180.0) / 6.0) + 1).cast("int")


def zone_central_meridian(zone: Column) -> Column:
    return (zone.cast("double") * 6.0 - 183.0)


def utm_forward(lon: Column, lat: Column, zone: Column) -> tuple[Column, Column]:
    """(easting, northing) Columns — Krüger series, identical structure to
    sql_utm_forward / py_utm_forward."""
    lam = F.radians(lon - zone_central_meridian(zone))
    phi = F.radians(lat)
    sphi = F.sin(phi)

    def atanh_c(x):
        return 0.5 * F.log((1.0 + x) / (1.0 - x))

    # sinh/cosh expanded via exp on BOTH engines (DuckDB has no sinh/cosh;
    # identical expression trees keep the two engines bit-comparable)
    def sinh_c(x):
        return (F.exp(x) - F.exp(-x)) / 2.0

    def cosh_c(x):
        return (F.exp(x) + F.exp(-x)) / 2.0

    t = sinh_c(
        atanh_c(sphi) - F.lit(_TWO_SQRTN) * atanh_c(F.lit(_TWO_SQRTN) * sphi)
    )
    xi = F.atan2(t, F.cos(lam))
    eta = atanh_c(F.sin(lam) / F.sqrt(1.0 + t * t))
    e_sum, n_sum = eta, xi
    for j, a_j in enumerate(ALPHA, start=1):
        e_sum = e_sum + F.lit(a_j) * F.cos(2.0 * j * xi) * sinh_c(2.0 * j * eta)
        n_sum = n_sum + F.lit(a_j) * F.sin(2.0 * j * xi) * cosh_c(2.0 * j * eta)
    easting = F.lit(E0) + F.lit(K0 * A_CAP) * e_sum
    northing_raw = F.lit(K0 * A_CAP) * n_sum
    northing = F.when(lat < 0.0, northing_raw + F.lit(N0_SOUTH)).otherwise(
        northing_raw
    )
    return easting, northing


def sql_utm_forward(lon: str, lat: str) -> tuple[str, str, str]:
    """(zone_expr, easting_expr, northing_expr) DuckDB fragments mirroring
    utm_forward term-for-term."""
    zone = f"(floor((({lon}) + 180.0) / 6.0) + 1)::int"
    lon0 = f"({zone}::double * 6.0 - 183.0)"
    lam = f"radians(({lon}) - {lon0})"
    phi = f"radians({lat})"
    sphi = f"sin({phi})"

    def atanh_s(x):
        return f"(0.5 * ln((1.0 + {x}) / (1.0 - {x})))"

    def sinh_s(x):
        return f"((exp({x}) - exp(-({x}))) / 2.0)"

    def cosh_s(x):
        return f"((exp({x}) + exp(-({x}))) / 2.0)"

    t = sinh_s(
        f"{atanh_s(sphi)} - {_TWO_SQRTN!r} * "
        f"{atanh_s(f'({_TWO_SQRTN!r} * {sphi})')}"
    )
    xi = f"atan2({t}, cos({lam}))"
    eta = atanh_s(f"(sin({lam}) / sqrt(1.0 + ({t}) * ({t})))")
    e_terms = [eta]
    n_terms = [xi]
    for j, a_j in enumerate(ALPHA, start=1):
        e_terms.append(
            f"{a_j!r} * cos(2.0 * {j} * ({xi})) * {sinh_s(f'2.0 * {j} * ({eta})')}"
        )
        n_terms.append(
            f"{a_j!r} * sin(2.0 * {j} * ({xi})) * {cosh_s(f'2.0 * {j} * ({eta})')}"
        )
    easting = f"({E0!r} + {K0 * A_CAP!r} * ({' + '.join(e_terms)}))"
    n_raw = f"({K0 * A_CAP!r} * ({' + '.join(n_terms)}))"
    northing = f"(CASE WHEN ({lat}) < 0.0 THEN {n_raw} + {N0_SOUTH!r} ELSE {n_raw} END)"
    return zone, easting, northing


def py_utm_forward(lon, lat):
    """numpy mirror (tests). Returns (zone, easting, northing)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1
    lam = np.radians(lon - (zone * 6.0 - 183.0))
    phi = np.radians(lat)
    sphi = np.sin(phi)
    atanh = lambda x: 0.5 * np.log((1.0 + x) / (1.0 - x))
    t = np.sinh(atanh(sphi) - _TWO_SQRTN * atanh(_TWO_SQRTN * sphi))
    xi = np.arctan2(t, np.cos(lam))
    eta = atanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    e_sum, n_sum = eta.copy(), xi.copy()
    for j, a_j in enumerate(ALPHA, start=1):
        e_sum += a_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        n_sum += a_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    easting = E0 + K0 * A_CAP * e_sum
    northing = K0 * A_CAP * n_sum + np.where(lat < 0.0, N0_SOUTH, 0.0)
    return zone, easting, northing


def py_utm_inverse(easting, northing, zone, south=False):
    """numpy inverse (beta series) — round-trip closure for tests."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    northing = northing - np.where(south, N0_SOUTH, 0.0)
    xi = northing / (K0 * A_CAP)
    eta = (easting - E0) / (K0 * A_CAP)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b_j in enumerate(BETA, start=1):
        xi_p -= b_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal -> geodetic latitude series in n (Karney 2011 delta coeffs)
    phi = chi + (
        (2 * N_ - 2 * N_ ** 2 / 3 - 2 * N_ ** 3) * np.sin(2 * chi)
        + (7 * N_ ** 2 / 3 - 8 * N_ ** 3 / 5) * np.sin(4 * chi)
        + (56 * N_ ** 3 / 15) * np.sin(6 * chi)
    )
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + (zone * 6.0 - 183.0)
    lat = np.degrees(phi)
    return lon, lat


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal-Area (spherical form — Snyder 1987 eq. 24-2..24-4;
# the reference reaches LAEA through PROJ (ogr/ogrct.cpp), e.g. EPSG:3035's
# projection method; sphere radius = the engine-wide EARTH_RADIUS so the
# great-circle/geodesic gates and this one share one figure of the earth).
# ---------------------------------------------------------------------------

def laea_forward(
    lon: Column, lat: Column, lon0: float, lat1: float
) -> tuple[Column, Column]:
    """Spherical LAEA forward as pure column math (map-only)."""
    from pyspark.sql import functions as F

    from gdal_spark.spatial.geometry import EARTH_RADIUS

    sp1 = math.sin(math.radians(lat1))
    cp1 = math.cos(math.radians(lat1))
    lam = F.radians(lon - lon0)
    phi = F.radians(lat)
    denom = (
        F.lit(1.0)
        + F.lit(sp1) * F.sin(phi)
        + F.lit(cp1) * F.cos(phi) * F.cos(lam)
    )
    k = F.sqrt(F.lit(2.0) / denom)
    x = F.lit(EARTH_RADIUS) * k * F.cos(phi) * F.sin(lam)
    y = F.lit(EARTH_RADIUS) * k * (
        F.lit(cp1) * F.sin(phi) - F.lit(sp1) * F.cos(phi) * F.cos(lam)
    )
    return x, y


def sql_laea_forward(
    lon: str, lat: str, lon0: float, lat1: float
) -> tuple[str, str]:
    """DuckDB fragments mirroring laea_forward term-for-term."""
    from gdal_spark.spatial.geometry import EARTH_RADIUS

    sp1 = math.sin(math.radians(lat1))
    cp1 = math.cos(math.radians(lat1))
    lam = f"radians(({lon}) - {lon0!r})"
    phi = f"radians({lat})"
    denom = (
        f"(1.0 + {sp1!r} * sin({phi}) + "
        f"{cp1!r} * cos({phi}) * cos({lam}))"
    )
    k = f"sqrt(2.0 / {denom})"
    x = f"({EARTH_RADIUS!r} * {k} * cos({phi}) * sin({lam}))"
    y = (
        f"({EARTH_RADIUS!r} * {k} * ({cp1!r} * sin({phi}) - "
        f"{sp1!r} * cos({phi}) * cos({lam})))"
    )
    return x, y


# ---------------------------------------------------------------------------
# UTM inverse (beta series) as three parallel implementations with one
# expression tree — the dst→src transform of a gdalwarp into a UTM target
# (PROJ tmerc inverse; Karney 2011 §5).  Hyperbolics are exp-expanded in
# ALL THREE so Spark, DuckDB, and the numpy warp kernel evaluate the same
# floating-point ops (np.sinh/np.cosh in py_utm_inverse above are fine for
# round-trip tests but are different libm entry points).
# ---------------------------------------------------------------------------

# conformal → geodetic latitude series coefficients (delta, Karney 2011)
_DELTA = (
    2.0 * N_ - 2.0 * N_ ** 2 / 3.0 - 2.0 * N_ ** 3,
    7.0 * N_ ** 2 / 3.0 - 8.0 * N_ ** 3 / 5.0,
    56.0 * N_ ** 3 / 15.0,
)


def utm_inverse(
    easting: Column, northing: Column, zone: int
) -> tuple[Column, Column]:
    """Column UTM inverse (northern hemisphere): (lon, lat) degrees."""
    def sinh_c(x):
        return (F.exp(x) - F.exp(-x)) / 2.0

    def cosh_c(x):
        return (F.exp(x) + F.exp(-x)) / 2.0

    xi = northing / F.lit(K0 * A_CAP)
    eta = (easting - F.lit(E0)) / F.lit(K0 * A_CAP)
    xi_p, eta_p = xi, eta
    for j, b_j in enumerate(BETA, start=1):
        xi_p = xi_p - F.lit(b_j) * F.sin(2.0 * j * xi) * cosh_c(
            2.0 * j * eta)
        eta_p = eta_p - F.lit(b_j) * F.cos(2.0 * j * xi) * sinh_c(
            2.0 * j * eta)
    chi = F.asin(F.sin(xi_p) / cosh_c(eta_p))
    phi = chi + (
        F.lit(_DELTA[0]) * F.sin(2.0 * chi)
        + F.lit(_DELTA[1]) * F.sin(4.0 * chi)
        + F.lit(_DELTA[2]) * F.sin(6.0 * chi)
    )
    lam = F.atan2(sinh_c(eta_p), F.cos(xi_p))
    lon = F.degrees(lam) + F.lit(zone * 6.0 - 183.0)
    lat = F.degrees(phi)
    return lon, lat


def sql_utm_inverse(easting: str, northing: str, zone: int):
    """DuckDB fragments mirroring utm_inverse term-for-term."""
    def sinh_s(x):
        return f"((exp({x}) - exp(-({x}))) / 2.0)"

    def cosh_s(x):
        return f"((exp({x}) + exp(-({x}))) / 2.0)"

    xi = f"(({northing}) / {K0 * A_CAP!r})"
    eta = f"((({easting}) - {E0!r}) / {K0 * A_CAP!r})"
    xi_p, eta_p = xi, eta
    for j, b_j in enumerate(BETA, start=1):
        xi_p = (
            f"({xi_p} - {b_j!r} * sin(2.0 * {j} * {xi})"
            f" * {cosh_s(f'2.0 * {j} * {eta}')})"
        )
        eta_p = (
            f"({eta_p} - {b_j!r} * cos(2.0 * {j} * {xi})"
            f" * {sinh_s(f'2.0 * {j} * {eta}')})"
        )
    chi = f"asin(sin({xi_p}) / {cosh_s(eta_p)})"
    phi = (
        f"({chi} + ({_DELTA[0]!r} * sin(2.0 * {chi})"
        f" + {_DELTA[1]!r} * sin(4.0 * {chi})"
        f" + {_DELTA[2]!r} * sin(6.0 * {chi})))"
    )
    lam = f"atan2({sinh_s(eta_p)}, cos({xi_p}))"
    lon = f"(degrees({lam}) + {zone * 6.0 - 183.0!r})"
    lat = f"degrees({phi})"
    return lon, lat


def np_utm_inverse_mirror(easting, northing, zone: int):
    """numpy mirror of utm_inverse / sql_utm_inverse for the warp kernel —
    exp-expanded hyperbolics, identical term order."""
    sinh = lambda x: (np.exp(x) - np.exp(-x)) / 2.0  # noqa: E731
    cosh = lambda x: (np.exp(x) + np.exp(-x)) / 2.0  # noqa: E731
    xi = np.asarray(northing, dtype=np.float64) / (K0 * A_CAP)
    eta = (np.asarray(easting, dtype=np.float64) - E0) / (K0 * A_CAP)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b_j in enumerate(BETA, start=1):
        xi_p = xi_p - b_j * np.sin(2.0 * j * xi) * cosh(2.0 * j * eta)
        eta_p = eta_p - b_j * np.cos(2.0 * j * xi) * sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / cosh(eta_p))
    phi = chi + (
        _DELTA[0] * np.sin(2.0 * chi)
        + _DELTA[1] * np.sin(4.0 * chi)
        + _DELTA[2] * np.sin(6.0 * chi)
    )
    lam = np.arctan2(sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + (zone * 6.0 - 183.0)
    lat = np.degrees(phi)
    return lon, lat
