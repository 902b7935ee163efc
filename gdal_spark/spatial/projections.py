"""Parameterized CRS families — generic transverse Mercator (any zone /
central meridian / ellipsoid / false origin), Lambert Conformal Conic
(1SP + 2SP), polar stereographic (variant B) and Albers equal-area, plus a
small EPSG parameter table.

Reference semantics: ``OGRCreateCoordinateTransformation`` (ogr/ogrct.cpp:
1002) delegates every EPSG code to PROJ's projection methods.  This module
re-derives the four highest-traffic conformal/equal-area families from the
PUBLIC closed forms (EPSG Guidance Note 7-2 / Snyder 1987 / Karney 2011
Krüger n-series) — NOT a port of PROJ.

Everything is built through a dual emitter ``D``: one expression tree is
written once and materializes as BOTH a Spark ``Column`` (whole-stage
codegen, map-only) and a DuckDB SQL fragment (the independent oracle
engine), so cross-engine float exactness holds by construction — the two
engines execute the same arithmetic in the same order.  Hyperbolics and
``pow`` are expanded via exp/ln (the lesson from spatial/crs.py: identical
libm entry points on both engines).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Dual emitter: a value that is simultaneously a Spark Column and a DuckDB
# SQL fragment, composed through ordinary Python arithmetic.
# ---------------------------------------------------------------------------

class D:
    """The Spark side is LAZY (a thunk): oracle SQL strings are composed at
    module-import time, before any SparkContext exists, and ``F.lit``/column
    arithmetic require an active context.  ``d.c`` materializes the Column.

    ``c`` is MEMOIZED per node: the Krüger/LCC expression graphs share
    subexpressions heavily (a DAG), and evaluating the thunks as a tree
    re-materialized every shared node once per path — tens of thousands of
    py4j round-trips (~10 s of driver time per projection build, measured).
    Caching makes Column construction proportional to the DAG size.  Safe
    because Columns are immutable expression wrappers and every gate builds
    a fresh D graph per invocation (no cross-session reuse of cached
    Columns)."""

    __slots__ = ("_cf", "s", "_cc")

    def __init__(self, cf, s: str):
        self._cf = cf
        self.s = s
        self._cc = None

    @property
    def c(self) -> Column:
        if self._cc is None:
            self._cc = self._cf()
        return self._cc

    # -- arithmetic (floats lift to literals; same repr text in SQL) -------
    def __add__(self, o):
        o = lift(o)
        return D(lambda a=self, b=o: a.c + b.c, f"({self.s} + {o.s})")

    def __radd__(self, o):
        return lift(o) + self

    def __sub__(self, o):
        o = lift(o)
        return D(lambda a=self, b=o: a.c - b.c, f"({self.s} - {o.s})")

    def __rsub__(self, o):
        return lift(o) - self

    def __mul__(self, o):
        o = lift(o)
        return D(lambda a=self, b=o: a.c * b.c, f"({self.s} * {o.s})")

    def __rmul__(self, o):
        return lift(o) * self

    def __truediv__(self, o):
        o = lift(o)
        return D(lambda a=self, b=o: a.c / b.c, f"({self.s} / {o.s})")

    def __rtruediv__(self, o):
        return lift(o) / self

    def __neg__(self):
        return D(lambda a=self: -a.c, f"(-{self.s})")

    # -- comparisons (for dcase predicates) ---------------------------------
    def __lt__(self, o):
        o = lift(o)
        return D(lambda a=self, b=o: a.c < b.c, f"({self.s} < {o.s})")

    def __gt__(self, o):
        o = lift(o)
        return D(lambda a=self, b=o: a.c > b.c, f"({self.s} > {o.s})")


def lift(v) -> D:
    if isinstance(v, D):
        return v
    f = float(v)
    return D(lambda v=f: F.lit(v), repr(f))


def _fn(name: str):
    def apply(x: D) -> D:
        x = lift(x)
        return D(lambda a=x: getattr(F, name)(a.c), f"{name}({x.s})")

    return apply


dsin = _fn("sin")
dcos = _fn("cos")
dtan = _fn("tan")
dasin = _fn("asin")
datan = _fn("atan")
dsqrt = _fn("sqrt")
dexp = _fn("exp")
dabs = _fn("abs")


def dln(x: D) -> D:
    x = lift(x)
    return D(lambda a=x: F.log(a.c), f"ln({x.s})")


def datan2(y: D, x: D) -> D:
    y, x = lift(y), lift(x)
    return D(lambda a=y, b=x: F.atan2(a.c, b.c), f"atan2({y.s}, {x.s})")


def dpow(x: D, p) -> D:
    """x**p via exp(p·ln x) — identical libm path on both engines.
    Caller guarantees x > 0."""
    return dexp(lift(p) * dln(x))


def dsinh(x: D) -> D:
    x = lift(x)
    return (dexp(x) - dexp(-x)) / 2.0


def dcosh(x: D) -> D:
    x = lift(x)
    return (dexp(x) + dexp(-x)) / 2.0


def datanh(x: D) -> D:
    x = lift(x)
    return 0.5 * dln((1.0 + x) / (1.0 - x))


def dradians(x: D) -> D:
    x = lift(x)
    return D(lambda a=x: F.radians(a.c), f"radians({x.s})")


def col(name: str) -> D:
    """A source column by name — same identifier on both engines."""
    return D(lambda n=name: F.col(n), name)


def dfloor(x: D) -> D:
    x = lift(x)
    return D(
        lambda a=x: F.floor(a.c).cast("double"),
        f"CAST(floor({x.s}) AS DOUBLE)",
    )


def dcase(pred: D, then_v, else_v) -> D:
    then_v, else_v = lift(then_v), lift(else_v)
    return D(
        lambda p=pred, a=then_v, b=else_v: F.when(p.c, a.c).otherwise(b.c),
        f"(CASE WHEN {pred.s} THEN {then_v.s} ELSE {else_v.s} END)",
    )


# ---------------------------------------------------------------------------
# Ellipsoids (public EPSG datum constants)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Ellipsoid:
    name: str
    a: float
    f_inv: float

    @property
    def f(self) -> float:
        return 1.0 / self.f_inv

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)

    @property
    def e(self) -> float:
        return math.sqrt(self.e2)

    @property
    def n3(self) -> float:  # third flattening
        return self.f / (2.0 - self.f)


WGS84 = Ellipsoid("WGS84", 6378137.0, 298.257223563)
GRS80 = Ellipsoid("GRS80", 6378137.0, 298.257222101)
AIRY1830 = Ellipsoid("Airy1830", 6377563.396, 299.3249646)
INTL1924 = Ellipsoid("International1924", 6378388.0, 297.0)
CLARKE1866 = Ellipsoid("Clarke1866", 6378206.4, 294.978698214)


def _iso_t(phi: D, e: float) -> D:
    """EPSG GN7-2 conformal ``t`` = tan(pi/4 - phi/2) /
    ((1 - e sin phi)/(1 + e sin phi))^(e/2)."""
    sphi = dsin(phi)
    return dtan(lift(math.pi / 4.0) - phi / 2.0) / dpow(
        (1.0 - e * sphi) / (1.0 + e * sphi), e / 2.0
    )


def _iso_m(phi_deg: float, ell: Ellipsoid) -> float:
    """Scalar m(phi) = cos phi / sqrt(1 - e^2 sin^2 phi)."""
    p = math.radians(phi_deg)
    return math.cos(p) / math.sqrt(1.0 - ell.e2 * math.sin(p) ** 2)


def _iso_t_scalar(phi_deg: float, ell: Ellipsoid) -> float:
    p = math.radians(phi_deg)
    e = ell.e
    return math.tan(math.pi / 4.0 - p / 2.0) / (
        (1.0 - e * math.sin(p)) / (1.0 + e * math.sin(p))
    ) ** (e / 2.0)


def _chi_series(chi: D, ell: Ellipsoid) -> D:
    """Conformal → geodetic latitude series (EPSG GN7-2 / Snyder 3-5)."""
    e2 = ell.e2
    c2 = e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0
    c4 = 7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0
    c6 = 7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0
    c8 = 4279.0 * e2**4 / 161280.0
    return (
        chi
        + c2 * dsin(2.0 * chi)
        + c4 * dsin(4.0 * chi)
        + c6 * dsin(6.0 * chi)
        + c8 * dsin(8.0 * chi)
    )


# ---------------------------------------------------------------------------
# Generic transverse Mercator (Krüger n-series, any ellipsoid / lon0 / lat0
# / k0 / false origin).  Mirrors spatial/crs.py's fixed-WGS84 UTM pair —
# coefficients are recomputed per ellipsoid.
# ---------------------------------------------------------------------------

def _kruger_coeffs(ell: Ellipsoid):
    n = ell.n3
    a_cap = ell.a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0,
        61.0 * n**3 / 240.0,
    )
    beta = (
        n / 2.0 - 2.0 * n**2 / 3.0 - 37.0 * n**3 / 96.0,
        n**2 / 48.0 + n**3 / 15.0,
        17.0 * n**3 / 480.0,
    )
    delta = (
        2.0 * n - 2.0 * n**2 / 3.0 - 2.0 * n**3,
        7.0 * n**2 / 3.0 - 8.0 * n**3 / 5.0,
        56.0 * n**3 / 15.0,
    )
    two_sqrtn = 2.0 * math.sqrt(n) / (1.0 + n)
    return a_cap, alpha, beta, delta, two_sqrtn


def meridian_arc(lat_deg: float, ell: Ellipsoid) -> float:
    """Scalar meridian arc length from the equator (Krüger series) — the
    M0 offset a natural-origin latitude subtracts from northing."""
    a_cap, alpha, _, _, two_sqrtn = _kruger_coeffs(ell)
    phi = math.radians(lat_deg)
    sphi = math.sin(phi)
    atanh = lambda x: 0.5 * math.log((1.0 + x) / (1.0 - x))  # noqa: E731
    t = math.sinh(atanh(sphi) - two_sqrtn * atanh(two_sqrtn * sphi))
    xi = math.atan(t)
    s = xi
    for j, a_j in enumerate(alpha, start=1):
        s += a_j * math.sin(2.0 * j * xi)
    return a_cap * s


def tmerc_forward(
    lon: D,
    lat: D,
    *,
    ell: Ellipsoid = WGS84,
    lon0: float | D = 0.0,
    lat0: float = 0.0,
    k0: float = 0.9996,
    fe: float = 500000.0,
    fn: float = 0.0,
) -> tuple[D, D]:
    """Generic Krüger-series transverse Mercator forward.  ``lon0`` may be
    a per-row ``D`` (UTM any-zone) or a scalar (national grids)."""
    a_cap, alpha, _, _, two_sqrtn = _kruger_coeffs(ell)
    lam = dradians(lift(lon) - lift(lon0))
    phi = dradians(lat)
    sphi = dsin(phi)
    t = dsinh(datanh(sphi) - two_sqrtn * datanh(lift(two_sqrtn) * sphi))
    xi = datan2(t, dcos(lam))
    eta = datanh(dsin(lam) / dsqrt(1.0 + t * t))
    e_sum, n_sum = eta, xi
    for j, a_j in enumerate(alpha, start=1):
        e_sum = e_sum + a_j * dcos(2.0 * j * xi) * dsinh(2.0 * j * eta)
        n_sum = n_sum + a_j * dsin(2.0 * j * xi) * dcosh(2.0 * j * eta)
    m0 = meridian_arc(lat0, ell) if lat0 else 0.0
    easting = fe + (k0 * a_cap) * e_sum
    northing = (fn - k0 * m0) + (k0 * a_cap) * n_sum
    return easting, northing


def tmerc_inverse(
    easting: D,
    northing: D,
    *,
    ell: Ellipsoid = WGS84,
    lon0: float | D = 0.0,
    lat0: float = 0.0,
    k0: float = 0.9996,
    fe: float = 500000.0,
    fn: float = 0.0,
) -> tuple[D, D]:
    """Generic Krüger beta-series inverse → (lon, lat) degrees."""
    a_cap, _, beta, delta, _ = _kruger_coeffs(ell)
    m0 = meridian_arc(lat0, ell) if lat0 else 0.0
    xi = (lift(northing) - (fn - k0 * m0)) / (k0 * a_cap)
    eta = (lift(easting) - fe) / (k0 * a_cap)
    xi_p, eta_p = xi, eta
    for j, b_j in enumerate(beta, start=1):
        xi_p = xi_p - b_j * dsin(2.0 * j * xi) * dcosh(2.0 * j * eta)
        eta_p = eta_p - b_j * dcos(2.0 * j * xi) * dsinh(2.0 * j * eta)
    chi = dasin(dsin(xi_p) / dcosh(eta_p))
    phi = (
        chi
        + delta[0] * dsin(2.0 * chi)
        + delta[1] * dsin(4.0 * chi)
        + delta[2] * dsin(6.0 * chi)
    )
    lam = datan2(dsinh(eta_p), dcos(xi_p))
    lon = lam * (180.0 / math.pi) + lift(lon0)
    lat = phi * (180.0 / math.pi)
    return lon, lat


# ---------------------------------------------------------------------------
# Lambert Conformal Conic — EPSG method 9802 (2SP) and 9801 (1SP).
# Closed forms from EPSG GN7-2 §1.3.1.1 / Snyder 1987 eq. 15-1..15-10.
# ---------------------------------------------------------------------------

def _lcc_constants(
    ell: Ellipsoid,
    lat1: float,
    lat2: float | None,
    lat0: float,
    k0: float = 1.0,
):
    t0 = _iso_t_scalar(lat0, ell)
    t1 = _iso_t_scalar(lat1, ell)
    m1 = _iso_m(lat1, ell)
    if lat2 is None or lat2 == lat1:  # 1SP (n = sin lat1)
        n = math.sin(math.radians(lat1))
        big_f = m1 / (n * t1**n)
    else:
        t2 = _iso_t_scalar(lat2, ell)
        m2 = _iso_m(lat2, ell)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        big_f = m1 / (n * t1**n)
    rho0 = ell.a * big_f * k0 * t0**n
    return n, big_f, rho0


def lcc_forward(
    lon: D,
    lat: D,
    *,
    ell: Ellipsoid,
    lat1: float,
    lat2: float | None,
    lat0: float,
    lon0: float,
    fe: float,
    fn: float,
    k0: float = 1.0,
) -> tuple[D, D]:
    n, big_f, rho0 = _lcc_constants(ell, lat1, lat2, lat0, k0)
    t = _iso_t(dradians(lat), ell.e)
    rho = (ell.a * big_f * k0) * dpow(t, n)
    theta = n * dradians(lift(lon) - lon0)
    x = fe + rho * dsin(theta)
    y = (fn + rho0) - rho * dcos(theta)
    return x, y


def lcc_inverse(
    x: D,
    y: D,
    *,
    ell: Ellipsoid,
    lat1: float,
    lat2: float | None,
    lat0: float,
    lon0: float,
    fe: float,
    fn: float,
    k0: float = 1.0,
) -> tuple[D, D]:
    n, big_f, rho0 = _lcc_constants(ell, lat1, lat2, lat0, k0)
    dx = lift(x) - fe
    dy = lift(rho0) - (lift(y) - fn)
    sgn = 1.0 if n >= 0.0 else -1.0
    rho_p = sgn * dsqrt(dx * dx + dy * dy)
    t_p = dpow(rho_p / (ell.a * big_f * k0), 1.0 / n)
    theta = datan2(sgn * dx, sgn * dy)
    chi = math.pi / 2.0 - 2.0 * datan(t_p)
    phi = _chi_series(chi, ell)
    lon = theta * (180.0 / math.pi) / n + lon0
    lat = phi * (180.0 / math.pi)
    return lon, lat


# ---------------------------------------------------------------------------
# Polar stereographic, variant B (EPSG method 9829): standard parallel
# lat_ts, north or south aspect.  EPSG GN7-2 §1.3.7.2 / Snyder 21-33..34.
# ---------------------------------------------------------------------------

def _ps_k0(ell: Ellipsoid, lat_ts: float) -> float:
    e = ell.e
    t_f = _iso_t_scalar(abs(lat_ts), ell)
    m_f = _iso_m(abs(lat_ts), ell)
    return m_f * math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)) / (
        2.0 * t_f
    )


def polar_stereo_forward(
    lon: D,
    lat: D,
    *,
    ell: Ellipsoid,
    lat_ts: float,
    lon0: float,
    fe: float,
    fn: float,
    south: bool,
) -> tuple[D, D]:
    e = ell.e
    k0 = _ps_k0(ell, lat_ts)
    # south aspect: work with mirrored latitude/longitude, flip outputs
    phi = dradians(-lift(lat) if south else lift(lat))
    lam = dradians(lift(lon) - lon0)
    if south:
        lam = -lam
    t = _iso_t(phi, e)
    rho = (
        2.0 * ell.a * k0 / math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    ) * t
    de = rho * dsin(lam)
    dn = rho * dcos(lam)
    if south:
        return fe - de, fn + dn
    return fe + de, fn - dn


def polar_stereo_inverse(
    x: D,
    y: D,
    *,
    ell: Ellipsoid,
    lat_ts: float,
    lon0: float,
    fe: float,
    fn: float,
    south: bool,
) -> tuple[D, D]:
    e = ell.e
    k0 = _ps_k0(ell, lat_ts)
    de = lift(x) - fe
    dn = lift(y) - fn
    if south:
        de, dn = -de, dn
    else:
        dn = -dn
    rho = dsqrt(de * de + dn * dn)
    t_p = rho * (
        math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        / (2.0 * ell.a * k0)
    )
    chi = math.pi / 2.0 - 2.0 * datan(t_p)
    phi = _chi_series(chi, ell)
    lam = datan2(de, dn)
    if south:
        return -lam * (180.0 / math.pi) + lon0, -phi * (180.0 / math.pi)
    return lam * (180.0 / math.pi) + lon0, phi * (180.0 / math.pi)


# ---------------------------------------------------------------------------
# Albers equal-area conic — EPSG method 9822 (Snyder 14-1..14-11).
# ---------------------------------------------------------------------------

def _aea_q_scalar(lat_deg: float, ell: Ellipsoid) -> float:
    e, e2 = ell.e, ell.e2
    s = math.sin(math.radians(lat_deg))
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
    )


def _aea_q(phi: D, ell: Ellipsoid) -> D:
    e, e2 = ell.e, ell.e2
    s = dsin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * dln((1.0 - e * s) / (1.0 + e * s))
    )


def _aea_constants(ell: Ellipsoid, lat1: float, lat2: float, lat0: float):
    m1 = _iso_m(lat1, ell)
    m2 = _iso_m(lat2, ell)
    q1 = _aea_q_scalar(lat1, ell)
    q2 = _aea_q_scalar(lat2, ell)
    q0 = _aea_q_scalar(lat0, ell)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    big_c = m1 * m1 + n * q1
    rho0 = ell.a * math.sqrt(big_c - n * q0) / n
    return n, big_c, rho0


def albers_forward(
    lon: D,
    lat: D,
    *,
    ell: Ellipsoid,
    lat1: float,
    lat2: float,
    lat0: float,
    lon0: float,
    fe: float,
    fn: float,
) -> tuple[D, D]:
    n, big_c, rho0 = _aea_constants(ell, lat1, lat2, lat0)
    q = _aea_q(dradians(lat), ell)
    rho = (ell.a / n) * dsqrt(lift(big_c) - n * q)
    theta = n * dradians(lift(lon) - lon0)
    x = fe + rho * dsin(theta)
    y = (fn + rho0) - rho * dcos(theta)
    return x, y


# ---------------------------------------------------------------------------
# EPSG parameter table — the high-traffic codes a reference user asks for.
# UTM WGS84/ETRS89/NAD83 zones are generated, the rest enumerated.
# ---------------------------------------------------------------------------

def _utm_params(zone: int, south: bool, ell: Ellipsoid) -> dict:
    return dict(
        ell=ell,
        lon0=zone * 6.0 - 183.0,
        lat0=0.0,
        k0=0.9996,
        fe=500000.0,
        fn=10000000.0 if south else 0.0,
    )


EPSG: dict[int, tuple[str, dict]] = {}
for _z in range(1, 61):
    EPSG[32600 + _z] = ("tmerc", _utm_params(_z, False, WGS84))  # WGS84 N
    EPSG[32700 + _z] = ("tmerc", _utm_params(_z, True, WGS84))   # WGS84 S
for _z in range(28, 39):
    EPSG[25800 + _z] = ("tmerc", _utm_params(_z, False, GRS80))  # ETRS89
for _z in range(1, 24):
    EPSG[26900 + _z] = ("tmerc", _utm_params(_z, False, GRS80))  # NAD83

EPSG.update({
    # British National Grid (OSGB36 / Airy 1830)
    27700: ("tmerc", dict(ell=AIRY1830, lon0=-2.0, lat0=49.0,
                          k0=0.9996012717, fe=400000.0, fn=-100000.0)),
    # RGF93 / Lambert-93
    2154: ("lcc2sp", dict(ell=GRS80, lat1=49.0, lat2=44.0, lat0=46.5,
                          lon0=3.0, fe=700000.0, fn=6600000.0)),
    # NAD83 / Conus Albers
    5070: ("aea", dict(ell=GRS80, lat1=29.5, lat2=45.5, lat0=23.0,
                       lon0=-96.0, fe=0.0, fn=0.0)),
    # GDA94 / Australian Albers
    3577: ("aea", dict(ell=GRS80, lat1=-18.0, lat2=-36.0, lat0=0.0,
                       lon0=132.0, fe=0.0, fn=0.0)),
    # WGS84 / Antarctic Polar Stereographic
    3031: ("polar_stereo", dict(ell=WGS84, lat_ts=-71.0, lon0=0.0,
                                fe=0.0, fn=0.0, south=True)),
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    3413: ("polar_stereo", dict(ell=WGS84, lat_ts=70.0, lon0=-45.0,
                                fe=0.0, fn=0.0, south=False)),
    # NAD27 / Louisiana South (LCC 2SP, Clarke 1866 — GN7-2's worked family)
    32099: ("lcc2sp", dict(ell=CLARKE1866, lat1=29.3, lat2=30.7,
                           lat0=28.666666666666668, lon0=-91.33333333333333,
                           fe=609601.2192024384, fn=0.0)),
})

_FWD = {
    "tmerc": tmerc_forward,
    "lcc2sp": lambda lon, lat, **p: lcc_forward(lon, lat, lat2=p.pop("lat2"), **p),
    "aea": albers_forward,
    "polar_stereo": polar_stereo_forward,
}

_INV = {
    "tmerc": tmerc_inverse,
    "lcc2sp": lambda x, y, **p: lcc_inverse(x, y, lat2=p.pop("lat2"), **p),
    "polar_stereo": polar_stereo_inverse,
}


def epsg_forward(code: int, lon: D, lat: D) -> tuple[D, D]:
    """lon/lat (EPSG:4326 order lon,lat degrees) → projected (x, y)."""
    method, params = EPSG[code]
    if method == "lcc2sp":
        return lcc_forward(lon, lat, **params)
    return _FWD[method](lon, lat, **params)


def epsg_inverse(code: int, x: D, y: D) -> tuple[D, D]:
    method, params = EPSG[code]
    if method == "aea":
        raise NotImplementedError("Albers inverse not implemented")
    if method == "lcc2sp":
        return lcc_inverse(x, y, **params)
    return _INV[method](x, y, **params)


# ---------------------------------------------------------------------------
# Pseudocylindrical equal-area world projections: Equal Earth (Šavrič,
# Patterson & Jenny 2019 — the published polynomial, PROJ method
# +proj=eqearth) and Mollweide (Snyder 1987 §31, PROJ +proj=moll).  Both
# spherical forms (the published definitions are spherical; PROJ applies
# them on the authalic sphere — callers pass the radius).  Newton
# iterations are FIXED-COUNT so the dual-emitted trajectory is identical
# on both engines.
# ---------------------------------------------------------------------------

_EE_A1 = 1.340264
_EE_A2 = -0.081106
_EE_A3 = 0.000893
_EE_A4 = 0.003796
_EE_M = math.sqrt(3.0) / 2.0


def _ee_y(theta: D) -> D:
    t2 = theta * theta
    t6 = t2 * t2 * t2
    return theta * (_EE_A1 + _EE_A2 * t2 + _EE_A3 * t6
                    + _EE_A4 * t6 * t2)


def _ee_dy(theta: D) -> D:
    t2 = theta * theta
    t6 = t2 * t2 * t2
    return _EE_A1 + 3.0 * _EE_A2 * t2 + 7.0 * _EE_A3 * t6 \
        + 9.0 * _EE_A4 * t6 * t2


def equal_earth_forward(
    lon: D, lat: D, *, radius: float = 6378137.0, lon0: float = 0.0,
) -> tuple[D, D]:
    """Equal Earth forward (Šavrič et al. 2019 eq. 1-3):
    sinθ = (√3/2)·sinφ, x = 2√3·R·λ·cosθ / (3·dy/dθ), y = R·y(θ)."""
    lam = dradians(lon - lon0)
    phi = dradians(lat)
    theta = dasin(_EE_M * dsin(phi))
    x = (2.0 * math.sqrt(3.0) / 3.0) * radius * lam * dcos(theta) \
        / _ee_dy(theta)
    y = radius * _ee_y(theta)
    return x, y


def equal_earth_newton_step(theta: str = "_th",
                            yn: str = "_yn") -> D:
    """ONE Newton update θ' = θ − (y(θ) − yn)/dy(θ) over *named columns*
    (the caller materializes each iteration — withColumn on Spark,
    a `SELECT * REPLACE` CTE in SQL — so the emitted text stays linear
    in the iteration count instead of exponentially inlining θ)."""
    th = col(theta)
    return th - (_ee_y(th) - col(yn)) / _ee_dy(th)


def equal_earth_inverse_closed(
    x: D, theta: str = "_th", *, radius: float = 6378137.0,
    lon0: float = 0.0,
) -> tuple[D, D]:
    """φ, λ (degrees) from the converged θ column (Šavrič et al. eq. 9-10):
    φ = asin(sinθ / (√3/2)), λ = 3·x·dy/dθ / (2√3·R·cosθ)."""
    th = col(theta)
    phi = dasin(dsin(th) / _EE_M)
    lam = x * _ee_dy(th) * (3.0 / (2.0 * math.sqrt(3.0))) \
        / (radius * dcos(th))
    rad2deg = 180.0 / math.pi
    return lam * rad2deg + lon0, phi * rad2deg


def mollweide_target(lat: D) -> D:
    """The Newton target π·sinφ (Snyder eq. 31-2's right side)."""
    return math.pi * dsin(dradians(lat))


def mollweide_newton_step(theta: str = "_th",
                          target: str = "_tgt") -> D:
    """ONE update θ' = θ − (2θ + sin2θ − πsinφ)/(2 + 2cos2θ) over named
    columns (Snyder eq. 31-3; same linear-materialization contract as
    equal_earth_newton_step).  At the poles the denominator vanishes
    exactly (θ = ±π/2 already solves the equation — Snyder's special
    case); the guard holds θ fixed there, identically on both engines."""
    th = col(theta)
    den = 2.0 + 2.0 * dcos(2.0 * th)
    upd = th - (2.0 * th + dsin(2.0 * th) - col(target)) / den
    return dcase(dabs(den) < 1e-14, th, upd)


def mollweide_xy(
    lon: D, theta: str = "_th", *, radius: float = 6378137.0,
    lon0: float = 0.0,
) -> tuple[D, D]:
    """x, y from the converged θ column (Snyder eq. 31-1/31-4):
    x = (2√2/π)·R·λ·cosθ, y = √2·R·sinθ."""
    th = col(theta)
    lam = dradians(lon - lon0)
    x = (2.0 * math.sqrt(2.0) / math.pi) * radius * lam * dcos(th)
    y = math.sqrt(2.0) * radius * dsin(th)
    return x, y


def mollweide_inverse(
    x: D, y: D, *, radius: float = 6378137.0, lon0: float = 0.0,
) -> tuple[D, D]:
    """Mollweide inverse (Snyder eq. 31-6..31-8) — closed form, no
    iteration: θ = asin(y/(√2 R)), φ = asin((2θ + sin 2θ)/π),
    λ = π·x / (2√2·R·cosθ)."""
    theta = dasin(y / (math.sqrt(2.0) * radius))
    phi = dasin((2.0 * theta + dsin(2.0 * theta)) / math.pi)
    lam = math.pi * x / (2.0 * math.sqrt(2.0) * radius * dcos(theta))
    rad2deg = 180.0 / math.pi
    return lam * rad2deg + lon0, phi * rad2deg
