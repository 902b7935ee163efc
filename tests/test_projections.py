"""Parameterized CRS families (spatial/projections.py): self-consistency
(forward↔inverse closure, unit scale at standard parallels, natural-origin
→ false-origin fixed points), cross-validation against the proven WGS84 UTM
pair in spatial/crs.py, and dual-emitter parity (the Column and SQL sides
of a D produce the same numbers)."""

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.spatial import crs as CRS
from gdal_spark.spatial import projections as P


def _eval_sql(expr: str, **cols) -> float:
    """Evaluate a D's SQL fragment in DuckDB with named scalar inputs."""
    con = duckdb.connect()
    names = ", ".join(cols)
    vals = ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in cols.values())
    row = con.execute(
        f"SELECT {expr} FROM (SELECT {vals}) AS t({names})"
    ).fetchone()
    return float(row[0])


def _fwd_scalar(code: int, lon: float, lat: float) -> tuple[float, float]:
    x, y = P.epsg_forward(code, P.col("lon"), P.col("lat"))
    return (
        _eval_sql(x.s, lon=lon, lat=lat),
        _eval_sql(y.s, lon=lon, lat=lat),
    )


def _inv_scalar(code: int, x: float, y: float) -> tuple[float, float]:
    lon, lat = P.epsg_inverse(code, P.col("x"), P.col("y"))
    return (
        _eval_sql(lon.s, x=x, y=y),
        _eval_sql(lat.s, x=x, y=y),
    )


# --- fixed points -----------------------------------------------------------

def test_tmerc_natural_origin_maps_to_false_origin():
    # BNG true origin 49N 2W -> (FE, FN) exactly
    e, n = _fwd_scalar(27700, -2.0, 49.0)
    assert abs(e - 400000.0) < 1e-6
    assert abs(n - (-100000.0)) < 1e-6


def test_lcc_natural_origin_maps_to_false_origin():
    e, n = _fwd_scalar(2154, 3.0, 46.5)
    assert abs(e - 700000.0) < 1e-6
    assert abs(n - 6600000.0) < 1e-6


def test_polar_stereo_pole_maps_to_false_origin():
    e, n = _fwd_scalar(3031, 0.0, -90.0)
    assert abs(e - 0.0) < 1e-6
    assert abs(n - 0.0) < 1e-6
    e, n = _fwd_scalar(3413, -45.0, 90.0)
    assert abs(e - 0.0) < 1e-6
    assert abs(n - 0.0) < 1e-6


def test_albers_natural_origin_maps_to_false_origin():
    e, n = _fwd_scalar(5070, -96.0, 23.0)
    assert abs(e) < 1e-6
    assert abs(n) < 1e-6


# --- cross-validation: generic tmerc == proven WGS84 UTM pair ---------------

def test_tmerc_matches_crs_utm_forward():
    rng = np.random.default_rng(7)
    lons = rng.uniform(0.5, 5.5, 64)   # zone 31
    lats = rng.uniform(-70.0, 70.0, 64)
    _, e_ref, n_ref = CRS.py_utm_forward(lons, lats)
    for lon, lat, er, nr in zip(lons, lats, e_ref, n_ref):
        code = 32631 if lat >= 0 else 32731
        e, n = _fwd_scalar(code, float(lon), float(lat))
        assert abs(e - er) < 1e-6, (lon, lat)
        assert abs(n - nr) < 1e-6, (lon, lat)


# --- forward/inverse closure -------------------------------------------------

@pytest.mark.parametrize("code,lon_rng,lat_rng", [
    (27700, (-7.0, 2.0), (49.5, 60.5)),
    (32631, (0.5, 5.5), (-80.0, 84.0)),
    (25832, (6.5, 11.5), (35.0, 70.0)),
    (2154, (-5.0, 9.5), (41.0, 51.5)),
    (3031, (-179.0, 179.0), (-89.0, -60.0)),
    (3413, (-179.0, 179.0), (60.0, 89.0)),
    (32099, (-93.5, -89.0), (28.5, 31.0)),
])
def test_roundtrip(code, lon_rng, lat_rng):
    rng = np.random.default_rng(code)
    lons = rng.uniform(*lon_rng, 32)
    lats = rng.uniform(*lat_rng, 32)
    # closure tolerance 5e-7 deg (~5 cm): the Krüger delta / chi series are
    # truncated at n^3 / e^8 — same documented bound as spatial/crs.py's
    # WGS84 UTM pair (measured max 2.0e-7 across these ranges).
    for lon, lat in zip(lons, lats):
        x, y = _fwd_scalar(code, float(lon), float(lat))
        lon2, lat2 = _inv_scalar(code, x, y)
        dlon = abs((lon2 - lon + 180.0) % 360.0 - 180.0)  # wrap at ±180
        assert dlon * math.cos(math.radians(lat)) < 5e-7, (code, lon, lat)
        assert abs(lat2 - lat) < 5e-7, (code, lon, lat)


# --- defining properties ------------------------------------------------------

def _local_scale(code: int, lon: float, lat: float) -> float:
    """Numerical local N-S scale factor h = |dP/dphi| / (M dphi)."""
    method, params = P.EPSG[code]
    ell = params["ell"]
    d = 1e-6
    x1, y1 = _fwd_scalar(code, lon, lat - d)
    x2, y2 = _fwd_scalar(code, lon, lat + d)
    dist = math.hypot(x2 - x1, y2 - y1)
    phi = math.radians(lat)
    m_rad = (
        ell.a * (1.0 - ell.e2)
        / (1.0 - ell.e2 * math.sin(phi) ** 2) ** 1.5
    )
    return dist / (m_rad * math.radians(2 * d))


def test_lcc_unit_scale_at_standard_parallels():
    for lat in (49.0, 44.0):
        k = _local_scale(2154, 1.0, lat)
        assert abs(k - 1.0) < 1e-7, (lat, k)


def test_polar_stereo_unit_scale_at_lat_ts():
    k = _local_scale(3031, 45.0, -71.0)
    assert abs(k - 1.0) < 1e-7
    k = _local_scale(3413, 10.0, 70.0)
    assert abs(k - 1.0) < 1e-7


def test_albers_equal_area_property():
    # area of a small quad on the ellipsoid is preserved (authalic check):
    # compare projected quad area against the ellipsoidal patch area.
    code = 5070
    lon, lat, d = -100.0, 40.0, 0.01
    corners = [
        _fwd_scalar(code, lon + sx * d, lat + sy * d)
        for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1))
    ]
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    area_proj = 0.5 * abs(
        sum(
            xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
            for i in range(4)
        )
    )
    ell = P.GRS80
    phi = math.radians(lat)
    m_rad = ell.a * (1.0 - ell.e2) / (1.0 - ell.e2 * math.sin(phi) ** 2) ** 1.5
    n_rad = ell.a / math.sqrt(1.0 - ell.e2 * math.sin(phi) ** 2)
    area_true = (
        m_rad * math.radians(2 * d) * n_rad * math.cos(phi) * math.radians(2 * d)
    )
    assert abs(area_proj / area_true - 1.0) < 1e-5


# --- dual-emitter parity: Column side == SQL side ----------------------------

def test_dual_emitter_parity(spark):
    codes = [27700, 2154, 3031, 5070, 32633]
    rows = [
        (i, float(lon), float(lat))
        for i, (lon, lat) in enumerate(
            [(-1.5, 52.0), (2.35, 48.85), (100.0, -75.0), (-96.0, 38.0),
             (15.0, 47.0)]
        )
    ]
    df = spark.createDataFrame(rows, "id int, lon double, lat double")
    for code in codes:
        x, y = P.epsg_forward(code, P.col("lon"), P.col("lat"))
        got = {
            r["id"]: (r["x"], r["y"])
            for r in df.select("id", x.c.alias("x"), y.c.alias("y")).collect()
        }
        for i, lon, lat in rows:
            xs = _eval_sql(x.s, lon=lon, lat=lat)
            ys = _eval_sql(y.s, lon=lon, lat=lat)
            gx, gy = got[i]
            assert abs(gx - xs) < 1e-6, (code, i)
            assert abs(gy - ys) < 1e-6, (code, i)


def test_epsg_table_sanity():
    # all registered codes project their rough center without NaN
    probe = {
        "tmerc": lambda p: (p["lon0"], 45.0 if p["fn"] == 0.0 else -45.0),
        "lcc2sp": lambda p: (p["lon0"], p["lat0"]),
        "aea": lambda p: (p["lon0"], (p["lat1"] + p["lat2"]) / 2.0),
        "polar_stereo": lambda p: (p["lon0"], -80.0 if p["south"] else 80.0),
    }
    for code, (method, params) in P.EPSG.items():
        lon, lat = probe[method](params)
        x, y = _fwd_scalar(code, lon, lat)
        assert math.isfinite(x) and math.isfinite(y), code


class TestPseudocylindrical:
    """Equal Earth (Šavrič et al. 2019) + Mollweide (Snyder §31)."""

    R_E = 6378137.0

    def _d(self, v):
        from gdal_spark.spatial import projections as P

        return P.lift(float(v))

    def _ee_xy(self, lon, lat):
        import duckdb

        from gdal_spark.spatial import projections as P

        x, y = P.equal_earth_forward(self._d(lon), self._d(lat))
        return duckdb.sql(f"SELECT {x.s} AS x, {y.s} AS y").fetchone()

    def test_equal_earth_axis_values(self):
        # equator/meridian anchors
        x, y = self._ee_xy(0.0, 0.0)
        assert abs(x) < 1e-9 and abs(y) < 1e-9
        # published A1 slope at origin: dy/dθ(0) = A1, dθ/dφ(0) = √3/2
        x, y = self._ee_xy(0.0, 1e-4)
        import math

        expect = self.R_E * 1.340264 * math.radians(1e-4) * math.sqrt(3) / 2
        assert abs(y - expect) / expect < 1e-6
        # x scales linearly with lon at the equator: 2√3/(3·A1)·R·λ
        x, y = self._ee_xy(90.0, 0.0)
        expect = 2 * math.sqrt(3) / 3 / 1.340264 * self.R_E * math.pi / 2
        assert abs(x - expect) / expect < 1e-12

    def test_equal_earth_is_equal_area(self):
        # numeric Jacobian at several latitudes must equal R² cosφ
        import math

        for lat in (0.0, 23.5, 45.0, 66.5, 80.0):
            h = 1e-5
            x0, y0 = self._ee_xy(10.0, lat)
            xl, _ = self._ee_xy(10.0 + h, lat)
            _, yp = self._ee_xy(10.0, lat + h)
            dxdlam = (xl - x0) / math.radians(h)
            dydphi = (yp - y0) / math.radians(h)
            area_scale = dxdlam * dydphi
            want = self.R_E ** 2 * math.cos(math.radians(lat))
            assert abs(area_scale - want) / want < 1e-3, lat

    def test_mollweide_anchors_and_area(self):
        import math

        import duckdb

        from gdal_spark.spatial import projections as P

        # converged θ via the step emitter (driver-side replay in DuckDB)
        def mw(lon, lat):
            tgt = P.mollweide_target(self._d(lat))
            q = (f"SELECT {tgt.s} AS _tgt, radians({lat!r}) AS _th, "
                 f"{lon!r} AS lon")
            step = P.mollweide_newton_step()
            for _ in range(12):
                q = f"SELECT * REPLACE ({step.s} AS _th) FROM ({q})"
            x, y = P.mollweide_xy(P.col("lon"))
            return duckdb.sql(
                f"SELECT {x.s} AS x, {y.s} AS y FROM ({q})").fetchone()

        # pole: y = √2·R, x = 0
        x, y = mw(0.0, 90.0)
        assert abs(y - math.sqrt(2) * self.R_E) < 1e-3
        assert abs(x) < 1e-6
        # equator edge: x = (2√2/π)·R·π = 2√2·R at lon=180
        x, y = mw(180.0, 0.0)
        assert abs(x - 2 * math.sqrt(2) * self.R_E) < 1e-3
        assert abs(y) < 1e-6
        # total map area πab = π·(2√2R/π·π)·(√2R)... ellipse semi-axes
        # a=2√2R/π·π/2... check equal-area numerically instead
        for lat in (0.0, 40.0, 75.0):
            h = 1e-5
            x0, y0 = mw(10.0, lat)
            xl, _ = mw(10.0 + h, lat)
            _, yp = mw(10.0, lat + h)
            scale = ((xl - x0) / math.radians(h)) * \
                ((yp - y0) / math.radians(h))
            want = self.R_E ** 2 * math.cos(math.radians(lat))
            assert abs(scale - want) / want < 1e-3, lat
