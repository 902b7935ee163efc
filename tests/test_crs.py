"""UTM projection: Krüger-series implementation cross-checked against an
INDEPENDENT classic formulation (Snyder, USGS Professional Paper 1395 —
series in e², completely different coefficients), round-trip closure, and
Spark-column vs numpy-mirror agreement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.spatial import crs


def _snyder_utm(lon, lat):
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    zone = int(np.floor((lon + 180) / 6) + 1)
    lon0 = np.radians(zone * 6 - 183)
    lam, phi = np.radians(lon), np.radians(lat)
    n = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    t = np.tan(phi) ** 2
    c = ep2 * np.cos(phi) ** 2
    aa = (lam - lon0) * np.cos(phi)
    m = a * (
        (1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024) * np.sin(2 * phi)
        + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * np.sin(4 * phi)
        - (35 * e2 ** 3 / 3072) * np.sin(6 * phi)
    )
    east = k0 * n * (
        aa + (1 - t + c) * aa ** 3 / 6
        + (5 - 18 * t + t ** 2 + 72 * c - 58 * ep2) * aa ** 5 / 120
    ) + 500000
    north = k0 * (
        m + n * np.tan(phi) * (
            aa ** 2 / 2 + (5 - t + 9 * c + 4 * c ** 2) * aa ** 4 / 24
            + (61 - 58 * t + t ** 2 + 600 * c - 330 * ep2) * aa ** 6 / 720
        )
    )
    if lat < 0:
        north += 10000000
    return zone, east, north


CASES = [
    (-0.0014, 51.4778), (2.2945, 48.8584), (151.2153, -33.8568),
    (-74.0445, 40.6892), (10.0, 0.0001), (177.0, -80.0), (3.0, 85.0),
]


def test_kruger_matches_snyder_submm():
    z, e, n = crs.py_utm_forward(
        [c[0] for c in CASES], [c[1] for c in CASES]
    )
    for (lon, lat), zz, ee, nn in zip(CASES, z, e, n):
        sz, se, sn = _snyder_utm(lon, lat)
        assert zz == sz
        assert ee == pytest.approx(se, abs=1e-3)   # sub-mm agreement
        assert nn == pytest.approx(sn, abs=1e-3)


def test_roundtrip_closure():
    lons = [c[0] for c in CASES]
    lats = [c[1] for c in CASES]
    z, e, n = crs.py_utm_forward(lons, lats)
    lon2, lat2 = crs.py_utm_inverse(e, n, z, south=np.array(lats) < 0)
    assert np.abs(lon2 - lons).max() < 1e-6
    assert np.abs(lat2 - lats).max() < 1e-6


def test_spark_column_matches_numpy(spark):
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(CASES)],
        "i long, lon double, lat double",
    )
    zone = crs.utm_zone(F.col("lon"))
    e, n = crs.utm_forward(F.col("lon"), F.col("lat"), zone)
    got = {
        r["i"]: (r["z"], r["e"], r["n"])
        for r in df.select(
            "i", zone.alias("z"), e.alias("e"), n.alias("n")
        ).collect()
    }
    z_np, e_np, n_np = crs.py_utm_forward(
        [c[0] for c in CASES], [c[1] for c in CASES]
    )
    for i in range(len(CASES)):
        assert got[i][0] == z_np[i]
        assert got[i][1] == pytest.approx(e_np[i], abs=1e-6)
        assert got[i][2] == pytest.approx(n_np[i], abs=1e-6)


# --- RPC DEM-height path (round 5) -------------------------------------------

def test_rpc_dem_inverse_converges_onto_terrain(spark):
    """The DEM-intersected inverse lands on the terrain surface: shooting
    the recovered (lon, lat, DEM(lon,lat)) forward reproduces the target
    pixel/line, and the result genuinely differs from the flat-plane
    inverse (the DEM term carries weight)."""
    from gdal_spark.spatial.rpc import (
        dem_h_expr, rpc_dem_inverse_df, rpc_fixture, rpc_inverse_df,
        rpc_pixel_line_py,
    )

    model = rpc_fixture()
    base = spark.range(1, 40).select(
        F.col("id").alias("i"),
        (F.col("id") * 211 % 8192).cast("double").alias("pixel"),
        ((F.col("id") * 13) % 8192).cast("double").alias("line"),
    )
    dem = {r["i"]: (r["lon"], r["lat"]) for r in
           rpc_dem_inverse_df(base, model, "pixel", "line", n_iter=5)
           .collect()}
    flat = {r["i"]: (r["lon"], r["lat"]) for r in
            rpc_inverse_df(base, model, "pixel", "line", n_iter=5)
            .collect()}
    targets = {r["i"]: (r["pixel"], r["line"]) for r in base.collect()}

    def h(lon, lat):
        return (300.0 + 50.0 * (lon - 10.0) + 37.5 * (lat - 45.0)
                + 12.5 * (lon - 10.0) * (lat - 45.0))

    max_resid, max_sep = 0.0, 0.0
    for i, (lon, lat) in dem.items():
        px, ln = rpc_pixel_line_py(model, lon, lat, h(lon, lat))
        tp, tl = targets[i]
        max_resid = max(max_resid, abs(px - tp), abs(ln - tl))
        flon, flat_ = flat[i]
        max_sep = max(max_sep, abs(lon - flon), abs(lat - flat_))
    assert max_resid < 1e-3          # on-terrain fixed point (px units)
    assert max_sep > 1e-4            # differs from the flat-plane inverse
