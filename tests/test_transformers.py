"""RPC and TPS transformer semantics (alg/gdal_rpc.cpp, alg/gdal_tps.cpp)."""

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.spatial.rpc import rpc_fixture, rpc_pixel_line_cols
from gdal_spark.spatial.tps import fit_tps, tps_apply_cols, tps_fixture


def _tps_eval(fit, x, y):
    out = []
    for coefs in fit.coef:
        v = coefs[0] + coefs[1] * x + coefs[2] * y
        for w, cx, cy in zip(coefs[3:], fit.xs, fit.ys):
            d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
            v += w * (d2 * math.log(d2) if d2 > 0 else 0.0)
        out.append(v)
    return out


def test_tps_interpolates_control_points_exactly():
    pts, tgt = tps_fixture()
    fit = fit_tps(pts, tgt)
    for (x, y), (tx, ty) in zip(pts, tgt):
        gx, gy = _tps_eval(fit, x, y)
        assert math.isclose(gx, tx, abs_tol=1e-8)
        assert math.isclose(gy, ty, abs_tol=1e-8)


def test_tps_affine_targets_have_no_radial_weight():
    # pure affine targets -> all radial weights ~0, affine part recovers it
    pts, _ = tps_fixture()
    tgt = [(2.0 + 0.5 * x - 0.25 * y,) for x, y in pts]
    fit = fit_tps(pts, tgt)
    (coefs,) = fit.coef
    assert all(abs(w) < 1e-9 for w in coefs[3:])
    assert math.isclose(coefs[0], 2.0, abs_tol=1e-9)
    assert math.isclose(coefs[1], 0.5, abs_tol=1e-9)
    assert math.isclose(coefs[2], -0.25, abs_tol=1e-9)


def test_tps_duplicate_control_points_raise():
    pts = [(0.0, 0.0), (0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]
    tgt = [(0.0,), (1.0,), (2.0,), (3.0,)]
    with pytest.raises(ValueError):
        fit_tps(pts, tgt)


def test_rpc_center_maps_to_offsets(spark):
    """At the normalization center (P=L=H=0) only term 0 survives, so
    pixel = num0/den0 * scale + off — hand-checkable."""
    m = rpc_fixture()
    df = spark.createDataFrame(
        [(m.long_off, m.lat_off, m.height_off)], "lon double, lat double, h double"
    )
    px, ln = rpc_pixel_line_cols(m, F.col("lon"), F.col("lat"), F.col("h"))
    r = df.select(px.alias("px"), ln.alias("ln")).collect()[0]
    exp_px = m.samp_num[0] / m.samp_den[0] * m.samp_scale + m.samp_off
    exp_ln = m.line_num[0] / m.line_den[0] * m.line_scale + m.line_off
    assert math.isclose(r["px"], exp_px, rel_tol=1e-12)
    assert math.isclose(r["ln"], exp_ln, rel_tol=1e-12)


def test_rpc_monotone_along_axes(spark):
    """The fixture model is near-affine: pixel increases with lon,
    line decreases with lat (the -L leading term)."""
    m = rpc_fixture()
    rows = [(m.long_off + d, m.lat_off, m.height_off) for d in (-1.0, 0.0, 1.0)]
    df = spark.createDataFrame(rows, "lon double, lat double, h double")
    px, _ = rpc_pixel_line_cols(m, F.col("lon"), F.col("lat"), F.col("h"))
    vals = [r["px"] for r in df.select(px.alias("px")).orderBy("lon").collect()]
    assert vals[0] < vals[1] < vals[2]
    rows = [(m.long_off, m.lat_off + d, m.height_off) for d in (-1.0, 0.0, 1.0)]
    df = spark.createDataFrame(rows, "lon double, lat double, h double")
    _, ln = rpc_pixel_line_cols(m, F.col("lon"), F.col("lat"), F.col("h"))
    vals = [r["ln"] for r in df.select(ln.alias("ln"), "lat").orderBy("lat").collect()]
    assert vals[0] > vals[1] > vals[2]


# ---------------------------------------------------------------------------
# RPC inverse (gdal_rpc.cpp RPCInverseTransformPoint, no-DEM path)
# ---------------------------------------------------------------------------

def test_rpc_inverse_recovers_forward_inputs():
    """inverse(forward(lon, lat, h=0)) ≈ (lon, lat) well inside the
    reference's 0.1 px convergence contract."""
    from gdal_spark.spatial import rpc as RPC

    m = RPC.rpc_fixture()
    inv = RPC.rpc_inverse_geotransform(m)
    for lon, lat in [(10.0, 45.0), (8.5, 43.7), (11.9, 46.4)]:
        px, ln = RPC.rpc_pixel_line_py(m, lon, lat, 0.0)
        x = inv[0] + inv[1] * px + inv[2] * ln
        y = inv[3] + inv[4] * px + inv[5] * ln
        for _ in range(4):
            bx, by = RPC.rpc_pixel_line_py(m, x, y, 0.0)
            x -= (bx - px) * inv[1] + (by - ln) * inv[2]
            y -= (bx - px) * inv[4] + (by - ln) * inv[5]
        assert abs(x - lon) < 1e-7 and abs(y - lat) < 1e-7
        bx, by = RPC.rpc_pixel_line_py(m, x, y, 0.0)
        assert max(abs(bx - px), abs(by - ln)) < 1e-4


def test_rpc_inverse_spark_matches_python(spark):
    from pyspark.sql import functions as F

    from gdal_spark.spatial import rpc as RPC

    m = RPC.rpc_fixture()
    df = spark.createDataFrame(
        [(1, 100.0, 200.0), (2, 4096.0, 4096.0), (3, 8000.0, 300.0)],
        "k long, pixel double, line double",
    )
    out = {r["k"]: (r["lon"], r["lat"])
           for r in RPC.rpc_inverse_df(df, m, "pixel", "line").collect()}
    inv = RPC.rpc_inverse_geotransform(m)
    for k, px, ln in [(1, 100.0, 200.0), (2, 4096.0, 4096.0),
                      (3, 8000.0, 300.0)]:
        x = inv[0] + inv[1] * px + inv[2] * ln
        y = inv[3] + inv[4] * px + inv[5] * ln
        for _ in range(4):
            bx, by = RPC.rpc_pixel_line_py(m, x, y, 0.0)
            dx, dy = bx - px, by - ln
            # same association as the Column/SQL mirrors: x - a - b
            x, y = x - dx * inv[1] - dy * inv[2], \
                y - dx * inv[4] - dy * inv[5]
        assert out[k] == (x, y)  # bit-identical: same fixed arithmetic
