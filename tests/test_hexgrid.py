"""Micro-quantized hierarchical hex grid (spatial/hexgrid.py) — the
cross-engine-exact H3-style cell index."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.spatial import hexgrid as HX


def _duck_cells(lons, lats, size):
    q, r = HX.sql_hex_cells("lon", "lat", size)
    con = duckdb.connect()
    con.execute("CREATE TABLE p (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)",
                    [(float(a), float(b)) for a, b in zip(lons, lats)])
    return con.execute(f"SELECT {q}, {r} FROM p").fetchall()


def test_spark_duckdb_cells_identical(spark):
    """The same expression evaluated by Catalyst and DuckDB must agree on
    every cell — including near-tie points engineered close to hex edges
    and corners."""
    rng = np.random.RandomState(7)
    lons = np.concatenate([
        rng.uniform(-180, 180, 400),
        np.linspace(-0.51, 0.52, 97),          # edge-dense sweep
        np.array([0.0, 0.25, -0.25, 0.125]),
    ])
    lats = np.concatenate([
        rng.uniform(-83, 83, 400),
        np.linspace(41.9, 42.4, 97),
        np.array([0.0, 0.375, -0.375, 0.1875]),
    ])
    size = HX.res_size(2.0, 3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lons, lats)],
        "lon double, lat double")
    q, r = HX.hex_cells_quantized(F.col("lon"), F.col("lat"), size)
    got = [(x["hq"], x["hr"]) for x in
           df.select(q.alias("hq"), r.alias("hr")).collect()]
    want = [(int(a), int(b)) for a, b in _duck_cells(lons, lats, size)]
    assert got == want


def test_cube_constraint_holds(spark):
    """Corrected axial cells must satisfy the cube identity q + r + y = 0
    with y recovered from the rounded triple — i.e. the correction chain
    always lands on a valid hex cell (centers form the axial lattice)."""
    rng = np.random.RandomState(11)
    lons, lats = rng.uniform(-179, 179, 500), rng.uniform(-82, 82, 500)
    size = 0.25
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lons, lats)],
        "lon double, lat double")
    q, r = HX.hex_cells_quantized(F.col("lon"), F.col("lat"), size)
    rows = df.select(q.alias("hq"), r.alias("hr"), "lon", "lat").collect()
    s3 = 0.5773502691896258
    for x in rows:
        # the point's fractional cube coords are within one cell of the
        # chosen center (cube rounding picks the nearest valid center)
        qf = (x["lon"] * s3 - x["lat"] / 3.0) / size
        rf = (x["lat"] * (2.0 / 3.0)) / size
        assert abs(qf - x["hq"]) < 1.0 and abs(rf - x["hr"]) < 1.0


def test_cell_id_unique_across_resolutions(spark):
    df = spark.range(1000).select(
        (F.col("id").cast("double") / 3.0 - 170.0).alias("lon"),
        (F.col("id").cast("double") / 7.0 - 70.0).alias("lat"),
    )
    ids = set()
    for res in (0, 1, 2, 3):
        q, r = HX.hex_cells_quantized(
            F.col("lon"), F.col("lat"), HX.res_size(2.0, res))
        got = {x[0] for x in
               df.select(HX.hex_cell_id(q, r, res)).collect()}
        assert not (ids & got), "cell ids collide across resolutions"
        ids |= got


def test_res_size_ladder():
    assert HX.res_size(2.0, 0) == 2.0
    assert HX.res_size(2.0, 3) == 0.25
    assert HX.res_size(2.0, 10) == 2.0 / 1024
