"""`gdal vector pipeline` step facade."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import pipeline as P
from gdal_spark.data.pages import pages_df, polygons_df
from gdal_spark.spatial import geometry as G


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, 500)


def test_filter_select_limit(spark, pages):
    out = P.limit_rows(
        P.select_fields(P.filter_expr(pages, "lang = 'en'"), "i", "url"), 10
    )
    rows = out.collect()
    assert len(rows) == 10
    assert set(rows[0].asDict().keys()) == {"i", "url"}


def test_execute_sql(spark, pages):
    out = P.execute_sql(
        spark, "SELECT lang, count(*) AS n FROM pages GROUP BY lang",
        pages=pages,
    )
    assert out.count() == 10


def test_sort_spatial_clusters(spark, pages):
    out = P.sort_spatial(pages.select("i", "lon", "lat"), zoom=8)
    assert out.count() == 500


def test_reproject_roundtrip(spark, pages):
    m = P.reproject_3857(pages.select("i", "lon", "lat"))
    back = P.reproject_4326(m.drop("lon", "lat"))
    joined = back.join(
        pages.select("i", F.col("lon").alias("lon0"), F.col("lat").alias("lat0")),
        "i",
    )
    bad = joined.filter(
        (F.abs(F.col("lon") - F.col("lon0")) > 1e-9)
        | (F.abs(F.col("lat") - F.col("lat0")) > 1e-9)
    ).count()
    assert bad == 0


def test_swap_xy(spark, pages):
    out = P.swap_xy(pages.select("i", "lon", "lat"))
    r = out.filter(F.col("i") == 1).first()
    orig = pages.filter(F.col("i") == 1).first()
    assert r["lon"] == orig["lat"] and r["lat"] == orig["lon"]


def test_make_point_wkb(spark, pages):
    out = P.make_point(pages.select("i", "lon", "lat").limit(5))
    for r in out.collect():
        kind, (x, y) = G.parse_wkb(bytes(r["wkb"]))
        assert kind == "point"
        assert x == r["lon"] and y == r["lat"]


def test_explode_collections(spark):
    multi = G.wkb_multipolygon([
        [np.array([[0, 0], [1, 0], [1, 1], [0, 0]], dtype=float)],
        [np.array([[5, 5], [6, 5], [6, 6], [5, 5]], dtype=float)],
    ])
    df = spark.createDataFrame([(1, bytearray(multi))], "fid long, wkb binary")
    out = P.explode_collections(df).collect()
    assert len(out) == 2
    assert {r["poly_idx"] for r in out} == {0, 1}
    for r in out:
        kind, rings = G.parse_wkb(bytes(r["wkb"]))
        assert kind == "polygon"


def test_segmentize_and_simplify(spark, polys=None):
    df = spark.createDataFrame(
        [(0, [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 0.0]]])],
        "poly_id long, rings array<array<array<double>>>",
    )
    seg = P.segmentize(df, max_len=1.0).collect()[0]["rings"][0]
    assert len(seg) > 20  # vertices inserted
    # max segment length respected
    arr = np.asarray(seg)
    seglens = np.hypot(*(arr[1:] - arr[:-1]).T)
    assert seglens.max() <= 1.0 + 1e-9
    # simplify undoes the densification (collinear points dropped)
    dense_df = spark.createDataFrame(
        [(0, [[list(map(float, p)) for p in seg]])],
        "poly_id long, rings array<array<array<double>>>",
    )
    simp = P.simplify(dense_df, tolerance=1e-9).collect()[0]["rings"][0]
    assert len(simp) == 4


def test_concat_layers(spark, pages):
    a = pages.select("i", "url").limit(5)
    b = pages.select("i", "lang").limit(5)
    out = P.concat_layers(a, b)
    assert out.count() == 10
    assert set(out.columns) == {"i", "url", "lang"}


def test_write_partitioned_prunes(spark, pages, tmp_path):
    path = str(tmp_path / "part")
    P.write_partitioned(pages.select("i", "lang", "url"), path, "lang")
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    assert back.count() == 50
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.rdd.getNumPartitions() <= 4