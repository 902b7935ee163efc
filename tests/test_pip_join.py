"""End-to-end spatial join tests: broadcast path vs cell-join path vs a
pure-Python oracle over the deterministic pages + polygons fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.data import pages as P
from gdal_spark.data.geotag import py_lonlat
from gdal_spark.operators import pip_join as PJ
from gdal_spark.spatial import geometry as G

N_PAGES = 2000


@pytest.fixture(scope="module")
def fixtures(spark):
    pts = P.pages_df(spark, N_PAGES).select("i", "url", "lon", "lat").cache()
    polys = P.polygons_df(spark)
    return pts, polys


def oracle_pairs(n):
    recs = P.polygon_records()
    parsed = [
        (r["poly_id"], [np.asarray(ring) for ring in r["rings"]]) for r in recs
    ]
    pairs = set()
    for i in range(n):
        lon, lat = py_lonlat(i)
        for pid, rings in parsed:
            xmin, ymin, xmax, ymax = G.rings_envelope(rings)
            if xmin <= lon <= xmax and ymin <= lat <= ymax:
                if G.points_in_polygon(np.array([lon]), np.array([lat]), rings)[0]:
                    pairs.add((i, pid))
    return pairs


@pytest.fixture(scope="module")
def expected():
    return oracle_pairs(N_PAGES)


def test_broadcast_pip_join_matches_oracle(fixtures, expected):
    pts, polys = fixtures
    got = {
        (r["i"], r["poly_id"])
        for r in PJ.pip_join(pts, polys).select("i", "poly_id").collect()
    }
    assert got == expected
    assert len(got) > 0  # hot-cell rows guarantee matches


def test_cell_pip_join_matches_oracle(fixtures, expected):
    pts, polys = fixtures
    got = {
        (r["i"], r["poly_id"])
        for r in PJ.pip_join_cells(pts, polys, zoom=6).select("i", "poly_id").collect()
    }
    assert got == expected


def test_cell_pip_join_salted_matches_oracle(fixtures, expected):
    pts, polys = fixtures
    got = {
        (r["i"], r["poly_id"])
        for r in PJ.pip_join_cells(pts, polys, zoom=6, salt=4)
        .select("i", "poly_id")
        .collect()
    }
    assert got == expected


def test_left_join_keeps_unmatched(fixtures, expected):
    pts, polys = fixtures
    rows = PJ.pip_join(pts, polys, how="left").select("i", "poly_id").collect()
    matched_i = {i for (i, _) in expected}
    got_pairs = {(r["i"], r["poly_id"]) for r in rows if r["poly_id"] is not None}
    got_nulls = {r["i"] for r in rows if r["poly_id"] is None}
    assert got_pairs == expected
    assert got_nulls == set(range(N_PAGES)) - matched_i
    assert len(rows) == len(expected) + len(got_nulls)


def test_first_match_semantics(fixtures, expected):
    pts, polys = fixtures
    rows = PJ.pip_join(pts, polys, first_match=True).select("i", "poly_id").collect()
    best = {}
    for i, pid in expected:
        best[i] = min(best.get(i, pid), pid)
    assert {(r["i"], r["poly_id"]) for r in rows} == set(best.items())


def test_hot_cell_is_actually_hot(fixtures):
    pts, _ = fixtures
    hot = pts.filter((F.col("i") % 100) == 0).count()
    assert hot == N_PAGES // 100


def test_pages_text_invariant_vs_generator(spark):
    # text column == extractor spec (title + \n + body) — byte identical
    rows = P.pages_df(spark, 50).select("i", "text", "html").collect()
    for r in rows:
        assert r["text"] == P.page_text(r["i"])
        assert bytes(r["html"]) == P.page_html(r["i"])
