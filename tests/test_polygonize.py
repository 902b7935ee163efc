"""Polygonize: adjacency/CC/ring-tracing composition vs hand-known shapes
(alg/polygonize.cpp semantics — 4-connectivity, holes as interior rings)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.polygonize import polygonize


def _cells(spark, rows):
    return spark.createDataFrame(rows, "gx long, gy long, val long")


def test_polygonize_l_shape_and_singleton(spark):
    # value 1 forms an L (3 cells), value 2 is a singleton
    rows = [(0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 2)]
    out = {r["region_id"]: r for r in polygonize(
        _cells(spark, rows), width=2).collect()}
    assert len(out) == 2
    l_region = out[0]
    assert l_region["n_cells"] == 3 and l_region["area"] == pytest.approx(3.0)
    assert l_region["perimeter"] == pytest.approx(8.0)
    single = out[3]  # cid = 1*2+1
    assert single["n_cells"] == 1 and single["val"] == 2.0


def test_polygonize_region_with_hole(spark):
    # 3×3 ring of value 1 around a center of value 2 → outer region has a hole
    rows = []
    for y in range(3):
        for x in range(3):
            rows.append((x, y, 2 if (x, y) == (1, 1) else 1))
    out = {r["val"]: r for r in polygonize(_cells(spark, rows), width=3).collect()}
    ring = out[1.0]
    assert ring["n_cells"] == 8
    assert ring["n_rings"] == 2          # exterior + hole
    assert ring["area"] == pytest.approx(8.0)  # 9 − 1
    assert out[2.0]["n_cells"] == 1


def test_polygonize_diagonal_cells_are_separate(spark):
    # 4-connectivity: diagonal same-value cells do NOT merge
    rows = [(0, 0, 5), (1, 1, 5)]
    out = polygonize(_cells(spark, rows), width=2).collect()
    assert len(out) == 2


def test_label_regions_two_level_contract(spark, monkeypatch):
    """Two-level CC contract: block-local union-find + bounded DRIVER
    union-find of the contracted boundary graph — the distributed CC
    fallback must NOT run for small contracted graphs, and a region
    spanning many blocks must still get one label (= min cid)."""
    import gdal_spark.operators.polygonize as PZ

    called = {"cc": False}

    def spy(edges, **kw):
        called["cc"] = True
        return PZ.connected_components(edges, **kw)

    monkeypatch.setattr(PZ, "connected_components", spy)
    # serpentine of value 1 snaking across a 12-wide grid, block=4 →
    # the region crosses block boundaries repeatedly
    rows = [(x, 0, 1) for x in range(12)] + [(11, 1, 1)] + \
        [(x, 2, 1) for x in range(12)] + [(5, 4, 9)]
    lab = PZ.label_regions(
        _cells(spark, rows), width=12, block=4).collect()
    regions = {}
    for r in lab:
        regions.setdefault(r["region_id"], []).append(r["cid"])
    assert not called["cc"]  # driver union-find path taken
    assert len(regions) == 2
    assert sorted(regions)[0] == 0          # serpentine labeled min cid
    assert len(regions[0]) == 25
    assert regions[4 * 12 + 5] == [4 * 12 + 5]  # singleton self-labeled


def test_label_regions_8conn_across_block_corner(spark):
    """8-connectivity across a block CORNER (down-right and down-left
    diagonal crossings must reach the contracted graph)."""
    import gdal_spark.operators.polygonize as PZ

    # blocks of 4: (3,3) and (4,4) touch only diagonally across the
    # corner; (4,3) and (3,4) differ in value
    rows = [(3, 3, 7), (4, 4, 7), (4, 3, 1), (3, 4, 2)]
    lab = PZ.label_regions(
        _cells(spark, rows), width=8, block=4, connectedness=8).collect()
    by_cid = {r["cid"]: r["region_id"] for r in lab}
    assert by_cid[3 * 8 + 3] == by_cid[4 * 8 + 4]  # merged across corner
    assert by_cid[3 * 8 + 4] != by_cid[3 * 8 + 3]
    assert by_cid[4 * 8 + 3] != by_cid[3 * 8 + 3]
