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


def test_polygonize_default_budget_scales_with_cell_count(spark, monkeypatch):
    """The default CC round budget must scale with the CELL COUNT, not the
    grid width: min-label propagation is 1 hop/round and a serpentine
    region's diameter is O(width*height) — a tall raster under the old
    8*width default raised on valid input."""
    import gdal_spark.operators.polygonize as PZ

    seen = {}
    real = PZ.connected_components

    def spy(edges, **kw):
        seen.update(kw)
        return real(edges, **kw)

    monkeypatch.setattr(PZ, "connected_components", spy)
    # sparse singletons on a 2-wide × 100-tall grid (fast CC convergence)
    rows = [(0, y, 1) for y in range(0, 100, 3)] + [(1, 0, 1)]
    PZ.polygonize(_cells(spark, rows)).collect()
    assert seen["max_iter"] == 200  # width(2) × height(100)
