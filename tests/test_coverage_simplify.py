"""simplify-coverage: VW kernel + shared-chain consistency on a 2×2 grid
with zigzag internal boundaries (apps/gdalalg_vector_simplify_coverage.cpp
/ GEOS CoverageSimplifier semantics)."""

import numpy as np

from gdal_spark.operators.coverage_simplify import (
    demo_coverage_rings, simplify_coverage, vw_simplify)


def test_vw_removes_small_teeth():
    chain = np.asarray(
        [[2.0 + (0.05 if k in (1, 3) else 0.0), 0.2 * k] for k in range(6)])
    out = vw_simplify(chain, 0.1)
    assert out.shape == (2, 2)
    assert np.allclose(out, [[2.0, 0.0], [2.0, 1.0]])


def test_vw_keeps_large_corner():
    chain = np.asarray([[0.0, 1.0], [0.0, 0.0], [2.0, 0.0]])
    out = vw_simplify(chain, 0.1)  # corner area 1.0 >= tol
    assert out.shape == (3, 2)


def test_coverage_simplify_grid(spark):
    df = spark.createDataFrame(
        demo_coverage_rings(), "poly_id long, ring array<array<double>>")
    out = simplify_coverage(df, tol=0.1).orderBy("poly_id").collect()
    assert [r["poly_id"] for r in out] == [0, 1, 2, 3]
    for r in out:
        assert r["n_vertices"] == 5, (r["poly_id"], r["n_vertices"])
        assert abs(r["area"] - 2.0) < 1e-12
