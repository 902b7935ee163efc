"""S2 cell index unit tests — anchors the implementation to the published
S2 cell model (independent of the DuckDB gate parity, which
tests/test_entry_correctness.py covers)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.spatial.s2 import (
    _s2_key_numpy,
    py_s2_cell_id,
    py_s2_key,
)


def test_origin_leaf_is_canonical_anchor():
    # Published S2 anchor: the leaf cell containing (0E, 0N) is the center
    # leaf of face 0 -> id 0x1000000000000001 (token "1000000000000001").
    assert py_s2_cell_id(0.0, 0.0, 30) == 0x1000000000000001


@pytest.mark.parametrize(
    "lon,lat,face",
    [(0, 0, 0), (90, 0, 1), (0, 90, 2), (180, 0, 3), (-90, 0, 4), (0, -90, 5)],
)
def test_face_selection(lon, lat, face):
    assert py_s2_key(lon, lat, 12) >> 24 == face


def test_face_center_cell_ids():
    # Each face's center leaf id is (2*face+1) << 60 | 1; exact only where
    # the trig is float-exact (lon 0/180 at lat 0 -> sin exact).
    assert py_s2_cell_id(0.0, 0.0, 30) == (1 << 60) | 1
    # level-0 id of any point on a face is (2*face+1) << 60.
    for lon, lat, face in [(0, 0, 0), (90, 0, 1), (0, 90, 2),
                           (180, 0, 3), (-90, 0, 4), (0, -90, 5)]:
        assert py_s2_cell_id(lon, lat, 0) == (2 * face + 1) << 60


def test_numpy_matches_python_scalar():
    rng = np.random.default_rng(7)
    lons = rng.uniform(-180, 180, 500)
    lats = rng.uniform(-89.9, 89.9, 500)
    ks = _s2_key_numpy(lons, lats, 12)
    for i in range(500):
        assert ks[i] == py_s2_key(float(lons[i]), float(lats[i]), 12)


def test_level_truncation_is_prefix():
    # pos at level L' is the high-bit prefix of pos at level L > L' — the
    # property the parent-rollup gate relies on (pos >> 2*(L-L')).
    rng = np.random.default_rng(11)
    lons = rng.uniform(-180, 180, 2000)
    lats = rng.uniform(-89.9, 89.9, 2000)
    k12 = _s2_key_numpy(lons, lats, 12)
    k8 = _s2_key_numpy(lons, lats, 8)
    f12, p12 = k12 >> 24, k12 & (4**12 - 1)
    f8, p8 = k8 >> 16, k8 & (4**8 - 1)
    assert np.array_equal(f12, f8)
    assert np.array_equal(p12 >> 8, p8)


def test_pos_in_range_all_faces_hit():
    rng = np.random.default_rng(13)
    lons = rng.uniform(-180, 180, 5000)
    lats = rng.uniform(-89.9, 89.9, 5000)
    k = _s2_key_numpy(lons, lats, 12)
    face, pos = k >> 24, k & (4**12 - 1)
    assert face.min() >= 0 and face.max() <= 5
    assert set(np.unique(face)) == set(range(6))
    assert pos.min() >= 0 and pos.max() < 4**12


def test_hilbert_locality_siblings_contiguous():
    # The four children of any level-11 cell occupy 4 consecutive level-12
    # positions — the defining Hilbert/quadtree nesting property.
    rng = np.random.default_rng(17)
    lons = rng.uniform(-180, 180, 3000)
    lats = rng.uniform(-89.9, 89.9, 3000)
    k12 = _s2_key_numpy(lons, lats, 12)
    k11 = _s2_key_numpy(lons, lats, 11)
    assert np.array_equal((k12 & (4**12 - 1)) >> 2, k11 & (4**11 - 1))


def test_cell_id_hex_halves_match_python():
    from gdal_spark.spatial.s2 import sql_s2_cell_hex
    import duckdb

    rng = np.random.default_rng(19)
    lons = rng.uniform(-180, 180, 64)
    lats = rng.uniform(-89.9, 89.9, 64)
    level = 8
    k = _s2_key_numpy(lons, lats, level)
    face, pos = k >> 16, k & (4**8 - 1)
    con = duckdb.connect()
    for fc, ps, lo, la in zip(face, pos, lons, lats):
        want = format(py_s2_cell_id(float(lo), float(la), level), "016x")
        got = con.execute(
            f"SELECT {sql_s2_cell_hex(str(int(fc)), str(int(ps)), level)}"
        ).fetchone()[0]
        assert got == want
