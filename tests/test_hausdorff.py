"""Discrete Hausdorff distance — GEOS DiscreteHausdorffDistance semantics.

Each oriented term measures every VERTEX of one line against the other
line's SEGMENTS (point-to-segment distance), matching GEOS
``algorithm::distance::DiscreteHausdorffDistance`` /
OGR_G_HausdorffDistance (reference: ogr/ogrgeometry.cpp OGR_G_... ->
geos::DiscreteHausdorffDistance::distance).  The crossing-lines case below
separates this from the vertex-to-vertex simplification: vertex-set HD
would be sqrt(34) ~= 5.83, GEOS HD is exactly 5.
"""

import math

from gdal_spark.data.pages import LINE_SCHEMA
from gdal_spark.operators.lines import hausdorff_join


def _hd(spark, a_coords, b_coords):
    a = spark.createDataFrame([(1, a_coords)], schema=LINE_SCHEMA)
    b = spark.createDataFrame([(2, b_coords)], schema=LINE_SCHEMA)
    rows = hausdorff_join(a, b).collect()
    assert len(rows) == 1
    return rows[0]["hd"]


def test_crossing_lines_point_to_segment(spark):
    # A along y=0, B vertical through (5, -3)..(5, 3): every A vertex is
    # distance 5 from segment B (closest point (5, 0)); every B vertex is
    # distance 3 from segment A.  Vertex-to-vertex would give sqrt(34).
    hd = _hd(spark, [[0.0, 0.0], [10.0, 0.0]], [[5.0, 3.0], [5.0, -3.0]])
    assert hd == 5.0


def test_vertex_on_segment_contributes_zero(spark):
    # B's vertex (5, 0) lies ON segment A -> its oriented term is 0;
    # A's endpoints are 5 from B's nearest vertex region along the segment.
    hd = _hd(spark, [[0.0, 0.0], [10.0, 0.0]], [[5.0, 0.0], [5.0, 2.0]])
    # A verts (0,0),(10,0) -> segment B x=5: distance 5 each; B verts:
    # (5,0) -> 0, (5,2) -> 2.  HD = 5.
    assert hd == 5.0


def test_parallel_offset(spark):
    hd = _hd(spark, [[0.0, 0.0], [10.0, 0.0]], [[0.0, 1.0], [10.0, 1.0]])
    assert hd == 1.0


def test_degenerate_zero_length_segment(spark):
    # B collapses to a repeated point: len2 == 0 guard must treat the
    # segment as a point, not emit NaN.
    hd = _hd(spark, [[0.0, 0.0], [4.0, 0.0]], [[1.0, 1.0], [1.0, 1.0]])
    # A->B: max(min dist) = dist((4,0),(1,1)) = sqrt(10); B->A: 1.
    assert math.isclose(hd, math.sqrt(10.0), rel_tol=0, abs_tol=1e-12)
