"""Unit tests for ST_LineMerge (GEOS LineMerger semantics)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdal_spark.operators import linemerge as LM


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "seg_id long, x1 double, y1 double, x2 double, y2 double"
    )


def test_line_merge_chain_reassembly_and_orientation(spark):
    # chain 2-1-0-3 presented out of order and with flipped directions
    rows = [
        (0, 1.0, 0.0, 2.0, 0.0),
        (1, 3.0, 0.0, 2.0, 0.0),   # flipped
        (2, 0.0, 0.0, 1.0, 0.0),
    ]
    out = LM.line_merge(_segs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["start_x"], r["start_y"], r["end_x"], r["end_y"]) == (
        0.0, 0.0, 3.0, 0.0)
    assert r["n_segments"] == 3 and not r["is_ring"]
    assert r["len_micro"] == 3_000_000
    assert r["chain_id"] == 0  # min seg id


def test_line_merge_junction_breaks_chains(spark):
    # three segments meeting at the origin (degree 3): NO merging
    rows = [
        (0, 0.0, 0.0, 1.0, 0.0),
        (1, 0.0, 0.0, 0.0, 1.0),
        (2, 0.0, 0.0, -1.0, 0.0),
    ]
    out = LM.line_merge(_segs(spark, rows)).collect()
    assert len(out) == 3
    assert all(r["n_segments"] == 1 for r in out)


def test_line_merge_closed_ring(spark):
    rows = [
        (0, 0.0, 0.0, 1.0, 0.0),
        (1, 1.0, 0.0, 1.0, 1.0),
        (2, 1.0, 1.0, 0.0, 1.0),
        (3, 0.0, 1.0, 0.0, 0.0),
    ]
    out = LM.line_merge(_segs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["is_ring"] and r["n_segments"] == 4
    # canonical ring start: smallest vertex, closes on itself
    assert (r["start_x"], r["start_y"]) == (0.0, 0.0)
    assert (r["end_x"], r["end_y"]) == (0.0, 0.0)
    assert r["len_micro"] == 4_000_000


def test_line_merge_isolated_segment(spark):
    out = LM.line_merge(
        _segs(spark, [(7, 5.0, 5.0, 6.0, 5.0)])
    ).collect()
    assert len(out) == 1 and out[0]["chain_id"] == 7
    assert out[0]["n_segments"] == 1 and not out[0]["is_ring"]
