"""As-of + range join regressions (round-2 code review findings)."""

import pytest

from gdal_spark.operators.temporal import asof_join, range_join


def test_asof_null_payload_latest_row_wins(spark):
    """A latest prior right row with NULL payload must match (and yield
    NULL), not fall back to an older non-null row."""
    left = spark.createDataFrame([(1, 25)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None)], "user_id long, ts long, value double"
    )
    out = asof_join(left, right, key="user_id", left_ts="ts",
                    right_ts="ts", payload=["value"]).collect()
    assert len(out) == 1
    assert out[0]["value"] is None  # latest (ts=20) row matched, value NULL


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, 5)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 3.0)], "user_id long, ts long, value double"
    )
    out = asof_join(left, right, key="user_id", left_ts="ts",
                    right_ts="ts", payload=["value"]).collect()
    assert out[0]["value"] is None


def test_range_join_boundary_epsilon_regression(spark):
    """hi within 1e-12 above a bucket boundary must NOT drop matches."""
    vals = spark.createDataFrame([(1, 5.0)], "k long, v double")
    ivs = spark.createDataFrame(
        [(7, 0.0, 5.0000000000005)], "band long, lo double, hi double"
    )
    out = range_join(vals, ivs, value_col="v", bucket_width=1.0).collect()
    assert len(out) == 1 and out[0]["band"] == 7
