"""Unit tests for spatial clustering operators (DBSCAN / cluster-within)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gdal_spark.operators import cluster as CL


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id bigint, x double, y double")


def _brute_pairs(rows, eps):
    out = set()
    for i, (ida, xa, ya) in enumerate(rows):
        for j, (idb, xb, yb) in enumerate(rows):
            if i != j and (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps:
                out.add((ida, idb))
    return out


def test_within_eps_pairs_matches_brute_force(spark):
    # deterministic pseudo-random scatter incl. exact-boundary pairs
    rows = [
        (i, ((i * 37) % 97) / 10.0, ((i * 61) % 89) / 10.0) for i in range(60)
    ] + [(100, 0.0, 0.0), (101, 0.5, 0.0), (102, 0.3, 0.4)]  # dist .5 exact
    got = {
        (r.u, r.v)
        for r in CL.within_eps_pairs(_pts(spark, rows), eps=0.5).collect()
    }
    assert got == _brute_pairs(rows, 0.5)


def test_dbscan_two_blobs_and_noise(spark):
    blob_a = [(i, 0.0 + (i % 3) * 0.1, 0.0 + (i // 3) * 0.1) for i in range(9)]
    blob_b = [(i + 20, 10.0 + (i % 3) * 0.1, 5.0 + (i // 3) * 0.1)
              for i in range(9)]
    noise = [(50, -40.0, 40.0)]
    out = CL.cluster_dbscan(
        _pts(spark, blob_a + blob_b + noise), eps=0.3, minpts=4
    ).collect()
    lbl = {r.id: (r.cluster_id, r.is_core) for r in out}
    assert len(out) == 19
    # every blob-a member shares one cluster labeled by its min id (0)
    assert {lbl[i][0] for i in range(9)} == {0}
    assert {lbl[i + 20][0] for i in range(9)} == {20}
    assert lbl[50] == (None, False)  # noise
    # 3x3 grid with spacing .1 and eps .3: every member sees >= 4 points
    assert all(lbl[i][1] for i in range(9))


def test_dbscan_border_point(spark):
    core_blob = [(i, (i % 2) * 0.1, (i // 2) * 0.1) for i in range(6)]
    border = [(10, 0.35, 0.0)]  # within eps of core id=1 but degree-poor
    out = CL.cluster_dbscan(
        _pts(spark, core_blob + border), eps=0.3, minpts=5
    ).collect()
    lbl = {r.id: (r.cluster_id, r.is_core) for r in out}
    assert lbl[10] == (0, False)  # border joins the cluster, not core
    assert all(lbl[i] == (0, True) for i in range(6))


def test_cluster_within_singletons_and_chain(spark):
    # a chain 0-1-2 (consecutive within eps, ends not) + two singletons
    rows = [(0, 0.0, 0.0), (1, 0.4, 0.0), (2, 0.8, 0.0),
            (7, 5.0, 5.0), (9, -5.0, -5.0)]
    out = CL.cluster_within(_pts(spark, rows), eps=0.5).collect()
    got = {r.id: (r.cluster_id, r.cluster_size) for r in out}
    assert got == {0: (0, 3), 1: (0, 3), 2: (0, 3), 7: (7, 1), 9: (9, 1)}


def test_pair_join_is_bucketed_not_cartesian(spark):
    """The eps-neighbor join must be an equi-join on the cell key — a
    CartesianProduct/BroadcastNestedLoop here would square at scale."""
    rows = [(i, float(i % 10), float(i // 10)) for i in range(100)]
    plan = CL.within_eps_pairs(_pts(spark, rows), eps=0.5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
