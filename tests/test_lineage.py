"""Lineage/metrics + checkpoint-resume protocol."""

import tempfile

from pyspark.sql import functions as F

from gdal_spark.plans.lineage import Pipeline


def test_pipeline_runs_and_resumes(spark):
    src = spark.range(1000).withColumn("v", F.col("id") * 2)
    root = tempfile.mkdtemp(prefix="gdal_spark_lineage_")

    calls = {"a": 0, "b": 0}

    def stage_a(df):
        calls["a"] += 1
        return df.filter(F.col("id") % 2 == 0)

    def stage_b(df):
        calls["b"] += 1
        return df.withColumn("w", F.col("v") + 1)

    pipe = Pipeline(root).stage("even", stage_a).stage("plus", stage_b)
    r1 = pipe.run(spark, src, fingerprint="f1")
    assert [s.skipped for s in r1] == [False, False]
    assert r1[0].rows == 500 and r1[1].rows == 500

    # resume: both committed → both skipped, stage fns not re-invoked
    r2 = Pipeline(root).stage("even", stage_a).stage("plus", stage_b).run(
        spark, src, fingerprint="f1"
    )
    assert [s.skipped for s in r2] == [True, True]
    assert calls == {"a": 1, "b": 1}

    # fingerprint change → recompute
    r3 = Pipeline(root).stage("even", stage_a).stage("plus", stage_b).run(
        spark, src, fingerprint="f2"
    )
    assert [s.skipped for s in r3] == [False, False]


def test_metrics_table(spark):
    src = spark.range(100)
    root = tempfile.mkdtemp(prefix="gdal_spark_lineage_")
    pipe = Pipeline(root).stage("ident", lambda df: df)
    pipe.run(spark, src)
    m = pipe.metrics(spark)
    rows = m.collect()
    assert sum(r["rows"] for r in rows) == 100
    assert all(r["bytes_est"] > 0 for r in rows)
    assert all(r["stage"] == "ident" for r in rows)


class TestSnapshotTable:
    def test_time_travel_and_cow_delete(self, spark, tmp_path):
        from gdal_spark.plans.snapshots import SnapshotTable

        t = SnapshotTable(str(tmp_path / "t"), key_col="k")
        s1 = t.append(spark.range(0, 50).selectExpr("id as k"))
        s2 = t.append(spark.range(50, 100).selectExpr("id as k"))
        assert (s1, s2) == (1, 2)
        s3, rewritten, carried = t.delete_range(spark, 10, 20)
        assert s3 == 3
        # stats pruning: only the first segment intersects [10, 20)
        assert rewritten == 1 and carried == 1
        assert t.read(spark, as_of=1).count() == 50
        assert t.read(spark, as_of=2).count() == 100
        live = t.read(spark, as_of=3)
        assert live.count() == 90
        assert live.filter("k >= 10 and k < 20").count() == 0
        # latest = snapshot 3
        assert t.read(spark).count() == 90

    def test_delete_missing_everything_carries_all(self, spark, tmp_path):
        from gdal_spark.plans.snapshots import SnapshotTable

        t = SnapshotTable(str(tmp_path / "t2"), key_col="k")
        t.append(spark.range(0, 10).selectExpr("id as k"))
        t.append(spark.range(10, 20).selectExpr("id as k"))
        _, rewritten, carried = t.delete_range(spark, 1000, 2000)
        assert rewritten == 0 and carried == 2
        assert t.read(spark).count() == 20

    def test_segment_emptied_by_delete_is_dropped(self, spark, tmp_path):
        from gdal_spark.plans.snapshots import SnapshotTable

        t = SnapshotTable(str(tmp_path / "t3"), key_col="k")
        t.append(spark.range(0, 10).selectExpr("id as k"))
        t.append(spark.range(10, 20).selectExpr("id as k"))
        _, rewritten, _ = t.delete_range(spark, 0, 10)
        assert rewritten == 1
        assert t.read(spark).count() == 10
        from gdal_spark.plans.snapshots import SnapshotTable as _S
        segs = t._load(t.current_id())
        assert len(segs) == 1  # the emptied segment left the manifest


class TestSnapshotMaintenance:
    def test_compact_preserves_data_and_history(self, spark, tmp_path):
        from gdal_spark.plans.snapshots import SnapshotTable

        tbl = SnapshotTable(str(tmp_path / "t"), key_col="k")
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        for b in range(4):
            tbl.append(df.filter(F.col("k") % 4 == b))
        pre_id = tbl.current_id()
        pre = sorted(tuple(r) for r in tbl.read(spark).collect())

        snap_id, n_compacted, n_carried = tbl.compact(spark)
        assert (n_compacted, n_carried) == (4, 0)
        assert len(tbl._load(snap_id)) == 1
        post = sorted(tuple(r) for r in tbl.read(spark).collect())
        assert post == pre
        # immutable segments: the pre-compaction snapshot still reads
        old = sorted(tuple(r) for r in tbl.read(spark, as_of=pre_id).collect())
        assert old == pre

    def test_compact_max_rows_carries_big_segments(self, spark, tmp_path):
        from gdal_spark.plans.snapshots import SnapshotTable

        tbl = SnapshotTable(str(tmp_path / "t2"), key_col="k")
        df = spark.range(60).select(
            F.col("id").alias("k"), F.col("id").alias("v"))
        tbl.append(df.filter(F.col("k") < 40))        # big (40 rows)
        tbl.append(df.filter((F.col("k") >= 40) & (F.col("k") < 50)))
        tbl.append(df.filter(F.col("k") >= 50))
        _, n_compacted, n_carried = tbl.compact(spark, max_rows=20)
        assert (n_compacted, n_carried) == (2, 1)
        assert tbl.read(spark).count() == 60

    def test_merge_full_delete_update_insert(self, spark, tmp_path):
        from gdal_spark.plans.snapshots import SnapshotTable

        tbl = SnapshotTable(str(tmp_path / "t3"), key_col="k")
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        tbl.append(df.filter(F.col("k") < 50))
        tbl.append(df.filter(F.col("k") >= 50))
        src = spark.createDataFrame(
            [(5, 0, True),        # delete k=5 (segment 1)
             (7, 777, False),     # update k=7 (segment 1)
             (200, 42, False)],   # insert (beyond both ranges)
            "k long, v long, _delete boolean")
        _, rewritten, carried = tbl.merge_full(spark, src)
        assert (rewritten, carried) == (1, 1)
        rows = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
        assert 5 not in rows
        assert rows[7] == 777
        assert rows[200] == 42
        assert len(rows) == 100  # 100 - 1 deleted + 1 inserted
