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
