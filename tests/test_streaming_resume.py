"""Checkpointed streaming resume: a file-source → parquet-sink stream with a
checkpointLocation processes new data exactly-once across restarts — the
streaming half of the north rule's "resumable from the last committed
checkpoint snapshot" (the batch half is plans/lineage.py)."""

import os
import tempfile

from pyspark.sql import functions as F

from gdal_spark.data.pages import pages_df
from gdal_spark.spatial import tilemath as TM


def _run_until_done(q):
    q.awaitTermination(180)


def test_stream_restart_resumes_from_checkpoint(spark):
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_src_")
    out_dir = tempfile.mkdtemp(prefix="gdal_spark_out_")
    ckpt_dir = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")

    pages = pages_df(spark, 2000).select("i", "url", "warc_ts", "lon", "lat")
    batch1 = pages.filter(F.col("i") < 1000)
    batch2 = pages.filter(F.col("i") >= 1000)
    batch1.write.mode("append").parquet(src_dir)

    def start():
        stream = spark.readStream.schema(pages.schema).parquet(src_dir)
        tx, ty = TM.lonlat_to_tile(F.col("lon"), F.col("lat"), 6)
        enriched = stream.withColumn("tx", tx).withColumn("ty", ty)
        return (
            enriched.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )

    _run_until_done(start())
    assert spark.read.parquet(out_dir).count() == 1000

    # new data lands while the stream is DOWN; restart from the checkpoint
    batch2.write.mode("append").parquet(src_dir)
    _run_until_done(start())

    out = spark.read.parquet(out_dir)
    assert out.count() == 2000                      # no reprocessing of batch1
    assert out.select("i").distinct().count() == 2000  # exactly-once
    # derived columns survived the restart path
    assert out.filter(F.col("tx").isNull()).count() == 0


class TestStreamingSnapshotSink:
    def test_replay_with_lost_checkpoint_adds_nothing(self, spark):
        """The capstone's exactly-once contract in isolation: after the
        fresh-checkpoint replay, the snapshot count and row count are
        unchanged (content-addressed markers, not Spark batch ids)."""
        from gdal_spark import queries as Q

        out = Q.QUERIES["streaming_snapshot_sink"](
            spark, "/root/testdata/sf0.001").collect()
        assert out, "no event types"
        for r in out:
            assert r["n_snapshots"] == 4
            assert r["replay_added"] == 0
