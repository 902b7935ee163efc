"""Streaming extension: batch/stream parity of tile_window_counts."""

import tempfile

from gdal_spark.data.pages import pages_df
from gdal_spark.streaming.ingest import (
    run_stream_to_memory,
    stream_pages_from_parquet,
    tile_window_counts,
)


def test_batch_stream_parity(spark):
    pages = pages_df(spark, 2000).select("warc_ts", "lon", "lat", "lang")
    path = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    pages.write.mode("overwrite").parquet(path)

    batch = tile_window_counts(
        spark.read.parquet(path), zoom=4, window_duration="10 minutes"
    )
    want = {
        (r["win_start"], r["tx"], r["ty"]): r["n_pages"]
        for r in batch.collect()
    }

    stream = stream_pages_from_parquet(spark, path, pages.schema)
    q = run_stream_to_memory(
        tile_window_counts(stream, zoom=4, window_duration="10 minutes"),
        "tile_counts",
        output_mode="complete",
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["tx"], r["ty"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM tile_counts").collect()
    }
    assert got == want
    assert sum(want.values()) == 2000
