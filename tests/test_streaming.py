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


def test_streaming_pip_tile_flagship(spark):
    """The flagship PIP + tile-assign chain runs unchanged on a STREAMING
    DataFrame (stateless mapInPandas + column math are stream-capable), and
    a file-source micro-batch produces the same rows as the batch run."""
    import tempfile

    from pyspark.sql import functions as F

    from gdal_spark.data.pages import pages_df, polygons_df
    from gdal_spark.operators.pip_join import pip_join
    from gdal_spark.operators.tiles import assign_tiles

    src = tempfile.mkdtemp(prefix="gdal_spark_stream_pip_")
    pages = pages_df(spark, 600).select("i", "url", "lon", "lat")
    pages.write.mode("append").parquet(src)

    batch = assign_tiles(
        pip_join(pages, polygons_df(spark), first_match=True), zoom=8
    ).select("i", "poly_id", "tx", "ty")
    expected = {(r["i"], r["poly_id"], r["tx"], r["ty"])
                for r in batch.collect()}

    stream = spark.readStream.schema(pages.schema).parquet(src)
    out = assign_tiles(
        pip_join(stream, polygons_df(spark), first_match=True), zoom=8
    ).select("i", "poly_id", "tx", "ty")
    q = (
        out.writeStream.format("memory")
        .queryName("pip_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["i"], r["poly_id"], r["tx"], r["ty"])
        for r in spark.sql("SELECT * FROM pip_stream_out").collect()
    }
    assert got == expected and len(got) > 0
