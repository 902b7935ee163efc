"""Stateful streaming operators: dedup-in-stream, session windows, custom
applyInPandasWithState counters."""

import tempfile

from pyspark.sql import functions as F

from gdal_spark.data.pages import pages_df
from gdal_spark.streaming.ingest import run_stream_to_memory, stream_pages_from_parquet
from gdal_spark.streaming import stateful as S


def _write_stream_source(spark, n=2000, dup_every=10):
    pages = pages_df(spark, n).select("i", "url", "warc_ts", "lon", "lat", "lang")
    # inject duplicates: every dup_every-th row repeated
    dups = pages.filter((F.col("i") % dup_every == 0) & (F.col("i") > 0))
    src = pages.unionAll(dups)
    path = tempfile.mkdtemp(prefix="gdal_spark_stream_src_")
    src.write.mode("overwrite").parquet(path)
    return src, path


def test_streaming_dedup(spark):
    src, path = _write_stream_source(spark, 2000, 10)
    stream = stream_pages_from_parquet(spark, path, src.schema)
    q = run_stream_to_memory(
        S.streaming_dedup(stream), "dedup_out", output_mode="append"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM dedup_out").first()[0]
    assert got == 2000  # 200 injected dups dropped


def test_session_window_batch_stream_parity(spark):
    src, path = _write_stream_source(spark, 1000, 1000000)
    batch = S.session_window_counts(
        spark.read.parquet(path), gap="10 minutes", key="lang"
    )
    want = {
        (r["win_start"], r["lang"]): r["n_events"] for r in batch.collect()
    }
    stream = stream_pages_from_parquet(spark, path, src.schema)
    q = run_stream_to_memory(
        S.session_window_counts(stream, gap="10 minutes", key="lang"),
        "sess_out",
        output_mode="complete",
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["lang"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == want
    assert sum(want.values()) == 1000


def test_running_tile_counts_state(spark):
    src, path = _write_stream_source(spark, 1000, 1000000)
    stream = stream_pages_from_parquet(spark, path, src.schema)
    q = run_stream_to_memory(
        S.running_tile_counts(stream, zoom=2), "tiles_out", output_mode="append"
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tiles_out").collect()
    assert sum(r["batch_count"] for r in rows) == 1000
    # single micro-batch (availableNow over one source write): running ==
    # batch per tile
    for r in rows:
        assert r["running_total"] >= r["batch_count"]
