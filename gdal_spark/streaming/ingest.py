"""Structured Streaming ingest — the engine's streaming extension.

The reference has NO streaming subsystem (SURVEY.md §2.10); its pull-based
GetNextFeature chains map to micro-batches but carry no late-data semantics.
This module adds the Spark-native extension the north-rule workload wants:
continuous ingest of Common-Crawl-style pages with event-time windowing on
``warc_ts`` and per-tile rollups.

Because every engine operator is a DataFrame→DataFrame function, the SAME
transformations run in batch and streaming; the only streaming-specific
pieces are watermarking and output mode. ``tile_window_counts`` works on
either a batch or a streaming DataFrame — tests verify batch/stream parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.spatial import tilemath as TM


def tile_window_counts(
    df: DataFrame,
    zoom: int,
    window_duration: str = "1 hour",
    watermark: str | None = "2 hours",
    ts: str = "warc_ts",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Tumbling-window page counts per XYZ tile.

    Batch: plain groupBy(window, tx, ty). Streaming: add a watermark so
    state for closed windows is dropped — at 10^12 rows/day the state store
    holds only (open windows × active tiles) keys. Output columns:
    (win_start, win_end, tx, ty, n_pages, n_langs).
    """
    if df.isStreaming and watermark:
        df = df.withWatermark(ts, watermark)
    tx, ty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    keyed = df.withColumn("tx", tx).withColumn("ty", ty)
    agg = (
        keyed.groupBy(F.window(F.col(ts), window_duration), "tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("lang").alias("n_langs"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "tx", "ty", "n_pages", "n_langs",
        )
    )
    return agg


def stream_pages_from_parquet(spark, path: str, schema) -> DataFrame:
    """File-source streaming reader for a pages-shaped parquet directory —
    the sandbox stand-in for a Kafka/WARC firehose."""
    return spark.readStream.schema(schema).parquet(path)


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "append"):
    """Drive a streaming DataFrame into an in-memory sink (tests/demos)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
