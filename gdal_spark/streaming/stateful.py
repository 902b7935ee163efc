"""Custom stateful streaming operators.

The reference has no streaming (SURVEY.md §2.10); these are the Structured-
Streaming-native extensions a Common-Crawl ingest pipeline needs:

* ``streaming_dedup``       — drop duplicate urls within the watermark
                              horizon (`dropDuplicatesWithinWatermark` —
                              state is bounded by the watermark).
* ``session_window_counts`` — native session windows (gap-close semantics,
                              the streaming twin of queries.q_sessionize).
* ``running_tile_counts``   — custom state via applyInPandasWithState:
                              per-tile running totals emitted every batch —
                              the shape of any bespoke stateful operator
                              (counters, CMS sketches, online quantiles).

All three operate on a pages-shaped stream (warc_ts, url, lon, lat, ...).
Batch/stream parity for the window aggregations is tested in
tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gdal_spark.spatial import tilemath as TM


def streaming_dedup(
    stream: DataFrame, key: str = "url", ts: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup over a stream with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for expired keys is
    reclaimed. The streaming form of operators/dedup.exact_dedup."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def session_window_counts(
    stream: DataFrame, gap: str = "30 minutes", ts: str = "warc_ts",
    key: str = "lang", watermark: str = "1 hour",
) -> DataFrame:
    """Event-time session windows (gap-based close) per key — the native
    streaming twin of the batch sessionize query."""
    src = stream.withWatermark(ts, watermark) if stream.isStreaming else stream
    return (
        src.groupBy(F.session_window(F.col(ts), gap), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("win_start"),
            F.col("session_window.end").alias("win_end"),
            key, "n_events",
        )
    )


_STATE_SCHEMA = "total LONG"
_OUT_SCHEMA = "tx INT, ty INT, batch_count LONG, running_total LONG"


def _tile_state_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-tile page counter. State = one long; emits (tile,
    batch_count, running_total) each trigger the tile receives data."""
    batch = sum(len(p) for p in pdfs)
    total = state.get[0] if state.exists else 0
    total += batch
    state.update((total,))
    yield pd.DataFrame(
        {
            "tx": [key[0]],
            "ty": [key[1]],
            "batch_count": [batch],
            "running_total": [total],
        }
    )


def running_tile_counts(
    stream: DataFrame, zoom: int = 4, ts: str = "warc_ts",
    lon: str = "lon", lat: str = "lat", watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-tile running
    totals across micro-batches. State is one counter per active tile —
    at 10^12 docs the state size is (active tiles), not rows."""
    src = stream.withWatermark(ts, watermark) if stream.isStreaming else stream
    tx, ty = TM.lonlat_to_tile(F.col(lon), F.col(lat), zoom)
    keyed = src.withColumn("tx", tx).withColumn("ty", ty)
    return keyed.groupBy("tx", "ty").applyInPandasWithState(
        _tile_state_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TYPE_STATE_SCHEMA = "n LONG, value_milli LONG"
_TYPE_OUT_SCHEMA = "event_type STRING, n_events LONG, value_milli LONG"


def _type_state_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-event-type totals. State = (count, integer milli-sum);
    integer accumulation keeps the running sum order-free across batches
    and cluster sizes."""
    n_batch = 0
    milli_batch = 0
    for p in pdfs:
        n_batch += len(p)
        milli_batch += int(p["value_milli"].sum()) if len(p) else 0
    n, milli = state.get if state.exists else (0, 0)
    n += n_batch
    milli += milli_batch
    state.update((n, milli))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "value_milli": [milli],
        }
    )


def running_type_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-event-type
    running (count, integer milli-quantized value sum) emitted every
    trigger the key receives data. State is one 2-long tuple per live
    key — at 10^12 docs the state size is (distinct keys), not rows."""
    keyed = stream.withColumn(
        "value_milli",
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _type_state_fn,
        outputStructType=_TYPE_OUT_SCHEMA,
        stateStructType=_TYPE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
