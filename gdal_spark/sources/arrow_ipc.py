"""Arrow IPC (Feather V2) driver — ``ogr/ogrsf_frmts/arrow/`` semantics
over the PUBLIC pyarrow API (the Arrow IPC file format is Arrow's own
published spec; the reference driver reads/writes the same container).

Spark mapping: identical file-level-parallel contract as the other format
drivers — one ``.arrow`` file per partition on write, one task per file on
read.  The payload is columnar Arrow record batches, so both directions
are zero-copy-ish: the writer hands pandas blocks to
``pyarrow.ipc.new_file`` and the reader maps ``binaryFile`` bytes through
``pyarrow.ipc.open_file(BufferReader)`` — no row loops anywhere.  All
types roundtrip bit-exactly (int64/float64 are stored as raw little-endian
buffers in the IPC body).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_arrow_files(
    df: DataFrame,
    directory: str,
    num_files: int,
    partition_key: str,
) -> int:
    """Distributed Arrow-IPC-file sink: one .arrow file per partition.
    Returns files written."""
    import pyarrow as pa

    os.makedirs(directory, exist_ok=True)
    cols = df.columns
    staged = df.repartition(num_files, F.col(partition_key))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = list(batches)
        pdf = pd.concat(parts, ignore_index=True) if parts else None
        final = f"{directory}/part-{pid:05d}.arrow"
        table = (pa.Table.from_pandas(pdf, preserve_index=False)
                 if pdf is not None else None)
        if table is None:
            yield pd.DataFrame({"path": [], "n_records": []})
            return
        table = table.select(cols).sort_by(partition_key)
        with pa.OSFile(final, "wb") as sink, \
                pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
        yield pd.DataFrame({"path": [final], "n_records": [table.num_rows]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def read_arrow_files(
    spark: SparkSession,
    directory: str,
    schema: str,
) -> DataFrame:
    """Distributed Arrow-IPC scan: binaryFile bytes → pyarrow BufferReader
    → pandas, one task per file.  ``schema`` is the Spark DDL of the
    stored columns."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.arrow") \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in batches:
            for buf in pdf["buf"]:
                reader = pa.ipc.open_file(pa.BufferReader(bytes(buf)))
                yield reader.read_all().to_pandas()

    return files.mapInPandas(parse, schema)
