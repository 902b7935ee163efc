"""MBTiles driver (public mapbox/mbtiles-spec 1.3; reference
``frmts/mbtiles/mbtilesdataset.cpp``): a SQLite tile pyramid —

* ``metadata(name, value)`` rows (name / format / bounds / minzoom /
  maxzoom),
* ``tiles(zoom_level, tile_column, tile_row, tile_data BLOB)`` with
  ``tile_row`` in TMS orientation (y flipped vs XYZ: row = 2^z − 1 − y) —
  the spec detail every consumer trips over, pinned by the gate.

Spark mapping: an .mbtiles is a single SQLite file; the writer here takes
the BOUNDED rendered-tile set (a pyramid's tile count is metadata-scale:
21 tiles for z0–2, ~5k for z0–6 — never the pixel data) through a driver-
side insert, exactly the bounded-collect contract of the GeoPackage
polygon sink; sharding one file per zoom via the same mapInPandas pattern
is the fact-scale variant (see gpkg.write_point_gpkgs).  The reader is
fully distributed: ``binaryFile`` bytes + executor-side
``sqlite3.deserialize`` per file.
"""

from __future__ import annotations

import os
import sqlite3
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mbtiles(
    tiles: list[tuple[int, int, int, bytes]],
    path: str,
    name: str = "gdal_spark",
    fmt: str = "png",
) -> None:
    """Write (zoom, x, y_XYZ, blob) tiles; rows stored TMS-flipped."""
    if os.path.exists(path):
        os.remove(path)
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE metadata (name TEXT, value TEXT);
        CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER,
                            tile_row INTEGER, tile_data BLOB);
        CREATE UNIQUE INDEX tile_index ON tiles
          (zoom_level, tile_column, tile_row);
        """
    )
    zooms = [z for z, _, _, _ in tiles]
    conn.executemany(
        "INSERT INTO metadata VALUES (?, ?)",
        [
            ("name", name), ("format", fmt), ("version", "1.3"),
            ("type", "baselayer"),
            ("bounds", "-180.0,-85.0511287798066,180.0,85.0511287798066"),
            ("minzoom", str(min(zooms))), ("maxzoom", str(max(zooms))),
        ],
    )
    conn.executemany(
        "INSERT INTO tiles VALUES (?, ?, ?, ?)",
        [(z, x, (1 << z) - 1 - y, sqlite3.Binary(blob))
         for z, x, y, blob in tiles],
    )
    conn.commit()
    conn.close()


def read_mbtiles(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan → (zoom, tx, ty [XYZ orientation], tile_data,
    fmt): one task per file, TMS→XYZ unflip applied on read."""
    files = spark.read.format("binaryFile").load(path) \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                conn = sqlite3.connect(":memory:")
                conn.deserialize(bytes(buf))
                fmt = conn.execute(
                    "SELECT value FROM metadata WHERE name = 'format'"
                ).fetchone()[0]
                rows = conn.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data "
                    "FROM tiles ORDER BY zoom_level, tile_column, tile_row"
                ).fetchall()
                conn.close()
                yield pd.DataFrame({
                    "zoom": np.asarray([r[0] for r in rows], dtype=np.int64),
                    "tx": np.asarray([r[1] for r in rows], dtype=np.int64),
                    "ty": np.asarray(
                        [(1 << r[0]) - 1 - r[2] for r in rows],
                        dtype=np.int64),
                    "tile_data": [bytes(r[3]) for r in rows],
                    "fmt": [fmt] * len(rows),
                })

    return files.mapInPandas(
        parse,
        "zoom long, tx long, ty long, tile_data binary, fmt string")
