"""OGC GeoPackage driver (SQLite + GPKG geometry blobs), stdlib sqlite3.

Format per the public OGC GeoPackage spec (12-128r19) and the reference
driver ``ogr/ogrsf_frmts/gpkg/`` (ogrgeopackagetablelayer.cpp feature I/O,
gpkg_geom blob layout in ogrgeopackageutility.cpp):

* SQLite database with the mandated metadata tables
  ``gpkg_spatial_ref_sys`` / ``gpkg_contents`` / ``gpkg_geometry_columns``
  and one table per feature layer (``fid INTEGER PRIMARY KEY`` + ``geom``
  BLOB + attribute columns).
* Geometry BLOB = GeoPackageBinaryHeader: magic ``GP``, version 0, flags
  byte (bit0 byte order of the header, bits 1-3 envelope indicator:
  1 → [minx, maxx, miny, maxy]), int32 srs_id, envelope doubles — followed
  by standard ISO WKB (decoded by the engine's own codec,
  spatial/geometry.parse_wkb).

Spark mapping — a GeoPackage is a single SQLite file (inherently one
writer), so the distributed contract mirrors the shapefile driver: one
.gpkg per partition on write, one task per file on read.  The reader never
touches the filesystem from Python: ``binaryFile`` ships the bytes and
``sqlite3.Connection.deserialize`` (Python ≥3.11) opens the database
directly from the in-memory buffer on the executor.
"""

from __future__ import annotations

import os
import sqlite3
import struct
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.spatial import geometry as G

_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    (
        "WGS 84 geodetic", 4326, "EPSG", 4326,
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
        "longitude/latitude on WGS 84",
    ),
]


def gpkg_geom_blob(wkb: bytes, srs_id: int = 4326,
                   envelope: tuple[float, float, float, float] | None = None,
                   ) -> bytes:
    """GeoPackageBinaryHeader + WKB. flags: little-endian header (bit0=1),
    envelope indicator 1 (xy) when an envelope is supplied."""
    flags = 0x01 | (0x02 if envelope is not None else 0x00)
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
    if envelope is not None:
        xmin, ymin, xmax, ymax = envelope
        head += struct.pack("<4d", xmin, xmax, ymin, ymax)
    return head + wkb


def parse_gpkg_blob(blob: bytes):
    """→ (srs_id, envelope | None, wkb bytes)."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    big = not (flags & 0x01)
    srs_id = struct.unpack_from(">i" if big else "<i", blob, 4)[0]
    env_ind = (flags >> 1) & 0x07
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}[env_ind]
    env = None
    if n_env:
        vals = struct.unpack_from(
            (">" if big else "<") + f"{n_env}d", blob, 8)
        if env_ind >= 1:
            env = (vals[0], vals[2], vals[1], vals[3])  # → xmin,ymin,xmax,ymax
    return srs_id, env, blob[8 + 8 * n_env:]


def _create_gpkg(path: str, table: str, geometry_type: str,
                 attr_cols: list[tuple[str, str]]) -> sqlite3.Connection:
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        PRAGMA application_id = 0x47504B47;  -- 'GPKG'
        PRAGMA user_version = 10300;
        CREATE TABLE gpkg_spatial_ref_sys (
          srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
          organization TEXT NOT NULL, organization_coordsys_id INTEGER,
          definition TEXT NOT NULL, description TEXT);
        CREATE TABLE gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT UNIQUE, description TEXT DEFAULT '',
          last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
          max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT NOT NULL, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL,
          PRIMARY KEY (table_name, column_name));
        """
    )
    conn.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)", _SRS_ROWS)
    cols = ", ".join(f'"{c}" {t}' for c, t in attr_cols)
    conn.execute(
        f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, '
        f"geom BLOB{', ' + cols if cols else ''})"
    )
    conn.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
        "last_change, srs_id) VALUES (?, 'features', ?, "
        "'2026-01-01T00:00:00.000Z', 4326)", (table, table))
    conn.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, 4326, 0, 0)",
        (table, geometry_type))
    return conn


def write_polygon_gpkg(
    df: DataFrame,
    path: str,
    table: str = "layer",
    rings_col: str = "rings",
    int_fields: list[str] | None = None,
) -> None:
    """Single-file Polygon sink (bounded dimension layers).  Geometry blobs
    carry the xy envelope so a reader can prune before WKB decode."""
    int_fields = int_fields or []
    rows = df.select(*int_fields, rings_col).collect()
    if os.path.exists(path):
        os.remove(path)
    conn = _create_gpkg(
        path, table, "POLYGON", [(c, "INTEGER") for c in int_fields])
    ins = (
        f'INSERT INTO "{table}" (geom{"".join(", " + c for c in int_fields)})'
        f' VALUES (?{", ?" * len(int_fields)})'
    )
    for row in rows:
        rings = [np.asarray(r, dtype=np.float64) for r in row[rings_col]]
        env = G.rings_envelope(rings)
        blob = gpkg_geom_blob(G.wkb_polygon(rings), envelope=env)
        conn.execute(ins, (blob, *[int(row[c]) for c in int_fields]))
    conn.commit()
    conn.close()


def write_polygon_gpkgs(
    df: DataFrame,
    directory: str,
    rings_col: str = "rings",
    int_fields: list[str] | None = None,
    num_files: int = 4,
    table: str = "layer",
    partition_key: str | None = None,
) -> int:
    """Distributed Polygon-layer sink: one .gpkg per partition (map-only
    after the key repartition — no driver collect; the single-file
    ``write_polygon_gpkg`` remains as the bounded-dimension-layer
    convenience).  Geometry blobs carry the xy envelope so readers can
    prune before WKB decode.  Returns files written."""
    int_fields = int_fields or []
    os.makedirs(directory, exist_ok=True)
    key = partition_key or int_fields[0]
    cols = int_fields + [rings_col]
    staged = df.select(*cols).repartition(num_files, F.col(key))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in batches if len(p)]
        if not parts:
            yield pd.DataFrame({"path": pd.Series(dtype="object"),
                                "n_records": pd.Series(dtype="int64")})
            return
        pdf = pd.concat(parts, ignore_index=True)
        tmp = tempfile.mktemp(suffix=".gpkg")
        conn = _create_gpkg(
            tmp, table, "POLYGON", [(c, "INTEGER") for c in int_fields])
        ins = (
            f'INSERT INTO "{table}" '
            f'(geom{"".join(", " + c for c in int_fields)})'
            f' VALUES (?{", ?" * len(int_fields)})'
        )
        recs = []
        for row in pdf.itertuples(index=False):
            rings = G.rings_to_numpy(getattr(row, rings_col))
            env = G.rings_envelope(rings)
            blob = gpkg_geom_blob(G.wkb_polygon(rings), envelope=env)
            recs.append(
                (blob, *[int(getattr(row, c)) for c in int_fields]))
        conn.executemany(ins, recs)
        conn.commit()
        conn.close()
        final = f"{directory}/part-{pid:05d}.gpkg"
        os.replace(tmp, final)
        yield pd.DataFrame({"path": [final], "n_records": [len(pdf)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def write_point_gpkgs(
    df: DataFrame,
    directory: str,
    x_col: str,
    y_col: str,
    int_fields: list[str],
    num_files: int,
    table: str = "layer",
    partition_key: str | None = None,
) -> int:
    """Distributed Point-layer sink: one .gpkg per partition (map-only
    after the repartition), built in a per-task temp file and moved into
    place.  Returns files written."""
    os.makedirs(directory, exist_ok=True)
    key = partition_key or int_fields[0]
    cols = [x_col, y_col] + int_fields
    staged = df.select(*cols).repartition(num_files, F.col(key))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = list(batches)
        pdf = pd.concat(parts, ignore_index=True) if parts \
            else pd.DataFrame({c: pd.Series(dtype="float64") for c in cols})
        tmp = tempfile.mktemp(suffix=".gpkg")
        conn = _create_gpkg(
            tmp, table, "POINT", [(c, "INTEGER") for c in int_fields])
        ins = (
            f'INSERT INTO "{table}" '
            f'(geom{"".join(", " + c for c in int_fields)})'
            f' VALUES (?{", ?" * len(int_fields)})'
        )
        conn.executemany(ins, [
            (gpkg_geom_blob(G.wkb_point(float(x), float(y))),
             *[int(v) for v in rest])
            for x, y, *rest in pdf[cols].itertuples(index=False)
        ])
        conn.commit()
        conn.close()
        final = f"{directory}/part-{pid:05d}.gpkg"
        os.replace(tmp, final)
        yield pd.DataFrame({"path": [final], "n_records": [len(pdf)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def _read_gpkg_bytes(buf: bytes, table: str, columns: list[str]):
    """Open a GeoPackage from raw bytes (sqlite3 deserialize — no temp
    file) and pull (geom blob, *columns) rows."""
    conn = sqlite3.connect(":memory:")
    conn.deserialize(buf)
    sel = ", ".join(['geom'] + [f'"{c}"' for c in columns])
    rows = conn.execute(
        f'SELECT {sel} FROM "{table}" ORDER BY fid').fetchall()
    conn.close()
    return rows


def read_point_gpkgs(
    spark: SparkSession,
    directory: str,
    int_fields: list[str],
    table: str = "layer",
) -> DataFrame:
    """Distributed Point scan: binaryFile bytes → executor-side sqlite3
    deserialize → GPKG blob parse → engine WKB decode."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.gpkg") \
        .select(F.col("content").alias("buf"))
    out_schema = ", ".join(
        [f"{c} long" for c in int_fields] + ["x double", "y double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                rows = _read_gpkg_bytes(bytes(buf), table, int_fields)
                recs = []
                for geom, *attrs in rows:
                    _, _, wkb = parse_gpkg_blob(geom)
                    kind, coords = G.parse_wkb(wkb)
                    recs.append(
                        dict(zip(int_fields, attrs),
                             x=float(coords[0]), y=float(coords[1]))
                    )
                yield pd.DataFrame(
                    recs, columns=int_fields + ["x", "y"])

    return files.mapInPandas(parse, out_schema)


def read_polygon_gpkg(
    spark: SparkSession,
    path: str,
    int_fields: list[str],
    table: str = "layer",
) -> DataFrame:
    """Polygon scan of one .gpkg (one task; rings in engine layout, blob
    envelope surfaced so downstream filters can prune pre-decode)."""
    files = spark.read.format("binaryFile").load(path) \
        .select(F.col("content").alias("buf"))
    out_schema = ", ".join(
        [f"{c} long" for c in int_fields]
        + ["xmin double", "ymin double", "xmax double", "ymax double",
           "rings array<array<array<double>>>"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                rows = _read_gpkg_bytes(bytes(buf), table, int_fields)
                recs = []
                for geom, *attrs in rows:
                    _, env, wkb = parse_gpkg_blob(geom)
                    kind, rings = G.parse_wkb(wkb)
                    recs.append(dict(
                        zip(int_fields, attrs),
                        xmin=env[0], ymin=env[1], xmax=env[2], ymax=env[3],
                        rings=[r.tolist() for r in rings],
                    ))
                yield pd.DataFrame(
                    recs,
                    columns=int_fields
                    + ["xmin", "ymin", "xmax", "ymax", "rings"])

    return files.mapInPandas(parse, out_schema)
