"""SpatiaLite (SQLite) vector driver, stdlib sqlite3.

Format per the public SpatiaLite BLOB-Geometry specification and the
reference driver ``ogr/ogrsf_frmts/sqlite/`` (ogrsqlitelayer.cpp
ImportSpatiaLiteGeometry / ExportSpatiaLiteGeometry):

* SQLite database with SpatiaLite 4.x metadata tables
  ``spatial_ref_sys`` / ``geometry_columns`` and one table per layer.
* Geometry BLOB layout (unlike GPKG, NOT a header + ISO-WKB — the body
  shares ONE endianness flag and carries no per-geometry byte order)::

      00            start marker
      01            endian flag (01 = little-endian, the only one we emit)
      int32         SRID
      4 × double    MBR  [minx, miny, maxx, maxy]
      7C            MBR end marker
      uint32        geometry class (1=POINT, 2=LINESTRING, 3=POLYGON, ...)
      ...           class-dependent coordinate body (no endian bytes)
      FE            end marker

  POINT body = x, y doubles.  POLYGON body = uint32 n_rings, then per
  ring uint32 n_points + x/y doubles.

Spark mapping mirrors the GeoPackage driver (a SQLite file is inherently
one writer): one .sqlite per partition on write (map-only after the key
repartition — no driver collect), one task per file on read with the
bytes shipped via ``binaryFile`` and opened executor-side through
``sqlite3.Connection.deserialize`` — the reader never touches the
filesystem from Python.
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

_START, _MBR_END, _END = 0x00, 0x7C, 0xFE
_PT, _LINE, _POLY = 1, 2, 3


# ---------------------------------------------------------------------------
# BLOB codec
# ---------------------------------------------------------------------------

def point_blob(x: float, y: float, srid: int = 4326) -> bytes:
    """SpatiaLite BLOB for a 2D point (MBR degenerates to the point)."""
    return (
        bytes((_START, 0x01))
        + struct.pack("<i", srid)
        + struct.pack("<4d", x, y, x, y)
        + bytes((_MBR_END,))
        + struct.pack("<I2d", _PT, x, y)
        + bytes((_END,))
    )


def polygon_blob(rings: list[np.ndarray], srid: int = 4326) -> bytes:
    """SpatiaLite BLOB for a polygon (list of (n,2) float64 ring arrays)."""
    minx, miny, maxx, maxy = G.rings_envelope(rings)
    body = [struct.pack("<2I", _POLY, len(rings))]
    for r in rings:
        r = np.asarray(r, dtype="<f8")
        body.append(struct.pack("<I", len(r)))
        body.append(r.tobytes())
    return (
        bytes((_START, 0x01))
        + struct.pack("<i", srid)
        + struct.pack("<4d", minx, miny, maxx, maxy)
        + bytes((_MBR_END,))
        + b"".join(body)
        + bytes((_END,))
    )


def parse_blob(blob: bytes):
    """Decode a SpatiaLite geometry BLOB.

    Returns ``(srid, (minx, miny, maxx, maxy), kind, payload)`` where
    payload is ``(x, y)`` for POINT and a list of (n,2) float64 arrays
    for POLYGON.  Both endianness flags are honoured on read (the
    reference reader accepts either; we only ever WRITE little-endian).
    """
    if len(blob) < 45 or blob[0] != _START or blob[-1] != _END:
        raise ValueError("not a SpatiaLite geometry BLOB")
    bo = "<" if blob[1] == 0x01 else ">"
    srid = struct.unpack_from(f"{bo}i", blob, 2)[0]
    env = struct.unpack_from(f"{bo}4d", blob, 6)
    if blob[38] != _MBR_END:
        raise ValueError("missing MBR end marker")
    kind = struct.unpack_from(f"{bo}I", blob, 39)[0]
    off = 43
    if kind == _PT:
        x, y = struct.unpack_from(f"{bo}2d", blob, off)
        return srid, env, "point", (x, y)
    if kind == _POLY:
        (n_rings,) = struct.unpack_from(f"{bo}I", blob, off)
        off += 4
        rings = []
        for _ in range(n_rings):
            (n_pts,) = struct.unpack_from(f"{bo}I", blob, off)
            off += 4
            r = np.frombuffer(blob, dtype=f"{bo}f8",
                              count=2 * n_pts, offset=off)
            rings.append(r.reshape(n_pts, 2).astype(np.float64))
            off += 16 * n_pts
        return srid, env, "polygon", rings
    raise ValueError(f"unsupported SpatiaLite geometry class {kind}")


# ---------------------------------------------------------------------------
# database scaffolding (SpatiaLite 4.x metadata layout)
# ---------------------------------------------------------------------------

def _create_db(path: str, table: str, geom_type: int,
               attr_cols: list[tuple[str, str]]) -> sqlite3.Connection:
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE spatial_ref_sys (
          srid INTEGER NOT NULL PRIMARY KEY, auth_name TEXT NOT NULL,
          auth_srid INTEGER NOT NULL, ref_sys_name TEXT NOT NULL,
          proj4text TEXT NOT NULL, srtext TEXT);
        CREATE TABLE geometry_columns (
          f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL,
          geometry_type INTEGER NOT NULL, coord_dimension INTEGER NOT NULL,
          srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL,
          PRIMARY KEY (f_table_name, f_geometry_column));
        """
    )
    conn.execute(
        "INSERT INTO spatial_ref_sys VALUES (4326, 'epsg', 4326, "
        "'WGS 84', '+proj=longlat +datum=WGS84 +no_defs', NULL)")
    cols = ", ".join(f'"{c}" {t}' for c, t in attr_cols)
    conn.execute(
        f'CREATE TABLE "{table}" (pk INTEGER PRIMARY KEY, '
        f"geometry BLOB{', ' + cols if cols else ''})"
    )
    conn.execute(
        "INSERT INTO geometry_columns VALUES (?, 'geometry', ?, 2, 4326, 0)",
        (table, geom_type))
    return conn


# ---------------------------------------------------------------------------
# distributed sinks (one .sqlite per partition — no driver collect)
# ---------------------------------------------------------------------------

def write_point_sqlites(
    df: DataFrame,
    directory: str,
    x_col: str,
    y_col: str,
    int_fields: list[str],
    num_files: int,
    table: str = "layer",
    partition_key: str | None = None,
) -> int:
    """Distributed Point-layer sink: one .sqlite per partition (map-only
    after the key repartition), built in a per-task temp file and moved
    into place.  Returns files written."""
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
        tmp = tempfile.mktemp(suffix=".sqlite")
        conn = _create_db(
            tmp, table, _PT, [(c, "INTEGER") for c in int_fields])
        ins = (
            f'INSERT INTO "{table}" '
            f'(geometry{"".join(", " + c for c in int_fields)})'
            f' VALUES (?{", ?" * len(int_fields)})'
        )
        conn.executemany(ins, [
            (point_blob(float(x), float(y)), *[int(v) for v in rest])
            for x, y, *rest in pdf[cols].itertuples(index=False)
        ])
        conn.commit()
        conn.close()
        final = f"{directory}/part-{pid:05d}.sqlite"
        os.replace(tmp, final)
        yield pd.DataFrame({"path": [final], "n_records": [len(pdf)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def write_polygon_sqlites(
    df: DataFrame,
    directory: str,
    rings_col: str = "rings",
    int_fields: list[str] | None = None,
    num_files: int = 4,
    table: str = "layer",
    partition_key: str | None = None,
) -> int:
    """Distributed Polygon-layer sink: one .sqlite per partition.
    Geometry BLOBs carry the MBR so a reader can prune before the body
    decode (same contract as the GPKG envelope header)."""
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
        tmp = tempfile.mktemp(suffix=".sqlite")
        conn = _create_db(
            tmp, table, _POLY, [(c, "INTEGER") for c in int_fields])
        ins = (
            f'INSERT INTO "{table}" '
            f'(geometry{"".join(", " + c for c in int_fields)})'
            f' VALUES (?{", ?" * len(int_fields)})'
        )
        recs = []
        for row in pdf.itertuples(index=False):
            rings = G.rings_to_numpy(getattr(row, rings_col))
            recs.append((polygon_blob(rings),
                         *[int(getattr(row, c)) for c in int_fields]))
        conn.executemany(ins, recs)
        conn.commit()
        conn.close()
        final = f"{directory}/part-{pid:05d}.sqlite"
        os.replace(tmp, final)
        yield pd.DataFrame({"path": [final], "n_records": [len(pdf)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


# ---------------------------------------------------------------------------
# distributed scans (binaryFile bytes → sqlite3.deserialize per task)
# ---------------------------------------------------------------------------

def _rows_from_bytes(buf: bytes, table: str, columns: list[str]):
    conn = sqlite3.connect(":memory:")
    conn.deserialize(buf)
    sel = ", ".join(["geometry"] + [f'"{c}"' for c in columns])
    rows = conn.execute(
        f'SELECT {sel} FROM "{table}" ORDER BY pk').fetchall()
    conn.close()
    return rows


def read_point_sqlites(
    spark: SparkSession,
    directory: str,
    int_fields: list[str],
    table: str = "layer",
) -> DataFrame:
    """Distributed Point scan: binaryFile bytes → executor-side sqlite3
    deserialize → SpatiaLite BLOB decode."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.sqlite") \
        .select(F.col("content").alias("buf"))
    out_schema = ", ".join(
        [f"{c} long" for c in int_fields] + ["x double", "y double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                recs = []
                for geom, *attrs in _rows_from_bytes(
                        bytes(buf), table, int_fields):
                    _, _, _, (x, y) = parse_blob(geom)
                    recs.append(dict(zip(int_fields, attrs), x=x, y=y))
                yield pd.DataFrame(recs, columns=int_fields + ["x", "y"])

    return files.mapInPandas(parse, out_schema)


def read_polygon_sqlites(
    spark: SparkSession,
    directory: str,
    int_fields: list[str],
    table: str = "layer",
) -> DataFrame:
    """Polygon scan (one task per file; BLOB MBR surfaced pre-decode so
    downstream filters can prune before touching ring payloads)."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.sqlite") \
        .select(F.col("content").alias("buf"))
    out_schema = ", ".join(
        [f"{c} long" for c in int_fields]
        + ["xmin double", "ymin double", "xmax double", "ymax double",
           "rings array<array<array<double>>>"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                recs = []
                for geom, *attrs in _rows_from_bytes(
                        bytes(buf), table, int_fields):
                    _, env, _, rings = parse_blob(geom)
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
