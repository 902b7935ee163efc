"""ESRI Shapefile driver (.shp/.shx/.dbf), pure-numpy codec.

Format per the public ESRI Shapefile Technical Description (July 1998) and
the reference driver ``ogr/ogrsf_frmts/shape/`` (shpopen.c record layout,
dbfopen.c dBase III fields):

* ``.shp``: 100-byte header (file code 9994 BE, length in 16-bit words BE,
  version 1000 LE, shape type LE, bbox 8×double LE), then records of
  (record number BE 1-based, content length BE in words, content LE).
* ``.shx``: same header; per record (offset BE in words, content length BE).
* ``.dbf``: dBase III — version 0x03, YMD stamp, record count u32, header
  size u16, record size u16; 32-byte field descriptors (11-byte name,
  type, length, decimals), 0x0D terminator; fixed-width ASCII records
  with a leading deletion flag, 0x1A EOF.

Spark mapping — the shapefile is a single-file unit in the reference too,
so the distributed contract is one shapefile PER PARTITION on write
(map-only ``mapInPandas``, no shuffle) and one task PER FILE on read
(``binaryFile`` scan over ``*.shp`` + ``*.dbf`` joined on the path stem,
then a fully vectorized ``np.frombuffer`` parse).  A 100 TB shapefile
collection is many files; per-file task granularity is exactly how the
reference consumes it.

Numeric attributes that must survive the text-encoded .dbf bit-exactly are
carried as scaled integers (dec=0 ``N`` fields) — coordinates live in the
binary ``.shp`` doubles and roundtrip exactly.

Polygon records follow the spec's ring-orientation convention: outer rings
clockwise, holes counterclockwise (shpopen.c SHPRewindObject); the writer
enforces it, the reader returns rings in file order (outer first).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.spatial import geometry as G

SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5

# ---------------------------------------------------------------------------
# .shp / .shx encode
# ---------------------------------------------------------------------------


def _shp_header(shape_type: int, file_len_bytes: int,
                bbox: tuple[float, float, float, float]) -> bytes:
    return struct.pack(
        ">i5i i",  # file code, 5 unused, length (words)
        9994, 0, 0, 0, 0, 0, file_len_bytes // 2,
    ) + struct.pack(
        "<ii8d",
        1000, shape_type,
        bbox[0], bbox[1], bbox[2], bbox[3], 0.0, 0.0, 0.0, 0.0,
    )


def _ring_is_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])) < 0.0


def _orient(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    if _ring_is_cw(ring) == clockwise:
        return ring
    return ring[::-1].copy()


def encode_points_shp(x: np.ndarray, y: np.ndarray) -> tuple[bytes, bytes]:
    """Vectorized Point-layer encode → (.shp bytes, .shx bytes)."""
    n = x.shape[0]
    rec = np.zeros((n, 28), dtype=np.uint8)
    rec[:, 0:4] = (
        np.arange(1, n + 1, dtype=">i4").view(np.uint8).reshape(n, 4)
    )
    rec[:, 4:8] = np.frombuffer(struct.pack(">i", 10), dtype=np.uint8)
    rec[:, 8:12] = np.frombuffer(struct.pack("<i", SHAPE_POINT), np.uint8)
    rec[:, 12:20] = x.astype("<f8").view(np.uint8).reshape(n, 8)
    rec[:, 20:28] = y.astype("<f8").view(np.uint8).reshape(n, 8)
    body = rec.tobytes()
    bbox = (
        (float(x.min()), float(y.min()), float(x.max()), float(y.max()))
        if n else (0.0, 0.0, 0.0, 0.0)
    )
    shp = _shp_header(SHAPE_POINT, 100 + len(body), bbox) + body

    offs = (100 + 28 * np.arange(n, dtype=np.int64)) // 2
    shx_rec = np.zeros((n, 8), dtype=np.uint8)
    shx_rec[:, 0:4] = offs.astype(">i4").view(np.uint8).reshape(n, 4)
    shx_rec[:, 4:8] = np.frombuffer(struct.pack(">i", 10), np.uint8)
    shx = _shp_header(SHAPE_POINT, 100 + 8 * n, bbox) + shx_rec.tobytes()
    return shp, shx


def encode_polygons_shp(
    polys: list[list[np.ndarray]],
) -> tuple[bytes, bytes]:
    """Polygon-layer encode (one record per polygon; rings oriented to the
    spec: outer CW first, holes CCW)."""
    recs, shx_entries = [], []
    gxmin = gymin = np.inf
    gxmax = gymax = -np.inf
    off = 100
    for i, rings in enumerate(polys):
        oriented = [_orient(rings[0], clockwise=True)] + [
            _orient(r, clockwise=False) for r in rings[1:]
        ]
        pts = np.concatenate(oriented, axis=0)
        parts = np.cumsum([0] + [r.shape[0] for r in oriented[:-1]])
        xmin, ymin = pts.min(axis=0)
        xmax, ymax = pts.max(axis=0)
        gxmin, gymin = min(gxmin, xmin), min(gymin, ymin)
        gxmax, gymax = max(gxmax, xmax), max(gymax, ymax)
        content = struct.pack(
            "<i4dii", SHAPE_POLYGON, xmin, ymin, xmax, ymax,
            len(oriented), pts.shape[0],
        ) + parts.astype("<i4").tobytes() + pts.astype("<f8").tobytes()
        recs.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
        shx_entries.append(struct.pack(">ii", off // 2, len(content) // 2))
        off += 8 + len(content)
    body = b"".join(recs)
    bbox = (
        (float(gxmin), float(gymin), float(gxmax), float(gymax))
        if polys else (0.0, 0.0, 0.0, 0.0)
    )
    shp = _shp_header(SHAPE_POLYGON, 100 + len(body), bbox) + body
    shx = (
        _shp_header(SHAPE_POLYGON, 100 + 8 * len(polys), bbox)
        + b"".join(shx_entries)
    )
    return shp, shx


# ---------------------------------------------------------------------------
# .dbf encode / decode (dBase III subset: N integer-scaled + C text)
# ---------------------------------------------------------------------------


def encode_dbf(pdf: pd.DataFrame, fields: list[tuple[str, str, int]]) -> bytes:
    """``fields``: (name ≤10 chars, 'N'|'C', width). N fields carry int64
    (dec=0 — bit-exact); C fields are left-justified ASCII."""
    n = len(pdf)
    rec_size = 1 + sum(w for _, _, w in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = [struct.pack(
        "<B3BIHH20x", 0x03, 26, 1, 1, n, hdr_size, rec_size,
    )]
    for name, kind, width in fields:
        out.append(struct.pack(
            "<11sc4xBB14x", name.encode()[:11], kind.encode(), width, 0,
        ))
    out.append(b"\x0d")

    cols = []
    for name, kind, width in fields:
        if kind == "N":
            vals = pdf[name].astype(np.int64).map(
                lambda v, w=width: str(v).rjust(w).encode()
            )
        else:
            vals = pdf[name].astype(str).map(
                lambda v, w=width: v.encode()[:w].ljust(w)
            )
        cols.append(vals.to_numpy())
    flag = np.full(n, b" ", dtype="S1")
    rows = [b"".join((flag[i],) + tuple(c[i] for c in cols))
            for i in range(n)]
    out.append(b"".join(rows))
    out.append(b"\x1a")
    return b"".join(out)


def decode_dbf(buf: bytes) -> pd.DataFrame:
    """Vectorized dBase III decode: fixed-width slices via a (nrec, recsize)
    byte matrix; N fields cast straight to int64."""
    nrec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode()
        kind = chr(buf[off + 11])
        width = buf[off + 16]
        fields.append((name, kind, width))
        off += 32
    mat = np.frombuffer(
        buf, dtype=np.uint8, count=nrec * rec_size, offset=hdr_size,
    ).reshape(nrec, rec_size)
    data, pos = {}, 1
    for name, kind, width in fields:
        col = mat[:, pos:pos + width].copy().view(f"S{width}").ravel()
        if kind == "N":
            data[name] = col.astype(np.int64)
        else:
            data[name] = np.char.rstrip(col.astype("U"))
        pos += width
    return pd.DataFrame(data)


# ---------------------------------------------------------------------------
# .shp decode
# ---------------------------------------------------------------------------


def decode_points_shp(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Point decode: fixed 28-byte records from offset 100."""
    shape_type = struct.unpack_from("<i", buf, 32)[0]
    if shape_type != SHAPE_POINT:
        raise ValueError(f"not a Point shapefile (type {shape_type})")
    n = (len(buf) - 100) // 28
    rec = np.frombuffer(buf, np.uint8, count=n * 28, offset=100) \
        .reshape(n, 28)
    x = rec[:, 12:20].copy().view("<f8").ravel()
    y = rec[:, 20:28].copy().view("<f8").ravel()
    return x, y


def decode_polygons_shp(buf: bytes) -> list[list[np.ndarray]]:
    """Polygon decode: per-record parse (a record is one polygon; rings in
    file order, outer first)."""
    shape_type = struct.unpack_from("<i", buf, 32)[0]
    if shape_type != SHAPE_POLYGON:
        raise ValueError(f"not a Polygon shapefile (type {shape_type})")
    out, off = [], 100
    while off + 8 <= len(buf):
        content_words = struct.unpack_from(">i", buf, off + 4)[0]
        off += 8
        nparts, npts = struct.unpack_from("<ii", buf, off + 36)
        parts = np.frombuffer(buf, "<i4", count=nparts, offset=off + 44)
        pts = np.frombuffer(
            buf, "<f8", count=2 * npts, offset=off + 44 + 4 * nparts,
        ).reshape(npts, 2)
        bounds = np.append(parts, npts)
        out.append([
            pts[bounds[k]:bounds[k + 1]].copy() for k in range(nparts)
        ])
        off += 2 * content_words
    return out


# ---------------------------------------------------------------------------
# Spark sink / source
# ---------------------------------------------------------------------------


def write_point_shapefiles(
    df: DataFrame,
    directory: str,
    x_col: str,
    y_col: str,
    int_fields: list[tuple[str, int]],
    num_files: int,
    partition_key: str | None = None,
) -> int:
    """Distributed Point-layer sink: one shapefile per partition (map-only;
    ``repartition`` on the key hash is the only shuffle).  ``int_fields``
    are (column, dbf width) int64 attributes.  Returns files written."""
    os.makedirs(directory, exist_ok=True)
    key = partition_key or int_fields[0][0]
    cols = [x_col, y_col] + [c for c, _ in int_fields]
    staged = df.select(*cols).repartition(num_files, F.col(key))
    fields = [(c, "N", w) for c, w in int_fields]

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = list(batches)
        pdf = pd.concat(parts, ignore_index=True) if parts \
            else pd.DataFrame({c: pd.Series(dtype="float64") for c in cols})
        shp, shx = encode_points_shp(
            pdf[x_col].to_numpy(np.float64), pdf[y_col].to_numpy(np.float64),
        )
        dbf = encode_dbf(pdf, fields)
        stem = f"{directory}/part-{pid:05d}"
        for ext, payload in ((".shp", shp), (".shx", shx), (".dbf", dbf)):
            with open(stem + ext, "wb") as fh:
                fh.write(payload)
        yield pd.DataFrame({"path": [stem], "n_records": [len(pdf)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def _paired_files(spark: SparkSession, directory: str) -> DataFrame:
    """(.shp bytes, .dbf bytes) per path stem via two binaryFile scans."""
    shp = spark.read.format("binaryFile").load(f"{directory}/*.shp").select(
        F.regexp_replace("path", r"\.shp$", "").alias("stem"),
        F.col("content").alias("shp"),
    )
    dbf = spark.read.format("binaryFile").load(f"{directory}/*.dbf").select(
        F.regexp_replace("path", r"\.dbf$", "").alias("stem"),
        F.col("content").alias("dbf"),
    )
    return shp.join(dbf, "stem")


def read_point_shapefiles(
    spark: SparkSession,
    directory: str,
    int_fields: list[str],
) -> DataFrame:
    """Distributed Point-layer scan: one task per shapefile, vectorized
    record parse, attributes joined positionally from the .dbf (record i
    ↔ shape i, per the spec's implicit 1:1 ordering)."""
    paired = _paired_files(spark, directory)
    out_schema = ", ".join(
        [f"{c} long" for c in int_fields] + ["x double", "y double"]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shp_buf, dbf_buf in zip(pdf["shp"], pdf["dbf"]):
                x, y = decode_points_shp(bytes(shp_buf))
                attrs = decode_dbf(bytes(dbf_buf))
                out = attrs[int_fields].copy()
                out["x"], out["y"] = x, y
                yield out

    return paired.mapInPandas(parse, out_schema)


def write_polygon_shapefiles(
    df: DataFrame,
    directory: str,
    rings_col: str,
    int_fields: list[tuple[str, int]],
    num_files: int,
    partition_key: str | None = None,
) -> int:
    """Distributed Polygon-layer sink: one shapefile per partition
    (map-only after the key repartition — no driver collect; the
    single-file ``write_polygon_shapefile`` remains as the
    bounded-dimension-layer convenience).  Returns files written."""
    os.makedirs(directory, exist_ok=True)
    key = partition_key or int_fields[0][0]
    attr_cols = [c for c, _ in int_fields]
    cols = attr_cols + [rings_col]
    staged = df.select(*cols).repartition(num_files, F.col(key))
    fields = [(c, "N", w) for c, w in int_fields]

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in batches if len(p)]
        if not parts:
            yield pd.DataFrame({"path": pd.Series(dtype="object"),
                                "n_records": pd.Series(dtype="int64")})
            return
        pdf = pd.concat(parts, ignore_index=True)
        polys = [G.rings_to_numpy(rings) for rings in pdf[rings_col]]
        shp, shx = encode_polygons_shp(polys)
        dbf = encode_dbf(pdf[attr_cols], fields)
        stem = f"{directory}/part-{pid:05d}"
        for ext, payload in ((".shp", shp), (".shx", shx), (".dbf", dbf)):
            with open(stem + ext, "wb") as fh:
                fh.write(payload)
        yield pd.DataFrame({"path": [stem], "n_records": [len(pdf)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def write_polygon_shapefile(
    df: DataFrame,
    directory: str,
    rings_col: str,
    int_fields: list[tuple[str, int]],
) -> None:
    """Single-file Polygon sink (bounded dimension layers — the shapefile
    is a one-file unit; scale-out writes many files via the point path)."""
    os.makedirs(directory, exist_ok=True)
    cols = [c for c, _ in int_fields]
    rows = df.select(*cols, rings_col).collect()
    polys = [
        [np.asarray(r, dtype=np.float64) for r in row[rings_col]]
        for row in rows
    ]
    shp, shx = encode_polygons_shp(polys)
    pdf = pd.DataFrame({c: [row[c] for row in rows] for c in cols})
    dbf = encode_dbf(pdf, [(c, "N", w) for c, w in int_fields])
    for ext, payload in ((".shp", shp), (".shx", shx), (".dbf", dbf)):
        with open(f"{directory}/layer{ext}", "wb") as fh:
            fh.write(payload)


def read_polygon_shapefiles(
    spark: SparkSession,
    directory: str,
    int_fields: list[str],
) -> DataFrame:
    """Polygon scan: one task per file; rings land in the engine-native
    array<array<array<double>>> layout."""
    paired = _paired_files(spark, directory)
    out_schema = ", ".join(
        [f"{c} long" for c in int_fields]
        + ["rings array<array<array<double>>>"]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shp_buf, dbf_buf in zip(pdf["shp"], pdf["dbf"]):
                polys = decode_polygons_shp(bytes(shp_buf))
                attrs = decode_dbf(bytes(dbf_buf))
                out = attrs[int_fields].copy()
                out["rings"] = [
                    [ring.tolist() for ring in rings] for rings in polys
                ]
                yield out

    return paired.mapInPandas(parse, out_schema)
