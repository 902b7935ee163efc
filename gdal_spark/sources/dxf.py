"""DXF driver — from-scratch codec of the PUBLIC Autodesk DXF ASCII
grammar (group-code/value pair stream; the reference's reader is
``ogr/ogrsf_frmts/dxf/``).  NOT a port: the reference implements the full
entity zoo + blocks/styles; this driver implements the high-traffic
geometry subset — POINT and LWPOLYLINE — over the minimal R2000 skeleton
(HEADER with $ACADVER, ENTITIES, EOF) that every CAD tool emits.

Grammar: the file is a flat sequence of ``<group code>\\n<value>\\n``
pairs.  Sections open with ``0/SECTION 2/<name>`` and close with
``0/ENDSEC``.  Entities used here:

* ``POINT``:       8 layer, 10 x, 20 y
* ``LWPOLYLINE``:  8 layer, 90 n_vertices, 70 flags (1 = closed),
                   then n repeats of 10 x / 20 y

Doubles are written as shortest-roundtrip ``repr`` so coordinates survive
the text container bit-exactly (the same contract as the GeoJSON/KML/XYZ
drivers).

Spark mapping — the repo's standard vector-driver contract: one ``.dxf``
shard per partition on write (map-only after an optional key
repartition), ``binaryFile`` one task per shard on read with a vectorized
pair-stream scan.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PRELUDE = [
    "0", "SECTION", "2", "HEADER",
    "9", "$ACADVER", "1", "AC1015",
    "0", "ENDSEC",
    "0", "SECTION", "2", "ENTITIES",
]
_EPILOGUE = ["0", "ENDSEC", "0", "EOF"]


def _fmt(v: float) -> str:
    return repr(float(v))


def dxf_bytes(points: list[tuple[str, float, float]] | None = None,
              polylines: list[tuple[str, list[tuple[float, float]], bool]]
              | None = None) -> bytes:
    """Serialize one DXF document from (layer, x, y) points and
    (layer, vertices, closed) polylines."""
    out = list(_PRELUDE)
    for layer, x, y in points or []:
        out += ["0", "POINT", "8", str(layer),
                "10", _fmt(x), "20", _fmt(y)]
    for layer, verts, closed in polylines or []:
        out += ["0", "LWPOLYLINE", "8", str(layer),
                "90", str(len(verts)), "70", "1" if closed else "0"]
        for x, y in verts:
            out += ["10", _fmt(x), "20", _fmt(y)]
    out += _EPILOGUE
    return ("\n".join(out) + "\n").encode("ascii")


def parse_dxf(buf: bytes) -> tuple[list, list]:
    """→ (points, polylines) in the ``dxf_bytes`` shapes.  A tolerant
    pair-stream scan: unknown entities/sections are skipped (the
    reference's reader does the same for unsupported entities)."""
    lines = buf.decode("ascii", errors="replace").splitlines()
    pairs = [(lines[i].strip(), lines[i + 1].strip())
             for i in range(0, len(lines) - 1, 2)]
    points: list = []
    polylines: list = []
    i = 0
    n = len(pairs)
    while i < n:
        code, val = pairs[i]
        if code == "0" and val == "POINT":
            layer, x, y = "0", 0.0, 0.0
            i += 1
            while i < n and pairs[i][0] != "0":
                c, v = pairs[i]
                if c == "8":
                    layer = v
                elif c == "10":
                    x = float(v)
                elif c == "20":
                    y = float(v)
                i += 1
            points.append((layer, x, y))
        elif code == "0" and val == "LWPOLYLINE":
            layer, closed = "0", False
            verts: list = []
            cur_x = None
            i += 1
            while i < n and pairs[i][0] != "0":
                c, v = pairs[i]
                if c == "8":
                    layer = v
                elif c == "70":
                    closed = bool(int(v) & 1)
                elif c == "10":
                    cur_x = float(v)
                elif c == "20":
                    verts.append((cur_x, float(v)))
                i += 1
            polylines.append((layer, verts, closed))
        else:
            i += 1
    return points, polylines


def write_point_dxfs(
    df: DataFrame, directory: str,
    layer_col: str, lon: str = "lon", lat: str = "lat",
    num_files: int = 4,
) -> int:
    """Distributed POINT-layer sink: one .dxf per partition, map-only
    after the key repartition (no driver collect).  The layer name (group
    code 8) carries the feature key — DXF's native attribute channel."""
    os.makedirs(directory, exist_ok=True)
    staged = df.select(layer_col, lon, lat).repartition(
        num_files, F.col(layer_col))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in batches if len(p)]
        if not parts:
            yield pd.DataFrame({"path": pd.Series(dtype="object"),
                                "n_records": pd.Series(dtype="int64")})
            return
        pdf = pd.concat(parts, ignore_index=True)
        pts = [(str(k), float(x), float(y)) for k, x, y in zip(
            pdf[layer_col], pdf[lon], pdf[lat])]
        tmp = tempfile.mktemp(suffix=".dxf")
        with open(tmp, "wb") as fh:
            fh.write(dxf_bytes(points=pts))
        final = f"{directory}/part-{pid:05d}.dxf"
        os.replace(tmp, final)
        yield pd.DataFrame({"path": [final], "n_records": [len(pts)]})

    return int(
        staged.mapInPandas(write_part, "path string, n_records long")
        .agg(F.count(F.lit(1))).collect()[0][0]
    )


def read_point_dxfs(spark: SparkSession, directory: str) -> DataFrame:
    """Distributed POINT scan → (layer, lon, lat), one task per shard."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.dxf") \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                pts, _ = parse_dxf(bytes(buf))
                yield pd.DataFrame({
                    "layer": [p[0] for p in pts],
                    "lon": [p[1] for p in pts],
                    "lat": [p[2] for p in pts],
                })

    return files.mapInPandas(parse, "layer string, lon double, lat double")


def write_polyline_dxfs(
    df: DataFrame, directory: str,
    layer_col: str, xs: str = "xs", ys: str = "ys",
    closed: bool = True, num_files: int = 2,
) -> int:
    """Distributed LWPOLYLINE sink over (layer, xs:array, ys:array)."""
    os.makedirs(directory, exist_ok=True)
    staged = df.select(layer_col, xs, ys).repartition(
        num_files, F.col(layer_col))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in batches if len(p)]
        if not parts:
            yield pd.DataFrame({"path": pd.Series(dtype="object"),
                                "n_records": pd.Series(dtype="int64")})
            return
        pdf = pd.concat(parts, ignore_index=True)
        pls = [
            (str(k), list(zip([float(v) for v in vx],
                              [float(v) for v in vy])), closed)
            for k, vx, vy in zip(pdf[layer_col], pdf[xs], pdf[ys])
        ]
        tmp = tempfile.mktemp(suffix=".dxf")
        with open(tmp, "wb") as fh:
            fh.write(dxf_bytes(polylines=pls))
        final = f"{directory}/part-{pid:05d}.dxf"
        os.replace(tmp, final)
        yield pd.DataFrame({"path": [final], "n_records": [len(pls)]})

    return int(
        staged.mapInPandas(write_part, "path string, n_records long")
        .agg(F.count(F.lit(1))).collect()[0][0]
    )


def read_polyline_dxfs(spark: SparkSession, directory: str) -> DataFrame:
    """Distributed LWPOLYLINE scan → (layer, xs, ys, closed)."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.dxf") \
        .select(F.col("content").alias("buf"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                _, pls = parse_dxf(bytes(buf))
                yield pd.DataFrame({
                    "layer": [p[0] for p in pls],
                    "xs": [[v[0] for v in p[1]] for p in pls],
                    "ys": [[v[1] for v in p[1]] for p in pls],
                    "closed": [bool(p[2]) for p in pls],
                })

    return files.mapInPandas(
        parse, "layer string, xs array<double>, ys array<double>,"
        " closed boolean")
