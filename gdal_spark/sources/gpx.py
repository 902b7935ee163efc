"""GPX driver (Topografix GPX 1.1, public schema; reference
``ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp``): waypoint layers via the stdlib
XML toolchain — no expat glue.

Layout per the schema: ``<gpx xmlns="http://www.topografix.com/GPX/1/1"
version="1.1" creator=...>`` → ``<wpt lat=... lon=...>`` with ``<name>``
and an ``<extensions>`` block carrying the integer attribute payload
(the reference maps unknown fields into ``<extensions>`` the same way,
ogrgpxlayer.cpp WriteFeatureAttributes).  Coordinates are written with
Python's shortest-roundtrip repr so doubles survive the text container
BIT-EXACTLY (same contract as the KML/GeoJSON drivers).

Spark mapping: the standard format-driver contract — one ``.gpx``
document per partition on write (``mapInPandas``), one task per file on
read (``binaryFile`` + executor-side ElementTree).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GPX_NS = "http://www.topografix.com/GPX/1/1"


def gpx_document(rows: list[dict], x: str, y: str,
                 int_fields: list[str]) -> bytes:
    """Serialize one GPX document of waypoints."""
    ET.register_namespace("", _GPX_NS)
    gpx = ET.Element(f"{{{_GPX_NS}}}gpx",
                     version="1.1", creator="gdal_spark")
    for r in rows:
        wpt = ET.SubElement(gpx, f"{{{_GPX_NS}}}wpt",
                            lat=repr(r[y]), lon=repr(r[x]))
        ET.SubElement(wpt, f"{{{_GPX_NS}}}name").text = str(
            int(r[int_fields[0]]))
        ext = ET.SubElement(wpt, f"{{{_GPX_NS}}}extensions")
        for c in int_fields:
            ET.SubElement(ext, f"{{{_GPX_NS}}}{c}").text = str(int(r[c]))
    return ET.tostring(gpx, encoding="utf-8", xml_declaration=True)


def parse_gpx(buf: bytes, int_fields: list[str]) -> list[dict]:
    """Waypoint rows back out of one GPX document (namespace-aware)."""
    root = ET.fromstring(buf)
    out = []
    for wpt in root.iter(f"{{{_GPX_NS}}}wpt"):
        rec: dict = {}
        ext = wpt.find(f"{{{_GPX_NS}}}extensions")
        for c in int_fields:
            rec[c] = int(ext.find(f"{{{_GPX_NS}}}{c}").text)
        rec["x"] = float(wpt.attrib["lon"])
        rec["y"] = float(wpt.attrib["lat"])
        out.append(rec)
    return out


def write_point_gpx(
    df: DataFrame, directory: str, x_col: str, y_col: str,
    int_fields: list[str], num_files: int,
) -> int:
    """Distributed GPX sink: one document per partition."""
    os.makedirs(directory, exist_ok=True)
    cols = [x_col, y_col] + int_fields
    staged = df.select(*cols).repartition(num_files, F.col(int_fields[0]))

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = list(batches)
        pdf = pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(int_fields[0]) if len(pdf) else pdf
        rows = [
            dict(zip(cols, vals))
            for vals in pdf[cols].itertuples(index=False)
        ]
        doc = gpx_document(rows, cols[0], cols[1], int_fields)
        final = f"{directory}/part-{pid:05d}.gpx"
        with open(final, "wb") as fh:
            fh.write(doc)
        yield pd.DataFrame({"path": [final], "n_records": [len(rows)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def read_point_gpx(
    spark: SparkSession, directory: str, int_fields: list[str],
) -> DataFrame:
    """Distributed GPX scan: one task per document."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.gpx") \
        .select(F.col("content").alias("buf"))
    schema = ", ".join(
        [f"{c} long" for c in int_fields] + ["x double", "y double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                recs = parse_gpx(bytes(buf), int_fields)
                yield pd.DataFrame(
                    recs, columns=int_fields + ["x", "y"])

    return files.mapInPandas(parse, schema)
