"""KML driver (OGC KML 2.2, public spec; reference
``ogr/ogrsf_frmts/kml/`` + ``libkml/``): Placemark point layers via the
stdlib XML toolchain — no libkml.

Layout per the spec: ``<kml xmlns="http://www.opengis.net/kml/2.2">`` →
``<Document>`` → ``<Placemark>`` with ``<name>``, ``<ExtendedData>``
``<Data name=...><value>...</value></Data>`` attribute payload and
``<Point><coordinates>lon,lat</coordinates></Point>`` geometry.
Coordinates are written with Python's shortest-roundtrip repr, so doubles
survive the text container BIT-EXACTLY (same contract as the GeoJSON
driver's Jackson decimals).

Spark mapping: the standard format-driver contract — one ``.kml`` document
per partition on write (``mapInPandas``), one task per file on read
(``binaryFile`` + executor-side ElementTree).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KML_NS = "http://www.opengis.net/kml/2.2"


def kml_document(rows: list[dict], x: str, y: str,
                 int_fields: list[str]) -> bytes:
    """Serialize one KML Document of Point Placemarks."""
    ET.register_namespace("", _KML_NS)
    kml = ET.Element(f"{{{_KML_NS}}}kml")
    doc = ET.SubElement(kml, f"{{{_KML_NS}}}Document")
    for r in rows:
        pm = ET.SubElement(doc, f"{{{_KML_NS}}}Placemark")
        ET.SubElement(pm, f"{{{_KML_NS}}}name").text = str(
            int(r[int_fields[0]]))
        ext = ET.SubElement(pm, f"{{{_KML_NS}}}ExtendedData")
        for c in int_fields:
            d = ET.SubElement(ext, f"{{{_KML_NS}}}Data", name=c)
            ET.SubElement(d, f"{{{_KML_NS}}}value").text = str(int(r[c]))
        pt = ET.SubElement(pm, f"{{{_KML_NS}}}Point")
        ET.SubElement(pt, f"{{{_KML_NS}}}coordinates").text = \
            f"{r[x]!r},{r[y]!r}"
    return ET.tostring(kml, encoding="utf-8", xml_declaration=True)


def parse_kml(buf: bytes, int_fields: list[str]) -> list[dict]:
    """Placemark rows back out of one KML document (namespace-aware)."""
    root = ET.fromstring(buf)
    out = []
    for pm in root.iter(f"{{{_KML_NS}}}Placemark"):
        rec: dict = {}
        for data in pm.iter(f"{{{_KML_NS}}}Data"):
            name = data.attrib["name"]
            if name in int_fields:
                rec[name] = int(data.find(f"{{{_KML_NS}}}value").text)
        coords = pm.find(
            f"{{{_KML_NS}}}Point/{{{_KML_NS}}}coordinates").text
        lon_s, lat_s = coords.strip().split(",")[:2]
        rec["x"], rec["y"] = float(lon_s), float(lat_s)
        out.append(rec)
    return out


def write_point_kmls(
    df: DataFrame, directory: str, x_col: str, y_col: str,
    int_fields: list[str], num_files: int,
) -> int:
    """Distributed KML sink: one document per partition."""
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
        doc = kml_document(rows, cols[0], cols[1], int_fields)
        final = f"{directory}/part-{pid:05d}.kml"
        with open(final, "wb") as fh:
            fh.write(doc)
        yield pd.DataFrame({"path": [final], "n_records": [len(rows)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def read_point_kmls(
    spark: SparkSession, directory: str, int_fields: list[str],
) -> DataFrame:
    """Distributed KML scan: one task per document."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.kml") \
        .select(F.col("content").alias("buf"))
    schema = ", ".join(
        [f"{c} long" for c in int_fields] + ["x double", "y double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                recs = parse_kml(bytes(buf), int_fields)
                yield pd.DataFrame(
                    recs, columns=int_fields + ["x", "y"])

    return files.mapInPandas(parse, schema)
