"""GML driver (OGC GML 3.2 Simple Features, public spec; reference
``ogr/ogrsf_frmts/gml/`` — GMLReader/OGRGMLDataSource semantics, no Xerces
or Expat code).

Layout follows OGR's own GML writer: an ``ogr:FeatureCollection`` root,
one ``ogr:featureMember`` per feature wrapping a layer-named element with
the attribute children and a ``ogr:geometryProperty`` carrying a
``gml:Point``.

GML 3.2 AXIS ORDER: with an ``urn:ogc:def:crs:EPSG::4326`` srsName the
spec (and OGR — see ``ogr/ogrsf_frmts/gml/ogrgmllayer.cpp``'s
bInvertAxisOrderIfLatLong / the GML_INVERT_AXIS_ORDER_IF_LAT_LONG config)
mandates LATITUDE-FIRST coordinates in ``<gml:pos>``.  This driver writes
the urn form, emits ``pos`` as "lat lon", and swaps back to (x=lon, y=lat)
on read — the famous GML3 axis-order behavior, exercised by the gate
because any missing swap flips every coordinate pair.

Coordinates are written with Python's shortest-roundtrip repr, so doubles
survive the text container BIT-EXACTLY (the same contract as the GeoJSON /
KML drivers).

Spark mapping: the standard format-driver contract — one ``.gml`` document
per partition on write (``mapInPandas``), one task per file on read
(``binaryFile`` + executor-side ElementTree).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GML_NS = "http://www.opengis.net/gml/3.2"
_OGR_NS = "http://ogr.maptools.org/"
_SRS_URN = "urn:ogc:def:crs:EPSG::4326"


def gml_document(rows: list[dict], x: str, y: str,
                 int_fields: list[str], layer: str = "layer") -> bytes:
    """Serialize one GML 3.2 FeatureCollection of Point features
    (lat-first ``gml:pos`` per the urn axis order)."""
    ET.register_namespace("gml", _GML_NS)
    ET.register_namespace("ogr", _OGR_NS)
    fc = ET.Element(f"{{{_OGR_NS}}}FeatureCollection")
    for n, r in enumerate(rows):
        fm = ET.SubElement(fc, f"{{{_OGR_NS}}}featureMember")
        ft = ET.SubElement(fm, f"{{{_OGR_NS}}}{layer}")
        ft.set(f"{{{_GML_NS}}}id", f"{layer}.{n}")
        gp = ET.SubElement(ft, f"{{{_OGR_NS}}}geometryProperty")
        pt = ET.SubElement(gp, f"{{{_GML_NS}}}Point", srsName=_SRS_URN)
        pt.set(f"{{{_GML_NS}}}id", f"{layer}.geom.{n}")
        # urn:...EPSG::4326 => latitude first
        ET.SubElement(pt, f"{{{_GML_NS}}}pos").text = f"{r[y]!r} {r[x]!r}"
        for c in int_fields:
            ET.SubElement(ft, f"{{{_OGR_NS}}}{c}").text = str(int(r[c]))
    return ET.tostring(fc, encoding="utf-8", xml_declaration=True)


def parse_gml(buf: bytes, int_fields: list[str]) -> list[dict]:
    """Feature rows back out of one GML document; undoes the urn
    lat-first axis order so callers always see (x=lon, y=lat)."""
    root = ET.fromstring(buf)
    out = []
    for fm in root.iter(f"{{{_OGR_NS}}}featureMember"):
        feat = fm[0]
        rec: dict = {}
        for c in int_fields:
            el = feat.find(f"{{{_OGR_NS}}}{c}")
            rec[c] = int(el.text)
        pt = feat.find(
            f"{{{_OGR_NS}}}geometryProperty/{{{_GML_NS}}}Point")
        lat_first = (pt.get("srsName") or "").startswith("urn:")
        a_s, b_s = pt.find(f"{{{_GML_NS}}}pos").text.strip().split()[:2]
        a, b = float(a_s), float(b_s)
        rec["x"], rec["y"] = (b, a) if lat_first else (a, b)
        out.append(rec)
    return out


def write_point_gmls(
    df: DataFrame, directory: str, x_col: str, y_col: str,
    int_fields: list[str], num_files: int,
) -> int:
    """Distributed GML sink: one FeatureCollection per partition."""
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
        doc = gml_document(rows, cols[0], cols[1], int_fields)
        final = f"{directory}/part-{pid:05d}.gml"
        with open(final, "wb") as fh:
            fh.write(doc)
        yield pd.DataFrame({"path": [final], "n_records": [len(rows)]})

    manifest = staged.mapInPandas(write_part, "path string, n_records long")
    return manifest.count()


def read_point_gmls(
    spark: SparkSession, directory: str, int_fields: list[str],
) -> DataFrame:
    """Distributed GML scan: one task per document."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.gml") \
        .select(F.col("content").alias("buf"))
    schema = ", ".join(
        [f"{c} long" for c in int_fields] + ["x double", "y double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                recs = parse_gml(bytes(buf), int_fields)
                yield pd.DataFrame(
                    recs, columns=int_fields + ["x", "y"])

    return files.mapInPandas(parse, schema)
