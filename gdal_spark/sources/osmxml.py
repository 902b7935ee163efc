"""OSM XML driver — the OpenStreetMap .osm planet-dump XML layout
(public OSM API 0.6 schema; reference ``ogr/ogrsf_frmts/osm/`` reads the
same via its points layer).

Layout: ``<osm version="0.6">`` → ``<node id=... lat=... lon=...>`` with
``<tag k=... v=.../>`` children; integer attributes ride as tags (the
reference exposes non-standard tags through its ``other_tags``/field
mapping the same way).  Coordinates are written with Python's
shortest-roundtrip repr so doubles survive the text container
bit-exactly (the KML/GPX/GeoJSON contract).

Spark mapping: one .osm document per row-block on write
(``applyInPandas``), one task per document on read (``binaryFile`` +
executor-side ElementTree).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def osm_document(rows: list[dict], id_field: str,
                 tag_fields: list[str]) -> bytes:
    root = ET.Element("osm", version="0.6", generator="gdal_spark")
    for r in rows:
        node = ET.SubElement(
            root, "node", id=str(int(r[id_field])),
            lat=repr(float(r["lat"])), lon=repr(float(r["lon"])),
            version="1")
        for c in tag_fields:
            ET.SubElement(node, "tag", k=c, v=str(int(r[c])))
    return ET.tostring(root, xml_declaration=True, encoding="UTF-8")


def parse_osm(buf: bytes, id_field: str,
              tag_fields: list[str]) -> list[dict]:
    root = ET.fromstring(buf)
    if root.tag != "osm":
        raise ValueError(f"osm: root element is <{root.tag}>")
    out = []
    for node in root.iter("node"):
        row = {id_field: int(node.get("id")),
               "lat": float(node.get("lat")),
               "lon": float(node.get("lon"))}
        tags = {t.get("k"): t.get("v") for t in node.iter("tag")}
        for c in tag_fields:
            row[c] = int(tags[c])
        out.append(row)
    return out


def write_point_osm(pts: DataFrame, directory: str, id_field: str,
                    tag_fields: list[str], num_files: int = 8) -> int:
    """Distributed node sink: one .osm document per block."""
    os.makedirs(directory, exist_ok=True)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        pdf = pdf.sort_values(id_field)
        path = f"{directory}/block-{blk:05d}.osm"
        with open(path, "wb") as fh:
            fh.write(osm_document(
                [r._asdict() for r in pdf.itertuples(index=False)],
                id_field, tag_fields))
        return pd.DataFrame({"path": [path], "n": [len(pdf)]})

    keyed = pts.withColumn(
        "_blk", F.pmod(F.hash(F.col(id_field)), F.lit(num_files)))
    return keyed.groupBy("_blk").applyInPandas(
        build, "path string, n long").count()


def read_point_osm(spark: SparkSession, directory: str, id_field: str,
                   tag_fields: list[str]) -> DataFrame:
    """Distributed node scan: one task per .osm document."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.osm") \
        .select(F.col("content").alias("buf"))
    schema = ", ".join([f"{id_field} long"]
                       + [f"{c} long" for c in tag_fields]
                       + ["lon double", "lat double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for buf in pdf["buf"]:
                rows = parse_osm(bytes(buf), id_field, tag_fields)
                yield pd.DataFrame(rows)[
                    [id_field] + tag_fields + ["lon", "lat"]]

    return files.mapInPandas(parse, schema)
