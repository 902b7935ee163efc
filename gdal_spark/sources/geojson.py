"""GeoJSON driver (RFC 7946; reference: ogr/ogrsf_frmts/geojson/).

Two layouts, mirroring the reference's GeoJSON vs GeoJSONSeq drivers
(``ogrgeojsondriver.cpp`` / ``ogrgeojsonseqdriver.cpp``):

* **GeoJSONSeq** (one Feature per line): the at-scale layout. Writing is a
  JVM ``to_json`` projection over ``df.write.text`` (map-only, splittable
  output); reading is ``spark.read.text`` + ``from_json`` with a TYPED
  geometry schema — Polygon coordinates deserialize directly into the
  engine's native ``array<array<array<double>>>`` rings layout, so not a
  single byte passes through Python. A 100 TB directory of .geojsonl
  shards scans exactly like parquet text: per-file-split parallelism,
  column pruning after the parse.
* **FeatureCollection** (one JSON document): the interchange layout.
  Spark's multiLine JSON reader handles it; only sensible for
  per-file-bounded layers (a FeatureCollection is one JSON value — not
  splittable — so parallelism comes from many files, same as the
  reference's one-layer-per-file model).

Doubles survive the text roundtrip bit-exactly: ``to_json`` emits Jackson's
shortest-roundtrip decimal form and ``from_json`` parses it back to the
identical IEEE-754 value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Typed geometry schemas per RFC 7946 §3.1 — coordinates land in the
#: engine's native nested-array layouts.
GEOMETRY_SCHEMAS = {
    "Point": "type string, coordinates array<double>",
    "LineString": "type string, coordinates array<array<double>>",
    "Polygon": "type string, coordinates array<array<array<double>>>",
    "MultiPolygon":
        "type string, coordinates array<array<array<array<double>>>>",
}


def _feature_schema(geometry_type: str, properties_schema: str) -> str:
    gs = GEOMETRY_SCHEMAS[geometry_type]
    return (
        f"type string, geometry struct<{gs}>, "
        f"properties struct<{properties_schema}>"
    )


def feature_json(geometry: F.Column, properties: F.Column) -> F.Column:
    """One RFC 7946 Feature as a JSON string column (JVM ``to_json``)."""
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            geometry.alias("geometry"),
            properties.alias("properties"),
        )
    )


def point_geometry(lon: F.Column, lat: F.Column) -> F.Column:
    return F.struct(
        F.lit("Point").alias("type"),
        F.array(lon, lat).alias("coordinates"),
    )


def polygon_geometry(rings: F.Column) -> F.Column:
    """``rings`` is the engine layout array<array<array<double>>> — which IS
    RFC 7946 Polygon coordinates (exterior first, closed rings)."""
    return F.struct(
        F.lit("Polygon").alias("type"),
        rings.alias("coordinates"),
    )


def write_geojsonseq(
    df: DataFrame,
    path: str,
    geometry: F.Column,
    property_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Distributed GeoJSONSeq sink: one Feature per line, one shard per
    partition — a pure map-only JVM plan (no shuffle, no Python)."""
    props = F.struct(*[F.col(c).alias(c) for c in property_cols])
    df.select(feature_json(geometry, props).alias("value")) \
        .write.mode(mode).text(path)


def read_geojsonseq(
    spark: SparkSession,
    path: str,
    geometry_type: str,
    properties_schema: str,
) -> DataFrame:
    """Distributed GeoJSONSeq scan: text splits → ``from_json`` with the
    typed schema → properties flattened to top-level columns plus a
    ``geometry`` struct in the engine-native coordinates layout."""
    schema = _feature_schema(geometry_type, properties_schema)
    parsed = spark.read.text(path).select(
        F.from_json(F.col("value"), schema).alias("f")
    )
    return parsed.select("f.properties.*", F.col("f.geometry").alias("geometry"))


def write_featurecollection(
    df: DataFrame,
    path: str,
    geometry: F.Column,
    property_cols: list[str],
) -> None:
    """Single-document FeatureCollection sink (interchange layout).

    The feature ARRAY is assembled by an aggregation (bounded layers only —
    a FeatureCollection is one JSON value by definition); written as one
    text file."""
    props = F.struct(*[F.col(c).alias(c) for c in property_cols])
    features = df.select(
        F.struct(
            F.lit("Feature").alias("type"),
            geometry.alias("geometry"),
            props.alias("properties"),
        ).alias("feat")
    ).agg(F.collect_list("feat").alias("features"))
    doc = features.select(
        F.to_json(
            F.struct(
                F.lit("FeatureCollection").alias("type"),
                F.col("features"),
            )
        ).alias("value")
    )
    doc.coalesce(1).write.mode("overwrite").text(path)


def read_featurecollection(
    spark: SparkSession,
    path: str,
    geometry_type: str,
    properties_schema: str,
) -> DataFrame:
    """FeatureCollection scan via Spark's multiLine JSON reader — one task
    per file (the document is a single JSON value; parallelism across
    files, mirroring the reference's layer-per-file model)."""
    gs = GEOMETRY_SCHEMAS[geometry_type]
    schema = (
        "type string, features array<struct<"
        f"type: string, geometry: struct<{gs}>, "
        f"properties: struct<{properties_schema}>>>"
    )
    doc = spark.read.schema(schema).option("multiLine", "true").json(path)
    feat = doc.select(F.explode("features").alias("f"))
    return feat.select(
        "f.properties.*", F.col("f.geometry").alias("geometry")
    )
