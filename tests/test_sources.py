"""Source-format parity: CSV and JSON-lines scans (the OGR csv/geojson
driver analogs, SURVEY.md §2.1) round-trip through the engine's tables."""

import os
import tempfile

from pyspark.sql import functions as F

from gdal_spark.data.pages import pages_df
from gdal_spark import pipeline as P


def test_csv_roundtrip_with_schema_inference(spark):
    """CSV driver analog: header + inferred schema (OGR csv scan-ahead)."""
    pages = pages_df(spark, 200).select("i", "url", "lang", "lon", "lat")
    d = tempfile.mkdtemp(prefix="gdal_spark_csv_")
    pages.write.mode("overwrite").option("header", True).csv(d)
    back = spark.read.option("header", True).option("inferSchema", True).csv(d)
    assert back.count() == 200
    assert dict(back.dtypes)["i"] in ("int", "bigint")
    assert dict(back.dtypes)["lon"] == "double"
    joined = back.join(pages.select("i", F.col("lon").alias("lon0")), "i")
    bad = joined.filter(F.abs(F.col("lon") - F.col("lon0")) > 1e-9).count()
    assert bad == 0


def test_jsonl_roundtrip(spark):
    """GeoJSON-ish driver analog: JSON-lines with nested geometry struct."""
    pages = pages_df(spark, 100).select(
        "i", "url",
        F.struct(
            F.lit("Point").alias("type"),
            F.array("lon", "lat").alias("coordinates"),
        ).alias("geometry"),
    )
    d = tempfile.mkdtemp(prefix="gdal_spark_json_")
    pages.write.mode("overwrite").json(d)
    back = spark.read.json(d)
    assert back.count() == 100
    r = back.filter(F.col("i") == 7).select(
        "geometry.type", F.element_at("geometry.coordinates", 1).alias("x")
    ).first()
    assert r["type"] == "Point"
    orig = pages_df(spark, 100).filter(F.col("i") == 7).first()
    assert abs(r["x"] - orig["lon"]) < 1e-12


def test_union_view_across_formats(spark):
    """OGRUnionLayer analog across heterogeneous sources."""
    pages = pages_df(spark, 50).select("i", "url", "lang")
    d1 = tempfile.mkdtemp(prefix="gdal_spark_u1_")
    d2 = tempfile.mkdtemp(prefix="gdal_spark_u2_")
    pages.filter(F.col("i") < 25).write.mode("overwrite").parquet(d1)
    pages.filter(F.col("i") >= 25).write.mode("overwrite").option(
        "header", True
    ).csv(d2)
    a = spark.read.parquet(d1)
    b = spark.read.option("header", True).option("inferSchema", True).csv(d2)
    u = P.concat_layers(a, b.select(*a.columns))
    assert u.count() == 50
