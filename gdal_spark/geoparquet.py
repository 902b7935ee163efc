"""GeoParquet-style spatial parquet sink/scan.

Layout per the published GeoParquet 1.1 spec (and GDAL's Parquet driver,
ogr/ogrsf_frmts/parquet/ogrparquetwriterlayer.cpp: WKB ``geometry`` column
+ optional per-row ``bbox`` covering struct {xmin, ymin, xmax, ymax}): the
geometry is ISO WKB in a binary column and the covering bbox rides along as
a plain nested struct.  The "geo" descriptor is attached as Spark column
metadata on the geometry field (persisted in the parquet footer via
Spark's row-metadata key); a file-level parquet key-value entry is not
reachable through the DataFrame writer, which this module documents as the
one deviation.

Why this layout wins at 100 TB:

* The bbox covering struct is ordinary column data, so an envelope filter
  compiles to parquet row-group statistics pruning — ``.explain`` shows
  ``PushedFilters: [GreaterThanOrEqual(bbox.xmax, …)]`` — and a spatially
  sorted table (``sort_zoom``) skips whole row groups before a single
  geometry byte is decoded.
* WKB decode happens only on the post-pushdown survivors, in an
  Arrow-batched ``mapInPandas``.
* Writing sorted by Hilbert key clusters nearby geometries into the same
  row groups / files (the FlatGeobuf packed-R-tree idea, packedrtree.cpp,
  re-expressed as a sort-before-write).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

from gdal_spark.spatial import geometry as G
from gdal_spark.spatial import tilemath as TM

GEO_DESCRIPTOR = {
    "version": "1.1.0",
    "primary_column": "geometry",
    "columns": {
        "geometry": {
            "encoding": "WKB",
            "geometry_types": ["Polygon"],
            "crs": None,  # per spec: null = OGC:CRS84 lon/lat
            "covering": {
                "bbox": {
                    "xmin": ["bbox", "xmin"],
                    "ymin": ["bbox", "ymin"],
                    "xmax": ["bbox", "xmax"],
                    "ymax": ["bbox", "ymax"],
                }
            },
        }
    },
}

_BBOX_TYPE = StructType([
    StructField("xmin", DoubleType(), False),
    StructField("ymin", DoubleType(), False),
    StructField("xmax", DoubleType(), False),
    StructField("ymax", DoubleType(), False),
])


def _bbox_from_rings(rings_col: str) -> F.Column:
    """Envelope of an array<array<array<double>>> ring column — pure JVM
    HOF math (flatten → per-axis min/max), no Python."""
    pts = F.flatten(F.col(rings_col))
    xs = F.transform(pts, lambda p: p[0])
    ys = F.transform(pts, lambda p: p[1])
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


def write_geoparquet(
    df: DataFrame,
    path: str,
    rings_col: str = "rings",
    sort_zoom: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a polygon DataFrame as GeoParquet-style parquet: every column
    except ``rings_col`` passes through; ``geometry`` (ISO WKB) and
    ``bbox`` (covering struct) are appended.  ``sort_zoom`` optionally
    range-sorts rows by the Hilbert key of the bbox center at that zoom
    before writing (spatial clustering → effective row-group pruning)."""
    passthrough = [c for c in df.columns if c != rings_col]
    staged = df.select(*passthrough, F.col(rings_col).alias("_rings")) \
        .withColumn("bbox", _bbox_from_rings("_rings"))

    if sort_zoom is not None:
        # Sort BEFORE the WKB encode: repartitionByRange executes its child
        # an extra time for range-boundary sampling, so the child must be
        # the cheap column plan, not the Arrow encode stage.  Projections
        # are staged because hilbert's tile inputs otherwise inline the
        # bbox arithmetic repeatedly.
        cx = (F.col("bbox.xmin") + F.col("bbox.xmax")) / 2.0
        cy = (F.col("bbox.ymin") + F.col("bbox.ymax")) / 2.0
        centered = staged.select("*", cx.alias("_cx"), cy.alias("_cy"))
        tx, ty = TM.lonlat_to_tile(F.col("_cx"), F.col("_cy"), sort_zoom)
        tiled = centered.select("*", tx.alias("_tx"), ty.alias("_ty"))
        staged = (
            tiled.select(
                "*",
                TM.hilbert_d(
                    F.col("_tx"), F.col("_ty"), sort_zoom
                ).alias("_hkey"),
            )
            .repartitionByRange("_hkey")
            .sortWithinPartitions("_hkey")
            .drop("_hkey", "_tx", "_ty", "_cx", "_cy")
        )

    out_schema = StructType(
        [staged.schema[c] for c in passthrough]
        + [
            StructField(
                "geometry",
                BinaryType(),
                True,
                metadata={"geo": json.dumps(GEO_DESCRIPTOR)},
            ),
            StructField("bbox", _BBOX_TYPE, False),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[passthrough + ["bbox"]].copy()
            out["geometry"] = [
                G.wkb_polygon(G.rings_to_numpy(rr)) for rr in pdf["_rings"]
            ]
            yield out[passthrough + ["geometry", "bbox"]]

    encoded = staged.mapInPandas(encode, out_schema)
    encoded.write.mode(mode).parquet(path)


def read_geoparquet(
    spark: SparkSession,
    path: str,
    envelope: tuple[float, float, float, float] | None = None,
    rings_col: str = "rings",
    decode: bool = True,
) -> DataFrame:
    """Scan a GeoParquet-style table.  ``envelope=(xmin, ymin, xmax, ymax)``
    applies the bbox-intersects filter on the covering struct BEFORE any
    decode — Catalyst pushes the four comparisons to the parquet scan
    (row-group pruning).  With ``decode``, the WKB survivors are parsed
    back into a ring-array column."""
    df = spark.read.parquet(path)
    if envelope is not None:
        exmin, eymin, exmax, eymax = envelope
        df = df.filter(
            (F.col("bbox.xmin") <= float(exmax))
            & (F.col("bbox.xmax") >= float(exmin))
            & (F.col("bbox.ymin") <= float(eymax))
            & (F.col("bbox.ymax") >= float(eymin))
        )
    if not decode:
        return df
    passthrough = [c for c in df.columns if c != "geometry"]
    out_schema = StructType(
        [df.schema[c] for c in passthrough]
        + [StructField(rings_col, _rings_type(), True)]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[passthrough].copy()
            vals = []
            for buf in pdf["geometry"]:
                _, rings = G.parse_wkb(bytes(buf))
                vals.append([r.tolist() for r in rings])
            out[rings_col] = pd.Series(
                vals, index=pdf.index, dtype=object
            )
            yield out

    return df.mapInPandas(parse, out_schema)


def _rings_type():
    from pyspark.sql.types import ArrayType

    return ArrayType(ArrayType(ArrayType(DoubleType())))


def write_geoparquet_points(
    df: DataFrame,
    path: str,
    x_col: str = "lon",
    y_col: str = "lat",
    sort_zoom: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Point-layer variant: geometry = WKB Point, bbox degenerates to the
    point itself (still a covering struct, so the same envelope pushdown
    applies).  The optional Hilbert sort runs BEFORE the encode stage
    (column math only under the range sampler, as in the polygon path)."""
    passthrough = [c for c in df.columns if c not in (x_col, y_col)]
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    staged = df.select(
        *passthrough,
        x.alias(x_col),
        y.alias(y_col),
        F.struct(
            x.alias("xmin"), y.alias("ymin"),
            x.alias("xmax"), y.alias("ymax"),
        ).alias("bbox"),
    )
    if sort_zoom is not None:
        tx, ty = TM.lonlat_to_tile(F.col(x_col), F.col(y_col), sort_zoom)
        tiled = staged.select("*", tx.alias("_tx"), ty.alias("_ty"))
        staged = (
            tiled.select(
                "*",
                TM.hilbert_d(
                    F.col("_tx"), F.col("_ty"), sort_zoom
                ).alias("_hkey"),
            )
            .repartitionByRange("_hkey")
            .sortWithinPartitions("_hkey")
            .drop("_hkey", "_tx", "_ty")
        )

    out_schema = StructType(
        [staged.schema[c] for c in passthrough + [x_col, y_col]]
        + [
            StructField(
                "geometry",
                BinaryType(),
                True,
                metadata={"geo": json.dumps(GEO_DESCRIPTOR)},
            ),
            StructField("bbox", _BBOX_TYPE, False),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[passthrough + [x_col, y_col, "bbox"]].copy()
            out["geometry"] = [
                G.wkb_point(float(px), float(py))
                for px, py in zip(pdf[x_col], pdf[y_col])
            ]
            yield out[passthrough + [x_col, y_col, "geometry", "bbox"]]

    staged.mapInPandas(encode, out_schema).write.mode(mode).parquet(path)
