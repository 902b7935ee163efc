"""MRF (Meta Raster Format) driver — from-scratch codec of the PUBLIC
NASA/ESDIS MRF layout (reference ``frmts/mrf/marfa_dataset.cpp``,
``mrf_util.cpp``; the format of the GIBS tile archives).

An MRF dataset is a triplet:

* ``.mrf`` — an XML header: ``<MRF_META><Raster>`` with ``<Size x y c>``
  and ``<PageSize x y c>`` attributes, ``<Compression>`` (PNG here —
  the format default, marfa_dataset.cpp:861), optional
  ``<DataFile>``/``<IndexFile>`` names.
* ``.idx`` — one 16-byte BIG-endian record per page: (offset, size)
  into the data file (marfa.h:163-168 "A tile index record, 16 bytes,
  big endian"), ordered x-fastest then y (IdxOffset,
  mrf_util.cpp:327-336).  An all-zero record marks an empty page.
* ``.ppg`` — the concatenated compressed pages (PNG blobs for PNG
  compression; ``.ppg`` is the PNG-page extension the reference pairs
  with IL_PNG).

This driver covers single-band 8-bit PNG pages over the repo's
from-scratch PNG codec (functions/png.py).

Spark mapping — pages are variable-length, so the WRITE is the
two-pass lengths-only pattern (sources/hf2.py): encode every page
distributed, collect only (page, length) metadata, prefix-sum offsets
driver-side, pwrite pages map-only, then emit the 16-byte-per-page
index (page-count-bounded) and the XML driver-side.  The READ parses
the XML + index driver-side (bounded metadata), broadcasts the offset
table, and decodes one page per task."""

from __future__ import annotations

import os
import re
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions.png import decode_png_gray8, encode_png_gray8


def _paths(mrf_path: str) -> tuple[str, str]:
    base = mrf_path[:-4] if mrf_path.endswith(".mrf") else mrf_path
    return base + ".idx", base + ".ppg"


def mrf_xml(w: int, h: int, page: int) -> str:
    return (
        "<MRF_META>\n"
        "  <Raster>\n"
        f"    <Size x=\"{w}\" y=\"{h}\" c=\"1\" />\n"
        f"    <PageSize x=\"{page}\" y=\"{page}\" c=\"1\" />\n"
        "    <Compression>PNG</Compression>\n"
        "  </Raster>\n"
        "</MRF_META>\n"
    )


def parse_mrf(mrf_path: str) -> dict:
    text = open(mrf_path).read()
    if "<MRF_META>" not in text:
        raise ValueError("mrf: missing MRF_META root")

    def attrs(tag: str) -> dict:
        m = re.search(rf"<{tag}\s+([^/>]*)/?>", text)
        if not m:
            raise ValueError(f"mrf: missing <{tag}>")
        return dict(re.findall(r"(\w+)=\"([^\"]+)\"", m.group(1)))

    size, psize = attrs("Size"), attrs("PageSize")
    comp = re.search(r"<Compression>([^<]+)</Compression>", text)
    comp_name = comp.group(1).strip() if comp else "PNG"
    if comp_name != "PNG":
        raise ValueError(f"mrf: unsupported compression {comp_name!r}")
    if int(size.get("c", "1")) != 1:
        raise ValueError("mrf: only single-band supported")
    return {"w": int(size["x"]), "h": int(size["y"]),
            "page": int(psize["x"]), "comp": comp_name}


def read_index(idx_path: str, n_pages: int) -> list[tuple[int, int]]:
    raw = open(idx_path, "rb").read()
    if len(raw) < 16 * n_pages:
        raise ValueError("mrf: index shorter than the page count")
    return [struct.unpack_from(">2q", raw, 16 * i) for i in range(n_pages)]


def read_mrf(spark: SparkSession, mrf_path: str) -> DataFrame:
    """Distributed scan → (gy, gx, val long): driver parses XML + the
    16-byte-per-page index, one task per non-empty page decodes its
    PNG blob."""
    hdr = parse_mrf(mrf_path)
    w, h, page = hdr["w"], hdr["h"], hdr["page"]
    idx_path, dat_path = _paths(mrf_path)
    px = (w + page - 1) // page
    py = (h + page - 1) // page
    entries = read_index(idx_path, px * py)
    live = [(i, off, ln) for i, (off, ln) in enumerate(entries) if ln > 0]
    if not live:
        return spark.createDataFrame([], "gy long, gx long, val long")
    ldf = spark.createDataFrame(live, "pid long, off long, ln long") \
        .repartition(min(len(live), 32), "pid")

    def read_page(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(dat_path, os.O_RDONLY)
        try:
            for pdf in batches:
                for pid, off, ln in zip(pdf["pid"], pdf["off"],
                                        pdf["ln"]):
                    j, i = divmod(int(pid), px)
                    img = decode_png_gray8(os.pread(fd, int(ln),
                                                    int(off)))
                    tw = min(page, w - i * page)
                    th = min(page, h - j * page)
                    img = img[:th, :tw]
                    yy, xx = np.mgrid[0:th, 0:tw]
                    yield pd.DataFrame({
                        "gy": (yy.ravel() + j * page).astype(np.int64),
                        "gx": (xx.ravel() + i * page).astype(np.int64),
                        "val": img.ravel().astype(np.int64),
                    })
        finally:
            os.close(fd)

    return ldf.mapInPandas(read_page, "gy long, gx long, val long")


def write_mrf(
    cells: DataFrame, mrf_path: str, w: int, h: int,
    *, page: int = 512,
) -> None:
    """Distributed sink over (gy, gx, val uint8): PNG pages encoded in
    one distributed pass, lengths-only to the driver, offsets prefix-
    summed, pages pwritten map-only; the 16-byte big-endian index and
    the XML written driver-side.  Pages with no input rows become
    all-zero index records (the format's empty-page marker)."""
    px = (w + page - 1) // page
    py = (h + page - 1) // page
    idx_path, dat_path = _paths(mrf_path)
    os.makedirs(os.path.dirname(mrf_path) or ".", exist_ok=True)

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        j, i = divmod(pid, px)
        tw = min(page, w - i * page)
        th = min(page, h - j * page)
        img = np.zeros((th, tw), dtype=np.uint8)
        img[pdf["gy"].to_numpy(np.int64) - j * page,
            pdf["gx"].to_numpy(np.int64) - i * page] = (
            pdf["val"].to_numpy(np.int64).astype(np.uint8))
        return pd.DataFrame({"pid": [pid],
                             "blob": [encode_png_gray8(img)]})

    staged = cells.withColumn(
        "_pid",
        (F.floor(F.col("gy") / F.lit(page)) * px
         + F.floor(F.col("gx") / F.lit(page))).cast("long"),
    ).groupBy("_pid").applyInPandas(encode, "pid long, blob binary") \
     .localCheckpoint(eager=True)

    lengths = {r["pid"]: r["ln"] for r in staged.select(
        "pid", F.length("blob").alias("ln")).collect()}  # page-bounded
    pos = 0
    offsets: dict[int, int] = {}
    index = bytearray()
    for pid in range(px * py):
        ln = lengths.get(pid, 0)
        offsets[pid] = pos
        index += struct.pack(">2q", pos if ln else 0, ln)
        pos += ln
    with open(mrf_path, "w") as fh:
        fh.write(mrf_xml(w, h, page))
    with open(idx_path, "wb") as fh:
        fh.write(bytes(index))
    with open(dat_path, "wb") as fh:
        fh.truncate(pos)
    bc = cells.sparkSession.sparkContext.broadcast(offsets)

    def flush(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = os.open(dat_path, os.O_WRONLY)
        try:
            for pdf in batches:
                for pid, blob in zip(pdf["pid"], pdf["blob"]):
                    os.pwrite(fd, bytes(blob), bc.value[int(pid)])
                yield pd.DataFrame({"n": [len(pdf)]})
        finally:
            os.close(fd)

    staged.mapInPandas(flush, "n long").collect()
    staged.unpersist()
