"""MapInfo Interchange Format (MIF/MID) driver — the PUBLIC MapInfo
interchange text layout (reference ``ogr/ogrsf_frmts/mitab/mitab_miffile.cpp``).

A layer is a file PAIR: ``.mif`` carries the header (``Version`` /
``Charset`` / ``Delimiter`` / ``Columns`` schema) and the geometry stream
after ``Data`` (``Point x y``, ``Region nrings`` + per-ring vertex blocks,
``Pline``…); ``.mid`` carries one delimited attribute row per feature in
the same order — the spec's implicit positional 1:1, exactly like the
shapefile .shp↔.dbf pairing.

Spark mapping: one MIF/MID pair per row-block on write
(``applyInPandas``), one task per pair on read (two ``binaryFile`` scans
joined on the path stem).  Coordinates are written as Python
shortest-roundtrip decimals, so doubles survive bit-exactly.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mif_pair(rows: list[tuple[float, float, list]],
             int_fields: list[str]) -> tuple[str, str]:
    """Serialize one Point layer block → (mif text, mid text); each row
    is (x, y, [int attribute values])."""
    cols = "\n".join(f"  {c} Integer" for c in int_fields)
    mif = [f"Version 300\nCharset \"Neutral\"\nDelimiter \",\"\n"
           f"Columns {len(int_fields)}\n{cols}\nData\n"]
    mid = []
    for x, y, attrs in rows:
        mif.append(f"Point {x!r} {y!r}\n")
        mid.append(",".join(str(int(a)) for a in attrs) + "\n")
    return "".join(mif), "".join(mid)


def parse_mif_pair(mif: str, mid: str,
                   int_fields: list[str]) -> pd.DataFrame:
    """→ DataFrame(int_fields…, x, y) for a Point-layer pair."""
    lines = mif.splitlines()
    delim = ","
    n_cols = 0
    i = 0
    while i < len(lines):
        tok = lines[i].strip()
        low = tok.lower()
        if low.startswith("delimiter"):
            delim = tok.split('"')[1]
        elif low.startswith("columns"):
            n_cols = int(tok.split()[1])
            i += n_cols  # schema lines; attribute types ride in the .mid
        elif low == "data":
            i += 1
            break
        i += 1
    xs, ys = [], []
    for ln in lines[i:]:
        t = ln.strip()
        if not t:
            continue
        parts = t.split()
        if parts[0].lower() != "point":
            raise ValueError(f"mif: unsupported geometry '{parts[0]}'")
        xs.append(float(parts[1]))
        ys.append(float(parts[2]))
    attrs = [ln.split(delim) for ln in mid.splitlines() if ln.strip()]
    if len(attrs) != len(xs):
        raise ValueError(
            f"mif: {len(xs)} geometries but {len(attrs)} .mid rows")
    out = pd.DataFrame(attrs, columns=int_fields[:len(attrs[0]) if attrs
                                                 else len(int_fields)])
    for c in int_fields:
        out[c] = out[c].astype("int64")
    out["x"], out["y"] = xs, ys
    return out


def write_point_mifs(pts: DataFrame, directory: str,
                     int_fields: list[str], num_files: int = 8,
                     x_col: str = "lon", y_col: str = "lat") -> int:
    """Distributed Point-layer sink: one .mif/.mid pair per block."""
    os.makedirs(directory, exist_ok=True)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(key[0])
        pdf = pdf.sort_values(int_fields[0])
        rows = [(float(r[x_col]), float(r[y_col]),
                 [r[c] for c in int_fields])
                for _, r in pdf.iterrows()]
        mif, mid = mif_pair(rows, int_fields)
        stem = f"{directory}/block-{blk:05d}"
        with open(stem + ".mif", "w") as fh:
            fh.write(mif)
        with open(stem + ".mid", "w") as fh:
            fh.write(mid)
        return pd.DataFrame({"path": [stem], "n": [len(pdf)]})

    keyed = pts.withColumn(
        "_blk", F.pmod(F.hash(F.col(int_fields[0])), F.lit(num_files)))
    return keyed.groupBy("_blk").applyInPandas(
        build, "path string, n long").count()


def read_point_mifs(spark: SparkSession, directory: str,
                    int_fields: list[str]) -> DataFrame:
    """Distributed Point-layer scan: one task per MIF/MID pair."""
    mif = spark.read.format("binaryFile").load(f"{directory}/*.mif").select(
        F.regexp_replace("path", r"\.mif$", "").alias("stem"),
        F.col("content").alias("mif"))
    mid = spark.read.format("binaryFile").load(f"{directory}/*.mid").select(
        F.regexp_replace("path", r"\.mid$", "").alias("stem"),
        F.col("content").alias("mid"))
    paired = mif.join(mid, "stem")
    schema = ", ".join([f"{c} long" for c in int_fields]
                       + ["x double", "y double"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for mf, md in zip(pdf["mif"], pdf["mid"]):
                yield parse_mif_pair(bytes(mf).decode(),
                                     bytes(md).decode(), int_fields)

    return paired.mapInPandas(parse, schema)
